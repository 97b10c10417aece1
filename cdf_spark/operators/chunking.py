"""Document chunking for RAG / embedding pipelines.

Splits documents into overlapping chunks with stable, reproducible
chunk identities — the preprocessing step between a curated corpus and
an embedding model. Both chunkers are pure per-row expression work
(sequence → slice → join): NO shuffle, NO UDF, fully whole-stage
codegen, so at 100 TB the cost is one narrow map over the scan with
output growing by the overlap factor only.

Chunk identity is (doc_id, chunk_idx) with chunk_idx dense from 0 by
stride order — downstream embedding tables can upsert on it and
re-chunking a changed doc replaces exactly its chunks.

Reference parity: the reference has no chunker (it moves data, it does
not prep training corpora) — this is part of the beyond-reference LLM
pipeline surface, exact-oracled against DuckDB list slicing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap_tokens: int = 8,
) -> DataFrame:
    """Whitespace-token chunks of `chunk_tokens` with `overlap_tokens`
    carried between consecutive chunks (stride = chunk - overlap).
    Start offsets run 0, stride, 2*stride, ... while < n_tokens, so the
    final chunk may be short but every token lands in at least one
    chunk. Output: (id, chunk_idx, chunk_text, chunk_len)."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap must be smaller than the chunk size")
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    out = (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("_toks"),
            F.explode(starts).alias("_start"),
        )
        .withColumn("_chunk", F.slice("_toks", F.col("_start") + 1, chunk_tokens))
        .select(
            "id",
            (F.col("_start") / stride).cast("int").alias("chunk_idx"),
            F.array_join("_chunk", " ").alias("chunk_text"),
            F.size("_chunk").alias("chunk_len"),
        )
    )
    return out


def chunk_by_chars(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 256,
    overlap_chars: int = 64,
) -> DataFrame:
    """Character-window chunks (the tokenizer-agnostic fallback):
    substrings of `chunk_chars` starting every `chunk_chars -
    overlap_chars` characters. Same identity/coverage contract as
    chunk_by_tokens."""
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap must be smaller than the chunk size")
    stride = chunk_chars - overlap_chars
    txt: Column = F.col(text_col)
    n = F.length(txt)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        df.select(
            F.col(id_col).alias("id"),
            txt.alias("_txt"),
            F.explode(starts).alias("_start"),
        )
        .select(
            "id",
            (F.col("_start") / stride).cast("int").alias("chunk_idx"),
            F.col("_txt").substr(F.col("_start") + 1, F.lit(chunk_chars)).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )
