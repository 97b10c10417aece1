"""Text analysis operators for training-data pipelines.

Beyond-reference operators (SURVEY §7 step 8): language ID, quality
scoring, token counting, document fingerprinting — each expressed in
pure `pyspark.sql.functions` arithmetic (whole-stage codegen, zero
Python in the row path) and designed so the exact same computation is
expressible in ANSI SQL for the DuckDB oracle:

- occurrence counts use length/replace arithmetic (identical across
  engines; no regex-dialect dependence),
- token counts use separator arithmetic,
- scores use integer/double arithmetic with explicit rounding.

At 100 TB each of these is a narrow projection over the documents
scan — no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

# Marker words per language for the n-gram/stopword heuristic.
# Counting ' w ' occurrences (space-delimited) keeps SQL parity trivial.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a"],
    "de": ["der", "die", "und", "das"],
    "es": ["el", "los", "que", "y"],
    "fr": ["le", "les", "et", "une"],
    "zh": ["的", "是", "了"],
}


def spread_compute(df: DataFrame) -> DataFrame:
    """Parallelism guard for compute-bound text stages (r14; the rule
    `decontamination_overlap` proved in r2 and `similarity._spread`
    generalized): a small corpus file arrives as ONE input split
    (openCostInBytes floors the split size), so a tokenize/gram-hash
    stage downstream of the scan runs on a single core regardless of
    cluster width. When the scan's parallelism is below the shuffle-
    partition target, spread the rows first — the shuffle moves only
    the raw text bytes once, and every hash/explode after it fans out.
    At real scale the input already has >= target splits and this is a
    NO-OP (no shuffle added) — the guard reads the plan, not a
    constant tuned to local mode."""
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    try:
        if df.rdd.getNumPartitions() >= nparts:
            return df
    except Exception:  # noqa: BLE001 — parallelism probe is best-effort
        return df
    return df.repartition(nparts)


def occurrences(col: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal substring —
    (len(s) - len(replace(s, needle, ''))) / len(needle)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace token count for single-space-separated text:
    #separators + 1 (0 for empty strings)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        occurrences(trimmed, " ") + 1
    )


def bpe_token_count(col: Column, piece_len: int = 4) -> Column:
    """Subword ("BPE-ish") token estimate: every whitespace word
    contributes ceil(len/piece_len) pieces — the shape a byte-pair
    vocabulary converges to on homogeneous text, without carrying a
    merges table. Pure integer arithmetic over the split array (no
    regex), so the estimate is bit-identical across engines:
    SQL twin `list_sum([(length(w)+p-1)//p for w in ...])`."""
    words = F.filter(F.split(F.trim(col), " "), lambda w: F.length(w) > 0)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.floor((F.length(w) + (piece_len - 1)) / piece_len).cast("long"),
    )


def word_occurrences(col: Column, word: str) -> Column:
    """Occurrences of a whole word in space-separated text: pad both
    the text and the needle with spaces."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return occurrences(padded, f" {word} ")


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-occurrence scores."""
    return {
        lang: sum((word_occurrences(col, w) for w in words), F.lit(0)).cast("long")
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax language by marker count; 'und' (undetermined) when all
    scores are zero. Ties break by the fixed language order."""
    scores = lang_scores(col)
    best_score = F.greatest(*scores.values())
    result = F.lit("und")
    # reversed so earlier languages win ties via later WHEN precedence
    for lang in reversed(list(scores)):
        result = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(result)
    return F.when(best_score == 0, F.lit("und")).otherwise(result)


def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality features over raw text."""
    n_chars = F.length(col)
    n_tokens = token_count(col)
    n_punct = sum((occurrences(col, p) for p in [".", ",", "!", "?", ";"]), F.lit(0))
    n_stop = sum((word_occurrences(col, w) for w in ["the", "a", "and", "of"]), F.lit(0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round(
            F.when(n_tokens > 0, (n_chars - (n_tokens - 1)).cast("double") / n_tokens).otherwise(F.lit(0.0)), 4
        ),
        "punct_ratio": F.round(
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
        ),
        "stopword_ratio": F.round(
            F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0)), 6
        ),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: length sweet-spot + stopword
    presence + sane token length. Weights are fixed and documented so
    the SQL oracle reproduces them bit-for-bit."""
    f = quality_features(col)
    length_ok = F.when((f["n_chars"] >= 100) & (f["n_chars"] <= 20000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(f["stopword_ratio"] >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    tok_ok = F.when((f["avg_token_len"] >= 3.0) & (f["avg_token_len"] <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(length_ok + stop_ok + tok_ok, 2)


def content_fingerprint(col: Column) -> Column:
    """Exact content fingerprint (md5 hex) — dedup key with SQL parity."""
    return F.md5(col)


def hash64(col: Column) -> Column:
    """Deterministic 60-bit integer hash with exact SQL parity:
    Spark  conv(substr(md5(x),1,15),16,10)::bigint
    DuckDB CAST('0x'||substr(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash64_py(s: str) -> int:
    """Driver-side twin of `hash64` (bit-identical for utf-8 strings)
    — lets plan-time code probe structures that executors built with
    the Column form (e.g. the bloom-index sidecars)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def rolling_fingerprints(col: Column, window: int = 8) -> Column:
    """Winnowing-style k-gram fingerprints: hash each k-char gram and
    keep grams whose hash ≡ 0 (mod 16) — a deterministic 1/16 sampled
    fingerprint set for containment detection. Pure higher-order
    functions; no UDF."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - window + 1, F.lit(0))),
        lambda i: F.substring(col, i, window) if False else col.substr(i, F.lit(window)),
    )
    hashes = F.transform(grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"))
    return F.array_distinct(F.filter(hashes, lambda h: h % 16 == 0))


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile: tokens, quality, language, fingerprint."""
    c = F.col(text_col)
    feats = quality_features(c)
    return df.select(
        *df.columns,
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        content_fingerprint(c).alias("fingerprint"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = term count in doc; idf = ln(N / df_t). One explode + two
    aggregations + a window rank — all JVM-side; the document-frequency
    side is a small broadcastable dim at any corpus size (vocabulary ≪
    corpus). Ties broken lexically for determinism. Scores rounded to
    6 for cross-engine hashing.
    """
    from pyspark.sql.window import Window

    # tf feeds two consumers (the document-frequency broadcast build
    # and the scoring join) and AQE does not reuse the exchange across
    # them — the AQE-final plan tokenized the corpus twice (r14). The
    # pin is the narrow (id, term, tf) posting table, the same
    # discipline as tfidf_doc_similarity's. N rides the pin job as an
    # observed metric over the pre-explode (one row per doc) projection
    # — the separate df.count() was one more corpus job (r14, §9.3
    # observe-on-checkpoint pattern).
    obs = Observation()
    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0).alias("_ts"),
    ).observe(obs, F.count(F.lit(1)).alias("n_docs"))
    tf = (
        toks.select("id", F.explode("_ts").alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    n_docs = int(obs.get["n_docs"])
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(doc_freq), on="term")
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(F.col("id").alias(id_col), "term", "tfidf", "rk")
    )


def hashed_features(col: Column, dim: int = 64) -> Column:
    """Feature-hashing ("hashing trick") term-frequency vector: token t
    increments bucket hash64(t) % dim; returns an int array of length
    `dim`. Bridges raw text into the embedding operators (cosine /
    LSH / IVF run on it unchanged) with no vocabulary state — the
    property that makes it embarrassingly parallel at any scale.

    O(dim x tokens) per row as a higher-order fold; md5-derived
    bucketing keeps exact SQL parity (DuckDB:
    `[len(list_filter(toks, t -> hash % dim = i)) for i in range(dim)]`).
    """
    tokens = F.filter(F.split(F.trim(col), " "), lambda t: F.length(t) > 0)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(tokens, lambda t: hash64(t) % dim == i)),
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual
    information — the classic corpus-statistics tool for multiword-
    expression discovery (Church & Hanks 1990), and the signal BPE/
    WordPiece merge selection approximates: PMI ranks pairs that
    co-occur far above chance, where raw bigram frequency just ranks
    common function-word pairs.

        pmi = ln( c_ab * N / (c_a * c_b) )

    over exact integer counts (c_ab adjacent-pair count, c_a/c_b
    unigram counts, N total tokens), emitted in integer micro-nats —
    one fixed-order double per surviving pair, the suite's micro-nat
    rule, so the ranking replays exactly in SQL. `min_count` drops
    the low-count pairs whose PMI is spuriously high (the standard
    correction).

    Scale: unigram and bigram counts are map-side-combinable
    aggregations of the token stream (the bigram pairing is one
    per-document window); the PMI join touches only distinct bigrams
    above min_count against the distinct-unigram table — vocabulary-
    sized operands, never corpus-sized. Output: (tok_a, tok_b, c_ab,
    pmi_unat, rank).
    """
    from pyspark.sql.window import Window as _W

    toks = df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("_p", "tok"),
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n_tokens = toks.count()
    w = _W.partitionBy("_d").orderBy("_p")
    pairs = (
        toks.withColumn("_nxt", F.lead("tok").over(w))
        .filter(F.col("_nxt").isNotNull())
        .groupBy(F.col("tok").alias("tok_a"), F.col("_nxt").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("_ca"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("_cb"))
    scored = (
        pairs.join(ua, on="tok_a")
        .join(ub, on="tok_b")
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab") * F.lit(float(n_tokens)) / (F.col("_ca") * F.col("_cb"))
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("pmi_unat"),
        )
    )
    top = scored.orderBy(
        F.col("pmi_unat").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()
    ).limit(k)
    w2 = _W.orderBy(F.col("pmi_unat").desc(), F.col("tok_a").asc(), F.col("tok_b").asc())
    return top.select("tok_a", "tok_b", "c_ab", "pmi_unat", F.row_number().over(w2).alias("rank"))


def distinct_ngram_ratios(
    df: DataFrame,
    orders: tuple[int, ...] = (1, 2, 3),
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level distinct-n diversity (the distinct-1/2/3 metric of
    Li et al. 2016, corpus form): for each n-gram order, the number of
    DISTINCT grams over the total gram count — the repetition/mode-
    collapse signal curation pipelines track next to the per-document
    repetition profile (`curation.repetition_profile` is within-doc;
    this is across the corpus: templated spam collapses distinct-3
    long before any single document looks repetitive).

    Exact integers end to end: per order, one distinct-count and one
    total-count aggregation over the exploded gram stream (grams exist
    only inside codegen); the ratio is an integer micro-unit floor
    division. Output: (n, distinct_grams, total_grams, ratio_unat),
    one row per order.
    """
    if not orders or any(n < 1 for n in orders):
        raise ValueError("orders must be positive n-gram sizes")
    from .curation import _gram_join

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    out = None
    for n in orders:
        grams = df.select(F.explode(_gram_join(toks, n)).alias("g"))
        one = grams.agg(
            F.count_distinct(F.col("g")).alias("distinct_grams"),
            F.count(F.lit(1)).alias("total_grams"),
        ).select(
            F.lit(int(n)).alias("n"),
            "distinct_grams",
            "total_grams",
            F.expr("CASE WHEN total_grams > 0 THEN distinct_grams * 1000000 div total_grams END").alias(
                "ratio_unat"
            ),
        )
        out = one if out is None else out.unionByName(one)
    assert out is not None
    return out
