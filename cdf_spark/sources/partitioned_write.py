"""ONE-pass hive-partitioned write for the table-format writers.

The Iceberg/Hudi fixture writers previously enumerated partition
tuples driver-side (`df.select(keys).distinct().collect()`) and then
ran ONE FILTERED WRITE PER TUPLE — N driver-held tuples and N full
scans of the frame. Unbounded in principle (a timestamp-keyed
partition column explodes it) and quadratic-ish in practice.

This helper does what a real writer does: a single distributed
`partitionBy` write (executors split rows into hive-style directories
in one pass), then a driver-side WALK OF THE OUTPUT DIRECTORIES —
O(partitions) names, never O(rows) data — to recover the partition
tuples the commit metadata needs. The partition count is guarded
(`max_partitions`): commit metadata is O(partitions) in any table
format, so a degenerate partition key must fail loudly before it
produces a million-entry manifest.
"""

from __future__ import annotations

import tempfile
from pathlib import Path
from urllib.parse import unquote

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class PartitionCardinalityError(ValueError):
    pass


def hive_partitioned_write(
    df: DataFrame,
    partition_by: list[str],
    drop_partition_cols: bool = False,
    max_partitions: int = 10_000,
) -> tuple[str, list[tuple[dict[str, str | None], list[str]]]]:
    """Write `df` hive-partitioned in ONE distributed job; return
    `(tmp_root, [(raw_partition_values, [file_paths])])` sorted by
    partition. The caller moves the files into its layout and removes
    `tmp_root`.

    - raw values are the unescaped directory strings (None for the
      hive null marker); the caller converts them to typed values with
      its own schema knowledge.
    - `drop_partition_cols=True` omits the source columns from the
      data files (metadata-only identity partitioning — the Flink
      shape); otherwise the columns are retained by writing through
      duplicated `__p_*` columns (Spark's partitionBy always strips
      the partitioning columns from the files).
    - rows are pre-shuffled BY the partition key so each partition is
      written by one task (one file per partition instead of
      tasks x partitions small files).

    The files stay under a temp dir owned by the caller, which moves
    them into its layout and removes the dir.
    """
    pcols = [f"__p_{c}" for c in partition_by]
    out = df
    for c, pc in zip(partition_by, pcols):
        out = out.withColumn(pc, F.col(c))
    if drop_partition_cols:
        out = out.drop(*partition_by)
    tmpd = tempfile.mkdtemp(prefix="cdf_partwrite_")
    out.repartition(*[F.col(pc) for pc in pcols]).write.partitionBy(*pcols).mode(
        "overwrite"
    ).parquet(tmpd)

    results: list[tuple[dict[str, str | None], list[str]]] = []
    root = Path(tmpd)

    def walk(d: Path, acc: dict[str, str | None], depth: int) -> None:
        if depth == len(partition_by):
            files = sorted(str(p) for p in d.glob("*.parquet"))
            if files:
                results.append((dict(acc), files))
            return
        want = f"__p_{partition_by[depth]}="
        for sub in sorted(p for p in d.iterdir() if p.is_dir()):
            if not sub.name.startswith(want):
                continue
            raw = unquote(sub.name[len(want):])
            acc[partition_by[depth]] = None if raw == HIVE_NULL else raw
            walk(sub, acc, depth + 1)

    walk(root, {}, 0)
    if len(results) > max_partitions:
        raise PartitionCardinalityError(
            f"commit would create {len(results)} partitions "
            f"(> max_partitions={max_partitions}); a partition key this "
            "fine-grained produces unusable O(partitions) commit metadata — "
            "bucket or truncate the key, or raise max_partitions explicitly"
        )
    results.sort(key=lambda kv: tuple(str(kv[0][c]) for c in partition_by))
    return tmpd, results
