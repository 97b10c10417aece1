"""SparkSession factory tuned for the engine.

Defaults target correctness-vs-DuckDB comparison (UTC session tz,
Arrow execution) and local[32] testing while remaining sane on a real
cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions sized to the environment, and Arrow
for every Python<->JVM hop.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Correctness: DuckDB timestamps are UTC-naive; pin the session tz.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for toPandas / pandas UDFs — the only sane Python boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # AQE: runtime shuffle-partition coalescing + skew-join handling.
    # At 100 TB these matter more than any static tuning we can do here.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast threshold: dims like region/nation/supplier always fit.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # InferFiltersFromGenerate synthesizes `size(arr)>0 AND isnotnull`
    # below every explode. For this engine's explodes the array is an
    # EXPENSIVE COMPUTED expression (tokenize / gram-hash / feature-
    # hash), so the inferred filter re-evaluates that expression a
    # second time AND filter-pushdown drags it below the nearest
    # exchange into the scan stage — measured 3x on the
    # decontamination gram pass at sf0.1, and the same duplicated CPU
    # exists at any scale (guide §4.4's duplicated-evaluation pathology
    # with a pure-JVM expression). Explode itself already drops empty
    # arrays, so excluding the rule is semantics-neutral; the only
    # forgone benefit is scan-level pruning of empty STORED arrays,
    # which this engine never relies on.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # Don't let tiny local tests inherit the 200-partition default.
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 8),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Deterministic parquet reads for package hashing.
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    # INT64 micros, not the deprecated INT96: interoperable (pyarrow/
    # DuckDB read it natively) AND the writer emits footer min/max
    # stats, which INT96 never has — the package evidence path and the
    # iceberg/delta bounds pruning both harvest those footers.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "cdf_spark", master: str | None = None, **overrides: str) -> SparkSession:
    """Return (or create) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster leave it unset and let spark-submit own it.
    """
    # Pin BLAS to one thread per Python worker: with local[32] workers
    # each spawning multi-threaded GEMMs the box oversubscribes and the
    # vectorized (pandas-UDF) paths get noisy; parallelism comes from
    # Spark's 32 workers, not from nested BLAS threads. Must land in
    # the environment BEFORE workers import numpy (they inherit the
    # driver env in local mode; on a cluster set spark.executorEnv.*).
    for var in ("OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS", "OMP_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
