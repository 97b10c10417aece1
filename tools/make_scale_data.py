"""Synthesize a 10x (sf1-equivalent) dataset from sf0.1 by key-shifted
replication, for scale-evidence runs (SCALE.md): every fact table is
replicated with foreign keys shifted consistently, so join fan-outs,
group cardinalities, and date selectivities match a genuinely larger
TPC-H-ish instance. Usage:

    python tools/make_scale_data.py [src_sf_dir] [dest_dir] [factor]

defaults: /root/testdata/sf0.1 -> /tmp/scaleup/sf1, factor 10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaleup/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from cdf_spark.session import get_spark

    spark = get_spark("make-scale-data")

    # key domains sized from the source so shifted replicas never collide
    def key_span(table: str, col: str) -> int:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        return int(df.agg(F.max(col)).first()[0]) + 1

    KO = key_span("orders", "o_orderkey")
    KC = key_span("customer", "c_custkey")
    KS = key_span("supplier", "s_suppkey")
    KP = key_span("part", "p_partkey")
    KE = key_span("events", "event_id")
    KU = key_span("events", "user_id")
    KD = key_span("documents", "doc_id")
    KV = key_span("embeddings", "vec_id")

    shifts = {
        "orders": {"o_orderkey": KO, "o_custkey": KC},
        "lineitem": {"l_orderkey": KO, "l_partkey": KP, "l_suppkey": KS},
        "customer": {"c_custkey": KC},
        "supplier": {"s_suppkey": KS},
        "part": {"p_partkey": KP},
        "events": {"event_id": KE, "user_id": KU},
        "documents": {"doc_id": KD},
        "embeddings": {"vec_id": KV},
    }

    os.makedirs(dst, exist_ok=True)
    for table in "region nation customer supplier part orders lineitem events documents embeddings".split():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if table in shifts:
            reps = []
            for i in range(factor):
                r = df
                for col, span in shifts[table].items():
                    r = r.withColumn(col, (F.col(col) + F.lit(i * span)).cast(df.schema[col].dataType))
                reps.append(r)
            out = reps[0]
            for r in reps[1:]:
                out = out.unionByName(r)
        else:
            out = df  # region/nation are fixed-size in TPC-H
        nparts = max(1, min(32, (out.count() // 200_000) + 1))
        out.repartition(nparts).write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        print(f"{table}: {spark.read.parquet(f'{dst}/{table}.parquet').count()} rows -> {dst}/{table}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
