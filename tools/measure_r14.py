"""Round-14 optimization measurement harness.

Isolates named queries with the noop sink (guide §1.4), times
median-of-3 warm passes after one discarded cold pass, and captures
`.explain("formatted")` of the AQE-final plan into
plans/r14/<query>_<tag>.txt.

Usage: python tools/measure_r14.py <tag> <query> [query ...]
       python tools/measure_r14.py <tag> --top   # the heavy set
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: E402 — module-level so pandas_udf hints resolve

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TOP = [
    "connected_components_star_chain",
    "bradley_terry_supplier_strengths",
    "pagerank_supplier_graph",
    "dsir_select_docs_fast",
    "dup_substring_spans_fast",
    "hybrid_rrf_retrieval",
    "bm25_prf_expanded_topk",
    "ivf_sq8_ann_topk",
    "decontamination_check_fast",
    "retrieval_eval_metrics",
    "bm25_index_incremental",
    "ann_lsh_topk_fast",
    "quality_pr_sweep",
    "bm25_topk_docs",
    "bpe_doc_token_counts",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--top"]:
        names = TOP

    from cdf_spark.queries import BENCH_ONLY, QUERIES
    from cdf_spark.session import get_spark

    spark = get_spark("measure-r14")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sc = spark.sparkContext

    # warmups: file listing + python workers (bench parity)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 32, 1, 32).select(_warm(F.col("id"))).write.mode("overwrite").format(
        "noop"
    ).save()

    os.makedirs("plans/r14", exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES.get(name) or BENCH_ONLY[name]
        sc.setJobDescription(f"measure:{name}")
        passes = []
        for i in range(4):  # 1 cold (discarded) + 3 timed
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            passes.append(round(time.perf_counter() - t0, 3))
        warm = sorted(passes[1:])
        med = warm[1]
        out[name] = {"cold": passes[0], "passes": passes[1:], "median": med}
        # AQE-final plan: explain after execution reflects final plan for
        # this DataFrame instance (it was just executed)
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        with open(f"plans/r14/{name}_{tag}.txt", "w") as fh:
            fh.write(plan)
        print(f"{med:8.3f}  (cold {passes[0]:7.3f}, warm {warm})  {name}", flush=True)
        sc.setJobDescription(None)

    print(json.dumps({k: v["median"] for k, v in out.items()}, indent=1))
    with open(f"plans/r14/_timings_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
