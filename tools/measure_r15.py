"""Round-15 optimization measurement harness.

Isolates named queries with the noop sink (guide §1.4), times
median-of-3 warm passes after one discarded cold pass, captures
`.explain("formatted")` of the AQE-final plan into
plans/r15/<query>_<tag>.txt, and records the JOB/STAGE count of the
last warm pass via the status tracker (noise-free evidence on a
shared box — the r14 §10 discipline).

Usage: python tools/measure_r15.py <tag> <query> [query ...]
       python tools/measure_r15.py <tag> --top   # the heavy set
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
    "bm25_prf_expanded_topk",
    "hybrid_rrf_retrieval",
    "retrieval_eval_metrics",
    "dsir_select_docs_fast",
    "ivf_sq8_ann_topk",
    "bm25_topk_docs",
    "bm25_index_incremental",
    "nb_classifier_predict",
    "tfidf_doc_similarity",
    "token_budget_sample_docs",
    "ann_index_incremental",
    "funnel_view_click_purchase",
    "cohort_retention_weekly",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--top"]:
        names = TOP

    from cdf_spark.queries import BENCH_ONLY, QUERIES
    from cdf_spark.session import get_spark

    spark = get_spark("measure-r15")
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

    os.makedirs("plans/r15", exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES.get(name) or BENCH_ONLY[name]
        sc.setJobDescription(f"measure:{name}")
        passes = []
        jobs = stages = 0
        for i in range(4):  # 1 cold (discarded) + 3 timed
            j0 = sc.statusTracker().getJobIdsForGroup(None) or []
            nj0 = max(j0) if j0 else -1
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            passes.append(round(time.perf_counter() - t0, 3))
            if i == 3:
                j1 = sc.statusTracker().getJobIdsForGroup(None) or []
                new = [j for j in j1 if j > nj0]
                jobs = len(new)
                stages = sum(
                    len(sc.statusTracker().getJobInfo(j).stageIds or []) for j in new
                )
        warm = sorted(passes[1:])
        med = warm[1]
        out[name] = {
            "cold": passes[0],
            "passes": passes[1:],
            "median": med,
            "jobs": jobs,
            "stages": stages,
        }
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
        with open(f"plans/r15/{name}_{tag}.txt", "w") as fh:
            fh.write(plan)
        print(
            f"{med:8.3f}  (cold {passes[0]:7.3f}, warm {warm}, "
            f"jobs {jobs}, stages {stages})  {name}",
            flush=True,
        )
        sc.setJobDescription(None)

    print(json.dumps({k: v["median"] for k, v in out.items()}, indent=1))
    with open(f"plans/r15/_timings_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
