"""Benchmark harness: headline queries + ingest pipeline at sf0.1.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per BASELINE.md the comparable metrics are (a) source->package
throughput (parquet scan -> contract -> segmented hashed package),
(b) package->destination commit, and (c) headline query wall-clock.
`value` is total wall seconds across the headline set; extra keys
report throughput so rounds can be compared against the reference's
ingest rooflines.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# module-level so pandas_udf string type hints (PEP 563) resolve
import pandas as pd  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "window_running_total",
    "topk_per_group",
    "sessionization",
    "tumbling_window_agg",
    "asof_join_events_orders",
    "dedup_keep_last",
    "effects_apply_merge",
    "contract_verdicts",
    "docs_profile",
    # NOT ngram_jaccard_dups: the exact all-pairs verifier is O(sum
    # bucket²) on hot shingles — quadratic by design; minhash_lsh is
    # the scale path and is benchmarked instead.  Likewise NOT
    # embedding_near_dups (exact crossJoin verifier, O(n²)): the LSH
    # variant is the scale path and is the one timed here.  The *_fast
    # names are the xxhash64 bench twins of the oracled md5 queries.
    "minhash_lsh_dups_fast",
    "simhash_dups_fast",
    # ngram_jaccard_dups_fast (prefix-filtered AllPairs/PPJoin exact
    # join, oracled) is deliberately NOT in the headline: the fixture
    # corpus is prefix-filtering's adversarial case (377 distinct
    # trigrams — every gram is hot, so candidates degenerate toward
    # all-pairs; ~9 s vs the naive plan's 97 s). On real text the gram
    # vocabulary is 10^6+ and prefixes prune hard. The APPROXIMATE
    # deploy path for near-dup at scale remains minhash_lsh (above).
    # cosine_topk (the oracled HOF baseline) is a PARITY TWIN
    # (queries.PARITY_TWINS): BNLJ brute force, broadcast-scale by
    # contract — headline runs only the deploy path, the vectorized
    # GEMM pandas-UDF twin with identical (parity-checked) results.
    "cosine_topk_fast",
    "ann_lsh_topk_fast",
    "ivf_ann_topk_fast",
    "pq_ann_topk_fast",
    # IVF-PQ composite (registry entry IS the deploy path: fused
    # routing + in-cluster ADC + exact rescore)
    "ivf_pq_ann_topk",
    "embedding_near_dups_lsh_fast",
    "stratified_sample",
    "exact_dedup_docs",
    "segment_dedup_docs",
    "tfidf_top_terms",
    # round 2: curation layer — broadcast eval-gram decontamination
    # (xxhash64 deploy twin of the md5-oracled decontamination_check)
    # and the zero-shuffle repetition/diversity projection
    "decontamination_check_fast",
    "repetition_quality",
    # round 10: the LM-quality layer — unigram perplexity (2 shuffles
    # + broadcast vocab) and the order-sensitive bigram variant (adds
    # the lead() pairing + a non-broadcast transition join)
    "lm_perplexity_scores",
    "lm_bigram_perplexity",
    # round 10 late: ExactSubstr sliding-gram span dedup (2 shuffles of
    # (md5, doc, pos) — the distributed suffix-array answer), corpus-
    # frequency boilerplate removal (distinct-count + broadcast
    # anti-join), and BPE training + tokenizer-aware counting (ONE
    # corpus shuffle, then 8 word-table iterations + broadcast count)
    # dup_substring_spans_fast: xxhash64 twin of the md5-oracled
    # ExactSubstr scan (same discipline as minhash/simhash: the
    # oracled md5 construction exists for SQL parity; the bench times
    # the JVM-native deploy hash)
    "dup_substring_spans_fast",
    "boilerplate_line_removal",
    "bpe_doc_token_counts",
    # round 2: the two heaviest new TPC-H shapes (5-way and 4-way
    # join aggregations) — plan-quality sentinels for join strategy
    "q9_product_type_profit",
    "q10_returned_items",
    # round 11 second wave: closed-form NB train+score end to end
    # (2 shuffles + broadcasts, the no-iteration distributed-training
    # shape) and the temperature token-budget mixer (per-domain
    # windows, 2 shuffles)
    "nb_classifier_predict",
    "token_budget_sample_docs",
    # round 12: persisted incremental ANN index — the COLD pass pays
    # build+3 folds (session fixture); warm passes probe the on-disk
    # index with no rebuild, which is the deployment wall that must
    # stay independent of how many adds built the index
    "ann_index_incremental",
    # round 12 second wave: DSIR distribution-matching selection (two
    # broadcast bucket models + ONE corpus shuffle), one-shot BM25
    # ranked retrieval (tf groupBy + broadcast df/qterms), and the
    # persisted inverted index (cold pass = 3 folds; warm probes read
    # only the term-hash buckets the query touches)
    # dsir_select_docs (md5 SQL-parity) stays oracle-only: the bench
    # times the xxhash64 deploy twin (same estimator, JVM-native hash
    # — measured 33s -> ~3s at sf0.1, all of it md5 cost)
    "dsir_select_docs_fast",
    "bm25_topk_docs",
    "bm25_index_incremental",
    # IVF-SQ8 composite (registry entry IS the deploy path: routing +
    # int8 candidate scan + exact rescore — the bandwidth-compression
    # sibling of ivf_pq_ann_topk)
    "ivf_sq8_ann_topk",
    # round 12 third wave: iterative graph processing (5 power
    # iterations over the order-derived trade graph — per-iteration
    # edge join + combinable contribution sum, localCheckpoint-
    # truncated lineage), hybrid BM25+ANN RRF fusion (both retrieval
    # legs end to end; the fusion itself is broadcast-scale), two-pass
    # pseudo-relevance-feedback BM25 (shared corpus tf subtree), and
    # the ordered-sequence funnel (per-step user-keyed min-join)
    "pagerank_supplier_graph",
    "hybrid_rrf_retrieval",
    "bm25_prf_expanded_topk",
    "funnel_view_click_purchase",
    # round 12 third wave, later batch: the second iterative ML fit
    # (pairwise counts reduce before the loop — the wall measures 5
    # MM rounds over the O(distinct pairs) table) and two events/
    # retrieval one-pass shapes
    "bradley_terry_supplier_strengths",
    "tfidf_doc_similarity",
    "cohort_retention_weekly",
    # round 13: O(log n) star-contraction components over the trade
    # graph + a ~1500-link chain (the web-scale CC shape), the
    # retrieval evaluation loop (BM25 run + derived qrels + integer
    # MRR/recall/nDCG), and the classifier PR sweep (two-phase exact
    # cumsum over distinct scores)
    "connected_components_star_chain",
    "retrieval_eval_metrics",
    "quality_pr_sweep",
    # round 14: sliding windows (2x shuffle fan-out, stated), the
    # per-stratum PSI monitor (two map-side count reductions + tiny
    # broadcast joins), and the unigram-LM tokenizer trainer (two
    # hard-EM rounds: zero-shuffle Viterbi kernel + one count agg
    # each, over the distinct-word table)
    "sliding_window_agg",
    "psi_drift_by_source",
    "unigram_lm_tokenizer",
]


def _materialize(df) -> int:
    """Force full execution without sink cost (noop writer)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    from cdf_spark.queries import QUERIES
    from cdf_spark.session import get_spark

    # fd-level stdout quarantine (the r11 tail-fragment defect): the
    # JVM inherits fd 1 at launch, and a task-retry stack trace it
    # prints there lands in the driver's bounded tail capture,
    # camouflaging real failures. Save the real stdout for the ONE
    # JSON record, then point fd 1 at stderr for everything else —
    # including the JVM about to be launched.
    real_stdout_fd = os.dup(1)
    os.dup2(2, 1)

    spark = get_spark("cdf-spark-bench")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    sf = None
    m = [p for p in SF_DIR.split("/") if p.startswith("sf")]
    if m:
        try:
            sf = float(m[-1][2:])
        except ValueError:
            sf = None

    from cdf_spark.queries import BENCH_ONLY

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    # session-cold probes FIRST (before any warmup): first-ever-pass
    # numbers for two headline queries, so the steady-state-only
    # methodology can't hide a startup regression (these pay JVM init,
    # file listing, python-worker spawn, codegen — deliberately).
    session_cold: dict[str, float] = {}
    for name in ("q1_pricing_summary", "minhash_lsh_dups_fast"):
        fn = QUERIES.get(name) or BENCH_ONLY[name]
        t0 = time.perf_counter()
        try:
            _materialize(fn(spark, SF_DIR))
            session_cold[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[f"session_cold:{name}"] = f"{type(exc).__name__}: {exc}"[:400]

    # warm the JVM + file listing once (excluded from timings)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # Python-worker + Arrow warmup (untimed): the first pandas_udf
    # execution in a session pays worker spawn + numpy/pandas import +
    # Arrow serializer init (~5s across 32 workers); on a long-lived
    # cluster workers are resident, so steady-state timings exclude it
    # (same rationale as the ingest plan-compile warmup below).
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 32, 1, 32).select(_warm(F.col("id"))).write.mode("overwrite").format(
        "noop"
    ).save()

    # Three passes, MEDIAN headline (r8 verdict item 5): pass 1
    # (recorded as cold_queries) pays per-plan codegen compile + any
    # residual python-runner init; passes 2-3 are warm steady state.
    # Through r8 the headline was best-of-2 (min) — robust against a
    # contaminated slow pass but blind to a contaminated FAST pass and
    # unable to state a noise floor. The r8-vs-r7 comparison showed a
    # ~±20% lockstep drift band on this shared machine; median-of-3 is
    # the estimator that makes single-round deltas interpretable
    # against that band (one outlier in either direction is discarded).
    # All three raw maps are reported in BENCH_DETAIL for inspection.
    # Fault isolation: one broken query must never abort the bench (r02
    # shipped zero numbers because the 7th query threw). Each query is
    # wrapped; failures are recorded under "errors" and the summary JSON
    # is always emitted.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    warm2: dict[str, float] = {}
    for pass_timings in (cold, warm, warm2):
        for name in BENCH_QUERIES:
            if name in errors:
                continue
            fn = QUERIES.get(name) or BENCH_ONLY[name]
            t0 = time.perf_counter()
            try:
                _materialize(fn(spark, SF_DIR))
            except Exception as exc:  # noqa: BLE001 — isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:400]
                continue
            pass_timings[name] = round(time.perf_counter() - t0, 3)
    for name in BENCH_QUERIES:
        passes = sorted(d[name] for d in (cold, warm, warm2) if name in d)
        if passes:
            timings[name] = passes[len(passes) // 2]  # median


    # ingest roofline: parquet -> contract -> dedup -> package (+ commit)
    from cdf_spark.contracts import Contract, DomainRule, NullabilityRule, RangeRule
    from cdf_spark.package.ledger import ParquetDestination
    from cdf_spark.runtime import LoadPipeline
    from cdf_spark.sources import FileResource, ResourceDescriptor
    from cdf_spark.sources.base import WriteDisposition

    tmp = tempfile.mkdtemp(prefix="cdf_bench_")
    ingest_mib_s = ingest_rows_s = ingest_big_mib_s = ingest_big_rows_s = None
    ingest_big_none_mib_s = None
    try:
        contract = Contract(
            rules=[
                NullabilityRule("l_orderkey"),
                RangeRule("l_quantity", min=0.0, max=100.0),
                DomainRule("l_returnflag", ["A", "N", "R"]),
            ]
        )

        # Plan/codegen warm-up (untimed): one small pipeline run so both
        # timed ingest numbers measure a long-lived service's steady
        # state — BASELINE's rooflines are steady-state numbers too, and
        # the first-compile cost is a one-time session artifact, not a
        # per-batch cost.
        t0 = time.perf_counter()
        LoadPipeline(
            resource=FileResource(
                ResourceDescriptor(resource_id="warmup"), f"{SF_DIR}/lineitem.parquet"
            ),
            contract=contract,
            package_root=f"{tmp}/pkgs_warm",
            destination=ParquetDestination(f"{tmp}/dest_warm"),
            disposition=WriteDisposition.APPEND,
        ).run(spark)
        session_cold["ingest_lineitem_package"] = round(time.perf_counter() - t0, 3)

        # steady-state ingest: a 20x fixture (12M rows at sf0.1,
        # ~200 MiB) measures the amortized roofline comparable to
        # BASELINE's bulk-commit targets; sf0.1 lineitem (~10 MiB)
        # measures the small-batch fixed cost.
        #
        # The SMALL ingest runs FIRST and both are best-of-2: in r4 the
        # small path measured 4.8s vs 3.0s on an idle machine purely
        # because it ran right after the (newly real) 12M-row ingest —
        # GC pressure + page-cache eviction, not a path regression.
        # Ordering small-before-big measures the fixed cost in a clean
        # state; min-of-2 keeps both numbers noise-robust (same policy
        # as the query set).
        pipe_small = lambda i: LoadPipeline(  # noqa: E731
            resource=FileResource(
                ResourceDescriptor(resource_id="lineitem"), f"{SF_DIR}/lineitem.parquet"
            ),
            contract=contract,
            package_root=f"{tmp}/pkgs_{i}",
            destination=ParquetDestination(f"{tmp}/dest_{i}"),
            disposition=WriteDisposition.APPEND,
        )
        ingest_sec = None
        for i in range(2):
            t0 = time.perf_counter()
            run = pipe_small(i).run(spark)
            ingest_sec = min(ingest_sec or 9e9, round(time.perf_counter() - t0, 3))
        timings["ingest_lineitem_package"] = ingest_sec
        src = f"{SF_DIR}/lineitem.parquet"
        # a scaled-up SF dir stores each table as a DIRECTORY of part
        # files; getsize on the dir inode would report ~4 KiB and blow
        # up the MiB/s number
        src_bytes = (
            sum(
                os.path.getsize(os.path.join(src, f))
                for f in os.listdir(src)
                if f.endswith(".parquet")
            )
            if os.path.isdir(src)
            else os.path.getsize(src)
        )
        ingest_mib_s = round(src_bytes / 1024 / 1024 / ingest_sec, 2)
        ingest_rows_s = round(run.rows_admitted / ingest_sec)

        # Cache keyed on the SF dir (r3 bug: an os.path.isdir-only
        # guard reused a stale ~120k-row fixture built from a small SF
        # during testing, invalidating the round's roofline). Validity
        # = _SUCCESS marker present AND row count == 20 x live
        # count(lineitem); rebuild on any mismatch.
        sf_key = "".join(c if c.isalnum() else "_" for c in SF_DIR.strip("/"))
        big = os.path.join(tempfile.gettempdir(), f"cdf_bench_big_lineitem_{sf_key}")
        li_rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
        expected_rows = 20 * li_rows
        cache_ok = False
        if os.path.isdir(big) and os.path.isfile(os.path.join(big, "_SUCCESS")):
            try:
                cache_ok = spark.read.parquet(big).count() == expected_rows
            except Exception:  # noqa: BLE001 — unreadable cache → rebuild
                cache_ok = False
        if not cache_ok:
            from pyspark.sql import functions as F

            shutil.rmtree(big, ignore_errors=True)
            li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            reps = [
                li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
                for i in range(20)
            ]
            out = reps[0]
            for r_ in reps[1:]:
                out = out.unionByName(r_)
            out.repartition(32).write.mode("overwrite").parquet(big)
        big_bytes = sum(
            os.path.getsize(os.path.join(big, f)) for f in os.listdir(big) if f.endswith(".parquet")
        )
        big_sec = None
        for i in range(2):
            pipe_big = LoadPipeline(
                resource=FileResource(ResourceDescriptor(resource_id="lineitem_big"), big),
                contract=contract,
                package_root=f"{tmp}/pkgs_big_{i}",
            )
            t0 = time.perf_counter()
            run_big = pipe_big.run(spark)
            big_sec = min(big_sec or 9e9, round(time.perf_counter() - t0, 3))
        timings["ingest_big_12m_rows"] = big_sec
        ingest_big_mib_s = round(big_bytes / 1024 / 1024 / big_sec, 1)
        ingest_big_rows_s = round(run_big.rows_admitted / big_sec)

        # codec-matched encode roofline: BASELINE's parquet encode
        # number (`arrow_ipc_to_parquet_none`, 74.33 MiB/s; snappy
        # variant 8.39) counts UNCOMPRESSED bytes through the encoder.
        # Our input is snappy-compressed parquet, so input-MiB/s under
        # codec=none is meaningless (output bytes triple and the wall
        # goes UP on compressible data — measured). The comparable
        # number is OUTPUT bytes written per second with codec=none:
        # same full pipeline (scan -> contract -> hashed package), one
        # extra pass, reported separately and NOT in timings so the
        # headline stays snappy (the production default) and
        # round-over-round comparable.
        none_sec = None
        none_out_bytes = 0
        for i in range(2):
            pipe_none = LoadPipeline(
                resource=FileResource(ResourceDescriptor(resource_id="lineitem_big"), big),
                contract=contract,
                package_root=f"{tmp}/pkgs_none_{i}",
                package_compression="none",
            )
            t0 = time.perf_counter()
            run_none = pipe_none.run(spark)
            sec = round(time.perf_counter() - t0, 3)
            if none_sec is None or sec < none_sec:
                none_sec = sec
                dp = run_none.package.data_path()
                none_out_bytes = sum(
                    os.path.getsize(os.path.join(dp, f))
                    for f in os.listdir(dp)
                    if f.endswith(".parquet")
                )
        ingest_big_none_mib_s = round(none_out_bytes / 1024 / 1024 / none_sec, 1)
    except Exception as exc:  # noqa: BLE001 — ingest failure must not kill the summary
        errors["ingest"] = f"{type(exc).__name__}: {exc}"[:400]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)

    # per-query deltas vs the newest PARSEABLE recorded round: walk
    # BENCH_r{N}.json newest-first until one actually carries a query
    # map (r9's record was rc=0/parsed=null — only a shutdown stack in
    # the tail — so anchoring blindly to the newest file would make
    # every delta silently empty; the r9 ADVICE defect at the old
    # bench.py:355)
    deltas: dict[str, float] = {}
    prev_name = None
    try:
        import glob

        here = os.path.dirname(os.path.abspath(__file__))
        for cand in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), reverse=True):
            try:
                with open(cand) as fh:
                    prev = json.load(fh)
            except Exception:  # noqa: BLE001 — unreadable round, keep walking
                continue
            prev_q = (prev.get("parsed") or prev).get("queries") or {}
            if not prev_q:
                continue
            prev_name = os.path.basename(cand)
            for k, v in timings.items():
                if k in prev_q:
                    deltas[k] = round(v - prev_q[k], 3)
            break
    except Exception:
        deltas = {}

    # Evidence split (r3 defect: the single stdout line outgrew the
    # driver's tail capture and the JSON never parsed — two rounds
    # running with no driver-certified bench). stdout now carries ONE
    # compact line with the headline scalars + best-of query map; the
    # raw cold/warm passes, session-cold probes, and deltas go to
    # BPE real-vocab regime (r11): the headline's bpe_doc_token_counts
    # trains 8 merges — the oracled fixture scale. A production
    # tokenizer is 30k-50k merges, where the sequential loop's
    # O(n_merges) driver round-trips are the scale-killer the r10
    # verdict flagged. Batched training (exactness-preserving
    # directional-independence batching, operators/bpe.py) is the
    # answer, but its yield is a CORPUS property: the fixture
    # documents table has only ~31 distinct words, so its pair head is
    # maximally conflicted — the degenerate case. This entry measures
    # BOTH: (a) the fixture corpus trained to saturation, (b) a
    # deterministic hash-derived 50k-word corpus (the ann_crossover
    # discipline: self-contained at any SF) where the realistic-
    # vocabulary cadence claim — rounds << merges — is actually
    # observable.
    bpe_training = None
    try:
        from pyspark.sql import functions as F2

        from cdf_spark.operators.bpe import learn_bpe

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        t0 = time.perf_counter()
        merges = learn_bpe(docs, n_merges=256, batch=32)
        wall = round(time.perf_counter() - t0, 2)
        synth = (
            spark.range(50_000)
            .select(
                F2.translate(
                    F2.substring(F2.md5(F2.col("id").cast("string")), 1, 6 + F2.pmod(F2.col("id"), F2.lit(7)).cast("int")),
                    "0123456789",
                    "ghijklmnop",
                ).alias("text")
            )
        )
        t0 = time.perf_counter()
        m2 = learn_bpe(synth, n_merges=256, batch=32)
        wall2 = round(time.perf_counter() - t0, 2)
        bpe_training = {
            "fixture_corpus": {"n_merges": len(merges), "batch": 32, "wall_s": wall},
            "synthetic_50k_words": {
                "n_merges": len(m2),
                "batch": 32,
                "wall_s": wall2,
                "merges_per_s": round(len(m2) / wall2, 2) if wall2 else None,
            },
        }
    except Exception as exc:  # noqa: BLE001
        errors["bpe_training"] = f"{type(exc).__name__}: {exc}"[:400]

    # ANN crossover runs LAST: the 1M-corpus block evicts page cache
    # that the headline + ingest numbers depend on (measured r8: the
    # ingest roofline doubled when this ran before it).
    # ANN crossover (the claim SCALE.md could previously only assert):
    # at >=200k vectors and a 1k query batch, the IVF fast path must
    # beat brute-force GEMM. Synthetic deterministic corpus (hash-
    # derived vectors, dim 64) so the entry is self-contained at any SF.
    ann_crossover = None
    try:
        from cdf_spark.operators.similarity import cosine_topk_fast, ivf_ann_topk_fast
        from cdf_spark.plans.checkpoint import release_local_checkpoint

        # HONESTY NOTE (r7): earlier single-pass ratios up to 23.9x
        # were cold-vs-warm artifacts — the brute pass paid python-
        # worker/pipeline warmup the ivf pass then skipped. Best-of-2
        # per path (below) removes that. Warm-vs-warm at this config
        # the measured gap is ~1.5-2x (brute ~2.8 s, ivf ~1.8 s):
        # per-candidate flops drop ~75x (nprobe/nlist rescore), but at
        # this corpus size both paths are memory-bandwidth-bound, so
        # wall converges toward the bytes moved. The per-query flop
        # model (and the ratio) grows with corpus size; larger nq
        # configs were measured unstable under ambient join-plan
        # flips, so the bench pins the stable regime and reports both
        # walls rather than chasing a headline ratio.
        N, dim, nq = 150_000, 256, 4096
        corpus = (
            spark.range(N)
            .withColumnRenamed("id", "vec_id")
            .withColumn(
                "embedding",
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: (F.xxhash64(F.col("vec_id"), j) % 20001) / F.lit(10000.0),
                ),
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        qs = corpus.filter(F.col("vec_id") % (N // nq) == 0)
        # best of TWO passes per path: observed run-to-run swings of
        # 2x on the brute side (15-31 s) and ivf side (3-6 s) from
        # page-cache / python-worker state made the single-pass
        # speedup ratio noisy (2.4x-24x across r6/r7 runs); min() is
        # the same noise-robust estimator the headline uses
        def _best_of(fn, passes=2):
            best = None
            for _ in range(passes):
                t0 = time.perf_counter()
                _materialize(fn())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        brute = _best_of(lambda: cosine_topk_fast(corpus, qs, k=10))
        ivf = _best_of(
            lambda: ivf_ann_topk_fast(corpus, qs, k=10, nprobe=4, centroid_modulus=500)
        )
        ann_crossover = {
            "n": N,
            "nq": nq,
            "brute_s": round(brute, 2),
            "ivf_s": round(ivf, 2),
            "speedup": round(brute / ivf, 2),
        }
        release_local_checkpoint(corpus)

        # second point — the crossover regime (r7 verdict): n=1M at
        # dim 256, FLOAT32 end-to-end (array<float> column -> float32
        # Arrow batches -> float32 GEMM), so the brute path can no
        # longer hide its 2.1 TFLOP behind bandwidth the ivf path pays
        # too. The corpus is generated ONCE and cached in /tmp across
        # rounds (deterministic hash vectors, so the cache is stable).
        import os as _os

        import numpy as _np

        N2, dim2, nq2 = 1_000_000, 256, 4096
        cache = "/tmp/cdf_bench_ann_1m_f32.parquet"
        if not _os.path.isdir(cache):
            (
                spark.range(N2)
                .withColumnRenamed("id", "vec_id")
                .withColumn(
                    "embedding",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim2 - 1)),
                        lambda j: (
                            (F.xxhash64(F.col("vec_id"), j) % 20001) / F.lit(10000.0)
                        ).cast("float"),
                    ),
                )
                .repartition(32)
                .write.mode("overwrite")
                .parquet(cache)
            )
        corpus2 = spark.read.parquet(cache).localCheckpoint(eager=True)
        qs2 = corpus2.filter(F.col("vec_id") % (N2 // nq2) == 0)
        # ivf FIRST (best-of-2) so the corpus pages and python workers
        # are hot before brute runs — any residual warmth bias favors
        # BRUTE, i.e. works against the speedup claim. Brute is a
        # single pass: at ~220 s/pass its pass-to-pass variance
        # measured <15% (217.6 vs 246.6 s), so min-of-2 buys little
        # for another 4 bench minutes.
        ivf2 = _best_of(
            lambda: ivf_ann_topk_fast(
                corpus2, qs2, k=10, nprobe=4, centroid_modulus=5000, dtype=_np.float32
            )
        )
        brute2 = _best_of(
            lambda: cosine_topk_fast(corpus2, qs2, k=10, dtype=_np.float32), passes=1
        )
        ann_crossover["point_1m_f32"] = {
            "n": N2,
            "nq": nq2,
            "dtype": "float32",
            "brute_s": round(brute2, 2),
            "ivf_s": round(ivf2, 2),
            "speedup": round(brute2 / ivf2, 2),
            "method": "ivf best-of-2 first (warms corpus pages for brute), brute single warm pass",
        }
        release_local_checkpoint(corpus2)
    except Exception as exc:  # noqa: BLE001
        errors["ann_crossover"] = f"{type(exc).__name__}: {exc}"[:400]

    headline = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": sf,
        "ingest_mib_s": ingest_mib_s,
        "ingest_rows_s": ingest_rows_s,
        "ingest_big_mib_s": ingest_big_mib_s,
        "ingest_big_rows_s": ingest_big_rows_s,
        "ingest_big_none_mib_s": ingest_big_none_mib_s,
        "ann_crossover": ann_crossover,
        "bpe_training": bpe_training,
        "detail_file": "BENCH_DETAIL.json",
    }

    # BENCH_DETAIL.json next to this script. The full headline is
    # embedded here too: the r9 round lost its driver-certified record
    # when a JVM-shutdown stack trace flooded the tail capture AFTER
    # the stdout line — the detail file is the on-disk copy that
    # survives any stdout mishap.
    detail = {
        "methodology": (
            "per-query MEDIAN of 3 passes (1 cold + 2 warm; one contaminated "
            "pass in either direction is discarded — the shared-machine noise "
            "band measured r6-r8 is ~±20%, so single-round deltas inside that "
            "band are environment, not code); cold/warm/warm2 are the raw "
            "passes; session_cold = first-ever pass before any warmup"
        ),
        "cold_queries": cold,
        "warm_queries": warm,
        "warm2_queries": warm2,
        "cold_total": round(sum(cold.values()), 3),
        "session_cold": session_cold,
        "delta_vs": prev_name,
        "deltas_sec": deltas,
        "errors": errors,
        "headline": headline,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except Exception:  # noqa: BLE001 — detail file is best-effort
        pass

    # Shutdown ordering (the r9 tail-capture defect): spark.stop() in
    # Spark 4 can emit an async RejectedExecutionException stack AFTER
    # our JSON line, and the driver's bounded tail capture then records
    # only the stack (rc=0, parsed=null — a lost round). So: stop the
    # session FIRST (exceptions swallowed), give async shutdown threads
    # a beat to flush their noise, print the headline as the absolute
    # last stdout line, and hard-exit so no atexit/JVM hook can write
    # after it.
    try:
        spark.stop()
    except Exception:  # noqa: BLE001 — shutdown noise must not cost the record
        pass
    time.sleep(2.0)
    sys.stdout.flush()
    sys.stderr.flush()
    # the record goes to the SAVED real stdout — fd 1 has pointed at
    # stderr since startup, so nothing the JVM ever printed shares the
    # stream with this line
    os.write(
        real_stdout_fd,
        (json.dumps(headline, separators=(",", ":")) + "\n").encode(),
    )
    os._exit(0)


if __name__ == "__main__":
    main()
