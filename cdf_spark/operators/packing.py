"""Training-batch assembly operators: sequence packing + domain mixing.

The last mile of a pretraining data pipeline, after dedup/quality/
decontamination: assemble documents into fixed-token-budget training
sequences, and sample sources to hit a target domain mixture. Both are
deterministic, shuffle-minimal, and carry exact ANSI-SQL twins for the
oracle gate (window cumulative sums; md5-parity hash gates).

Scale notes (100 TB):
- `pack_sequences` is one window over (shard, order) — packing is
  per-shard, so the sort shuffle is bounded by shard size, never a
  global sort. Shards map to whatever parallel unit the trainer reads
  (a file, a worker's slice); packing across shards would serialize the
  corpus for zero training benefit.
- `domain_mix_sample` is a broadcast of per-domain rates (|domains|
  rows) + a stateless hash gate per row — no shuffle beyond the tiny
  rate aggregation. The hash gate keeps sampling decisions reproducible
  row-by-row across engines and runs (no RNG state anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import hash64, token_count

HASH_GATE_MOD = 1_000_000


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each document to a fixed-token-budget pack by contiguous
    fill: documents are taken in deterministic (shard, id) order, and a
    document starts the next pack when its tokens would not fit — the
    sequential-fill discipline training loaders actually use (greedy
    best-fit packing would reorder the corpus and shuffle per token for
    a ~1% density win).

    Output per document: (id, n_tokens, pack_id, pack_offset) where
    pack_offset is the token position within the pack. Documents longer
    than the budget occupy a pack alone (the trainer truncates; this
    operator never silently drops).

    The assignment is a closed form over the running total: with
    cum = sum of tokens up to and including this doc (window), a doc
    belongs to pack floor((cum - 1) / budget) ONLY under exact fill;
    real packing needs the boundary reset, which the closed form cannot
    express — so the fill is computed as a per-shard aggregate fold
    (collect in window order inside the SQL twin, a size-bounded shard
    here). To keep BOTH engines in pure closed-form (no fold), packing
    uses the BLOCKED discipline: pack = floor((cum - n) / budget) —
    i.e. a document is placed at its running-total offset and packs are
    budget-sized windows of the token stream. A document may straddle a
    boundary; `pack_offset + n_tokens > budget` marks it for the
    trainer's splitter. This is exactly 'concatenate-then-chunk', the
    GPT-style packing, and it is deterministic and O(1) per row."""
    shard = F.col(shard_col) if shard_col else F.lit("_all")
    w = Window.partitionBy(shard).orderBy(F.col(id_col).asc())
    n = token_count(F.col(text_col))
    base = df.select(
        F.col(id_col),
        *([F.col(shard_col)] if shard_col else []),
        n.cast("long").alias("n_tokens"),
    )
    out = base.withColumn("_cum", F.sum("n_tokens").over(w))
    return out.select(
        id_col,
        *( [shard_col] if shard_col else [] ),
        "n_tokens",
        (((F.col("_cum") - F.col("n_tokens")) / budget).cast("long")).alias("pack_id"),
        ((F.col("_cum") - F.col("n_tokens")) % budget).alias("pack_offset"),
    )


def domain_mix_sample(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic sampling to a target domain mixture.

    Given target proportions p_d, the largest achievable mixture keeps
    every row of the binding domain (the one with the smallest
    n_d / p_d) and samples the rest down: total T = min_d(n_d / p_d),
    take rate r_d = T * p_d / n_d. Rows pass a reproducible hash gate
    (md5-parity, like every sampler here): hash64(id) % 1e6 < r_d * 1e6
    — approximate counts (binomial-ish around the target), but the
    row-level keep/drop decision is bit-identical across engines and
    runs, which is what makes the mixture auditable.

    Domains absent from `targets` are dropped. Returns the sampled rows
    with a `mix_rate` column recording the applied rate (rounded to 6,
    the gate's granularity)."""
    rates_src = [(d, float(p)) for d, p in targets.items()]
    spark = df.sparkSession
    tgt = spark.createDataFrame(rates_src, f"{domain_col} string, _p double")
    counts = df.join(F.broadcast(tgt), on=domain_col).groupBy(domain_col, "_p").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # T = min_d(n_d / p_d); r_d = T * p_d / n_d  (closed form, tiny agg)
    t_total = counts.agg(F.min(F.col("_n") / F.col("_p")).alias("_t"))
    rates = counts.crossJoin(F.broadcast(t_total)).select(
        domain_col,
        F.round(F.col("_t") * F.col("_p") / F.col("_n"), 6).alias("mix_rate"),
    )
    gate = hash64(F.col(id_col).cast("string")) % HASH_GATE_MOD
    return (
        df.join(F.broadcast(rates), on=domain_col)
        .filter(gate < (F.col("mix_rate") * HASH_GATE_MOD).cast("long"))
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TEMPERATURE-WEIGHTED token-budget selection — the corpus-mixing
    stage between curation and packing: given a total training-token
    budget B, allocate per-domain token targets by the standard
    temperature rule w_d ∝ n_d^alpha (alpha=1 reproduces natural
    proportions; alpha→0 flattens toward uniform — the multilingual
    up-sampling trick of mBERT/XLM-R and the domain-mixing knob of
    Pile-style corpora), then fill each domain's allocation with docs
    in a deterministic pseudo-random order until the target is met.

    `domain_mix_sample` answers "match these HAND-PICKED proportions
    with per-row rate gates (approximate counts)"; this answers
    "derive the proportions from the corpus itself and hit an EXACT
    token budget" — the unit a trainer actually provisions.

    Determinism discipline: per-domain token masses n_d are exact
    integers; the temperature weight is pinned to integer micro-units
    s_d = round(n_d^alpha * 1e6) BEFORE normalization, so the target
    split target_d = (B * s_d) DIV Σs_d is pure integer arithmetic —
    bit-identical in any engine. Selection order is md5(id) (the
    suite's engine-portable shuffle key) and the cut keeps every doc
    that STARTS before the target is exhausted (cum - tokens <
    target), so the output overshoots by at most one doc per domain —
    the canonical greedy fill.

    Output: (id, domain, n_tokens, pick_order, cum_tokens,
    target_tokens). Scale: one narrow token-count pass, one tiny
    domain agg (O(domains), broadcast back), then the greedy fill by
    the suite's TWO-PHASE cumulative-sum pattern (`training_shuffle`):
    range-repartition on (domain, md5 key) so partitions tile each
    domain's pick order, collect O(partitions × domains) count/token
    subtotals to the driver, convert them to per-(partition, domain)
    offsets, and finish with a per-(partition, domain) local window.
    A naive `Window.partitionBy(domain)` cumsum serializes the
    DOMINANT domain's entire document set through ONE reducer — with
    a handful of domains (web/code/books/wiki, the normal case) that
    one task is the job at 100 TB; here every partition carries a
    bounded key range and works in parallel.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(domain_col).alias("domain"),
        F.size(
            F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
        ).cast("long").alias("n_tokens"),
    )
    # two-phase exact cumsum (the training_shuffle discipline): the
    # global per-domain pick order is md5(id), id — range-repartition
    # on (domain, md5, id) makes partitions tile that order, so a
    # LOCAL window plus a driver-computed per-(partition, domain)
    # offset reproduces the global window bit-for-bit with no
    # single-domain reducer.
    keyed = toks.withColumn(
        "_mk", F.md5(F.col("_id").cast("string"))
    )
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    keyed = (
        keyed.repartitionByRange(n_parts, F.col("domain"), F.col("_mk"), F.col("_id"))
        .withColumn("_pid", F.spark_partition_id())
        # pin the range partitioning across the offsets action and the
        # output action (the r13 two-phase determinism rule)
        .localCheckpoint(eager=True)
    )
    # domain token masses fold from the PIN, not from raw rows (r15,
    # guide §1.2): the targets broadcast build used to re-tokenize the
    # corpus once per branch (the `dom` agg and its total — 2 extra
    # full scans in the final plan); `keyed` carries (domain,
    # n_tokens) for exactly these rows, so the aggs are value-
    # identical and corpus-free.
    dom = keyed.groupBy("domain").agg(F.sum("n_tokens").alias("_nd"))
    # sqrt is IEEE-correctly-rounded in every engine (JVM Math.pow is
    # only 1-ulp), so the default temperature gets guaranteed parity;
    # other alphas agree after the 1e-6 rounding for all practical
    # inputs but carry no formal guarantee.
    powed = (
        F.sqrt(F.col("_nd").cast("double"))
        if float(alpha) == 0.5
        else F.pow(F.col("_nd").cast("double"), F.lit(float(alpha)))
    )
    dom = dom.withColumn("_s", F.round(powed * 1e6).cast("long"))
    tot = dom.agg(F.sum("_s").alias("_stot"))
    targets = dom.crossJoin(F.broadcast(tot)).select(
        "domain",
        F.expr(f"CAST({int(budget_tokens)} AS BIGINT) * _s DIV _stot").alias(
            "target_tokens"
        ),
    )
    # pass 1: per-(partition, domain) row counts + token subtotals —
    # O(partitions × domains) rows, the only collected state
    subtotals = (
        keyed.groupBy("_pid", "domain")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("n_tokens").alias("_t"))
        .collect()
    )
    by_dom: dict[str, list] = {}
    for r in subtotals:
        by_dom.setdefault(r.domain, []).append(r)
    offsets = []
    for d, rows in by_dom.items():
        cnt_acc, tok_acc = 0, 0
        for r in sorted(rows, key=lambda r: r._pid):
            offsets.append((int(r._pid), d, cnt_acc, tok_acc))
            cnt_acc += r._n
            tok_acc += r._t
    off_df = df.sparkSession.createDataFrame(
        offsets, "_pid int, domain string, _cnt_off long, _tok_off long"
    )
    # pass 2: per-(partition, domain) local window — every partition
    # holds a bounded key range, so no task sees more than ~1/parts
    # of any domain
    w = Window.partitionBy("_pid", "domain").orderBy("_mk", "_id")
    ranked = (
        keyed.join(F.broadcast(off_df), on=["_pid", "domain"])
        .join(F.broadcast(targets), on="domain")
        .withColumn("pick_order", F.col("_cnt_off") + F.row_number().over(w))
        .withColumn("cum_tokens", F.col("_tok_off") + F.sum("n_tokens").over(w))
    )
    return ranked.filter(
        F.col("cum_tokens") - F.col("n_tokens") < F.col("target_tokens")
    ).select(
        F.col("_id").alias(id_col),
        "domain",
        "n_tokens",
        "pick_order",
        "cum_tokens",
        "target_tokens",
    )


def training_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global corpus shuffle for training order: every
    row gets a stable pseudo-random sort key (md5 of seed:id — engine-
    portable, so the order is bit-reproducible anywhere) and an exact
    global POSITION 0..n-1 in that order.

    The scalable part is the position. A global `row_number() OVER
    (ORDER BY key)` collapses to ONE partition — the classic scale
    killer. Instead: range-repartition on the key (so partitions tile
    the key space in order), count rows per partition (tiny driver
    list), convert counts to cumulative offsets, and add each row's
    within-partition rank — two passes, no global window, position =
    offset[p] + local_rank. The same zip-with-index discipline a
    trainer's sharded data loader needs anyway (shard = partition,
    position = sample index).

    Output: all input columns + shuffle_key + position.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    keyed = df.withColumn("shuffle_key", key).repartitionByRange(n_parts, F.col("shuffle_key"))
    # pin the range partitioning across the offsets action and the
    # output action (the r13 two-phase determinism rule)
    with_pid = keyed.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    # pass 1: per-partition counts -> cumulative offsets (driver-side,
    # O(partitions) — the only collected state)
    counts = {
        r._pid: r.n
        for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    # pass 2: within-partition rank (per-partition window — parallel)
    w = Window.partitionBy("_pid").orderBy("shuffle_key", id_col)
    return (
        with_pid.join(F.broadcast(off_df), on="_pid")
        .withColumn("position", F.col("_off") + F.row_number().over(w) - 1)
        .drop("_pid", "_off")
    )


def curriculum_order(
    df: DataFrame,
    bucket_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Curriculum training order: easy buckets first, deterministic
    shuffle WITHIN each bucket — the Bengio et al. curriculum recipe
    as a data-pipeline artifact (each sample's exact global position,
    the unit a sharded loader consumes). Sort key = (bucket asc,
    md5(seed:id), id): bucket boundaries are curriculum stages, the
    md5 key de-correlates order within a stage run-to-run-reproducibly.

    Positions use `training_shuffle`'s two-phase discipline — a
    global row_number would collapse to ONE reducer; instead
    range-repartition on the COMPOSITE key (partitions tile the
    (bucket, key) space in order), O(partitions) driver offsets, and
    a per-partition local rank. No global window at any corpus size.

    Output: all input columns + curriculum_key + position (0-based)."""
    from pyspark.sql import Window

    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    keyed = df.withColumn("curriculum_key", key).repartitionByRange(
        n_parts, F.col(bucket_col), F.col("curriculum_key")
    )
    # pin the range partitioning across the offsets action and the
    # output action (the r13 two-phase determinism rule)
    with_pid = keyed.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    counts = {
        r._pid: r.n
        for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(bucket_col, "curriculum_key", id_col)
    return (
        with_pid.join(F.broadcast(off_df), on="_pid")
        .withColumn("position", F.col("_off") + F.row_number().over(w) - 1)
        .drop("_pid", "_off")
    )


def unimax_allocate(
    df: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a total training-token budget UNIFORMLY
    across domains, except that no domain may repeat more than
    ``max_epochs`` times — small domains get capped at
    cap_d = n_d * max_epochs and their unused share waterfalls to the
    larger ones. The principled alternative to temperature mixing
    (`token_budget_sample`): temperature still over-samples the very
    largest domains; UniMax gives every uncapped domain the SAME
    token count.

    Closed form, no iteration: with caps sorted ascending, domain k is
    CAPPED iff cap_k * (remaining after paying all smaller caps,
    spread over the domains from k up) exceeds its cap — i.e.
    cap_k * (n - k + 1) <= budget - prefix_caps_{k-1}; every capped
    domain gets its cap, every uncapped one gets an equal integer
    share of what's left (floor division; the remainder r goes one
    token each to the r lexicographically-smallest uncapped domains —
    a pinned deterministic tie rule, so allocations sum EXACTLY to
    min(budget, total capacity)).

    All integer arithmetic over exact token counts — replayed
    bit-for-bit in SQL. The ranking window is single-partition but
    bounded by the DOMAIN count (tens, not rows — the stated contract
    of every per-domain step in this module).

    Output: (domain, n_tokens, cap_tokens, alloc_tokens, capped).
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be non-negative")
    if max_epochs < 1:
        raise ValueError("max_epochs must be positive")
    toks = df.select(
        F.col(domain_col).alias("domain"),
        F.size(
            F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
        ).cast("long").alias("_nt"),
    )
    dom = toks.groupBy("domain").agg(F.sum("_nt").alias("n_tokens"))
    dom = dom.withColumn("cap_tokens", F.col("n_tokens") * max_epochs)
    w = Window.orderBy(F.col("cap_tokens").asc(), F.col("domain").asc())
    ranked = (
        dom.withColumn("_k", F.row_number().over(w))
        .withColumn("_pfx", F.coalesce(
            F.sum("cap_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ))
        .withColumn("_n", F.count(F.lit(1)).over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )))
    )
    b = F.lit(int(budget_tokens))
    capped = (F.col("cap_tokens") * (F.col("_n") - F.col("_k") + 1)) <= (b - F.col("_pfx"))
    ranked = ranked.withColumn("capped", capped)
    # what the capped domains consume, and how many domains share the rest
    paid = ranked.filter(F.col("capped")).agg(
        F.coalesce(F.sum("cap_tokens"), F.lit(0)).alias("_paid"),
        F.count(F.lit(1)).alias("_ncap"),
    )
    ranked = ranked.crossJoin(F.broadcast(paid))
    # uncapped domains, ranked among themselves by (cap, domain): the
    # floor-division remainder tops up the first `rest % n_unc` of them
    wu = Window.partitionBy("capped").orderBy(F.col("cap_tokens").asc(), F.col("domain").asc())
    ranked = ranked.withColumn("_uk", F.row_number().over(wu))
    alloc = F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
        F.expr(f"({int(budget_tokens)} - _paid) div greatest(_n - _ncap, 1)")
        + F.when(
            F.col("_uk") <= F.expr(f"({int(budget_tokens)} - _paid) % greatest(_n - _ncap, 1)"),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    return ranked.select(
        "domain",
        "n_tokens",
        "cap_tokens",
        alloc.cast("long").alias("alloc_tokens"),
        "capped",
    )
