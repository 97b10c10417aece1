"""Iterative graph processing: integer fixed-point PageRank, uniform
and personalized.

Why this lives in a data-curation engine: web-scale pretraining
pipelines weight documents by the link-graph standing of their source
(Common Crawl publishes host-level harmonic/PageRank centrality, and
CCNet/RefinedWeb-style curation uses it as a quality prior), and
personalized PageRank — teleport restricted to a SEED set — is the
standard "expand this trusted set through the graph" primitive
(seed-site corpus expansion, curated-domain neighborhoods). The
reference's surface has no graph operators — this is the
beyond-reference generalization of its quality-scoring story, in the
same sense the NB classifier generalizes its contract rules
(reference scope: `crates/cdf-engine/src/sql_analysis.rs:297-368`
rejects even joins; graph iteration is strictly beyond it).

Determinism discipline (the house rule, shared with the LM/BM25/DSIR
micro-nat suite): every per-iteration quantity is an INTEGER —
scores are micro-units (1e6 = mass 1.0), per-edge contributions are
integer floor-divisions `score DIV outdeg`, the damping step is
`(85 * x) DIV 100`, and the dangling redistribution is
`dangling_mass DIV n_targets`. Integer sums are immune to float
summation order across partitions AND across engines, so a DuckDB
oracle can replay the whole power iteration unrolled and match
bit-for-bit. All quantities are non-negative, so Spark's `DIV`
(truncate) and DuckDB's `//` (floor) agree.

Scale posture (1B-edge graph on a 1000-executor cluster):
- The edge table is the big operand. It is joined to the score table
  on `src` once per iteration (shuffle hash join on the same key
  every round — AQE reuses the layout; at known scale the caller can
  pre-`repartition(src)` and the exchange is planned once), and the
  contribution aggregation `groupBy(dst).sum()` is map-side
  combinable, so per-iteration shuffle IO is O(edges) once, never
  O(edges x iterations) of lineage (per-round `localCheckpoint`
  truncates the plan — the suite's proven BPE/k-means pattern).
- The score/degree tables are O(nodes) — orders of magnitude smaller
  than edges; the dangling-mass read is a 1-row aggregate collect per
  iteration (a bounded driver-side step, the documented contract for
  watermark reads / CC convergence checks).
- No Python in the loop: every expression is a JVM-side built-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..plans.checkpoint import release_local_checkpoint

SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = SCALE,
    src: str = "src",
    dst: str = "dst",
    seeds: DataFrame | None = None,
    seed_col: str = "id",
) -> DataFrame:
    """Integer fixed-point PageRank over a directed edge list.

    Returns (id, score_unat) for every node (union of sources and
    destinations). ``edges`` is treated as a simple directed graph —
    callers dedup parallel edges if their model requires it.

    With ``seeds`` (one-column DataFrame of node ids), the walk is
    PERSONALIZED: initial mass, the teleport term, and the dangling
    redistribution all land only on seed nodes, so scores measure
    proximity to the seed set. Seeds that are not graph nodes are
    ignored; an empty effective seed set errors.

    Per iteration, with integer micro-unit scores s, damping d
    (default 85), seed indicator sd[v] (1 everywhere when
    unpersonalized) and n_t = number of teleport targets (all nodes,
    or the seed count):

        contrib[v]  = sum over edges u->v of  s[u] DIV outdeg[u]
        dangling    = sum of s[u] over nodes with no out-edges
        s'[v]       = sd[v] * ((100-d)*scale DIV 100)
                      + (d * (contrib[v] + sd[v]*(dangling DIV n_t))) DIV 100

    The floor divisions make the recurrence exactly reproducible in
    ANSI SQL (DuckDB `//`), which is what lets the correctness gate
    value-match an iterative algorithm — uniform AND personalized.
    """
    if iterations < 1:
        raise ValueError("pagerank needs at least one iteration")
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (1, 99)")

    # Materialize the edge list ONCE — everything else (degrees, the
    # node set, the annotated edge table, the dangling set) derives
    # from the checkpoint, so the possibly-expensive upstream build
    # (joins/distincts in the caller's lineage) runs exactly one time.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if seeds is None:
        nodes = nodes.select("id", F.lit(1).alias("_sd"))
    else:
        sd = seeds.select(F.col(seed_col).alias("id")).distinct().withColumn("_m", F.lit(1))
        nodes = nodes.join(F.broadcast(sd), "id", "left").select(
            "id", F.coalesce(F.col("_m"), F.lit(0)).alias("_sd")
        )
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    # The node table carries its iteration-invariant annotations from
    # setup (r15): the seed indicator `_sd` and the dangling flag
    # `_dg` (no out-edges). The flag is what lets the per-round
    # dangling-mass aggregation ride the round's checkpoint as an
    # OBSERVED metric instead of being its own semi-join + aggregate
    # subtree in the round's plan (see the loop below).
    # All three setup scalars (node count for the broadcast gate,
    # teleport-target count, and nothing else) RIDE the nodes pin as
    # observed metrics — zero extra jobs (r14 §9.3 pattern).
    obs_n = Observation()
    nodes = (
        nodes.join(deg.select("id", F.lit(1).alias("_hd")), "id", "left")
        .select("id", "_sd", F.coalesce(F.col("_hd"), F.lit(0)).alias("_dg"))
        .withColumn("_dg", F.lit(1) - F.col("_dg"))
        .observe(
            obs_n, F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("_sd"), F.lit(0)).alias("t")
        )
        .localCheckpoint(eager=True)
    )
    n_nodes, n_t = int(obs_n.get["n"]), int(obs_n.get["t"])
    if not n_t:
        raise ValueError(
            "graph has no edges" if seeds is None else "no seed is a node of the graph"
        )
    # Edge table annotated with its source's out-degree, materialized
    # once — iterations re-join only the O(nodes) score table.
    e2 = e.join(deg, e["src"] == deg["id"]).select("src", "dst", "deg").localCheckpoint(eager=True)
    # the raw edge pin fed only the nodes/e2 setup pins — both
    # materialized, so its O(edges) blocks are dead (r15, guide §5)
    release_local_checkpoint(e)

    # Size-gated broadcast for the per-round O(nodes) operands: the
    # score table joining the O(edges) table as SortMergeJoin would
    # re-sort the EDGE table every round. Under the gate (node table
    # provably executor-memory-small: two longs/row), hint broadcast —
    # the edge join degrades to a map-side hash probe with zero edge
    # shuffles per round. Past the gate (1B-node web graphs) the SMJ /
    # shuffled-hash plan is the right one and the hint must not force
    # an OOM, so it is withheld.
    hint = F.broadcast if n_nodes <= 2_000_000 else (lambda df: df)

    teleport = ((100 - damping_pct) * scale) // 100
    scores = nodes.select(
        "id", "_sd", "_dg", (F.lit(scale) * F.col("_sd")).cast("long").alias("s")
    )
    # Round shape (r15, guide §1.2/§2.4 — measured 52 jobs / 69 stages
    # down to ~24 / ~35 at sf0.1):
    # - The dangling mass is a SCALAR of the incoming score table, so
    #   it rides the round's own checkpoint job as an observed metric
    #   (the §9.3 pattern) and enters the next round's expression as a
    #   literal — the former in-plan semi-join + aggregate + crossJoin
    #   broadcast subtree (one exchange + two broadcast builds per
    #   round) is gone. Same integer sum, same floor division.
    # - The per-node update folds into the contribution aggregation:
    #   instead of groupBy(dst) followed by a second `nodes ⋈ contrib`
    #   left join (another broadcast build + join per round), the node
    #   table contributes zero-valued BASE rows to the same exchange
    #   and the join becomes part of the aggregate — every node has
    #   exactly one base row, so max(_sd)/max(_dg) recover the node
    #   annotations and sum(_c) over {edge contributions + 0} is the
    #   identical integer contribution sum (left-join semantics
    #   preserved: a node with no in-edges aggregates its base row
    #   alone to contrib 0).
    # per-round Column expressions hoisted out of the loop (r15): the
    # only per-round value is the observed dangling mass, which enters
    # as a literal in the update expression
    e_obs = F.coalesce(F.sum(F.col("s") * F.col("_dg")), F.lit(0)).cast("long").alias("dang")
    e_contrib = [
        F.col("dst"),
        F.expr("s div deg").alias("_c"),
        F.lit(0).alias("_sd"),
        F.lit(0).alias("_dg"),
    ]
    e_base = [F.col("id").alias("dst"), F.lit(0).cast("long").alias("_c"), F.col("_sd"), F.col("_dg")]
    e_agg = [
        F.sum("_c").alias("contrib"),
        F.max("_sd").alias("_sd"),
        F.max("_dg").alias("_dg"),
    ]
    # release each round's pin once the NEXT round's pin is
    # materialized (the checkpoint.py frontier rule, r15 guide §5
    # "unpersist when done"): a 5-iteration run otherwise holds 5 full
    # score-table copies in executor storage for the session's life —
    # at web-graph scale that is 5x the working set leaked per call.
    prev_pin = None
    for _ in range(iterations):
        obs_r = Observation()
        scores = scores.observe(obs_r, e_obs).localCheckpoint(eager=True)
        dang = int(obs_r.get["dang"])
        if prev_pin is not None:
            release_local_checkpoint(prev_pin)
        prev_pin = scores
        contribs = e2.join(hint(scores), e2["src"] == scores["id"]).select(*e_contrib)
        base = nodes.select(*e_base)
        scores = (
            contribs.unionByName(base)
            .groupBy("dst")
            .agg(*e_agg)
            .select(
                F.col("dst").alias("id"),
                "_sd",
                "_dg",
                (
                    F.col("_sd") * F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (contrib"
                        f" + _sd * (CAST({dang} AS BIGINT) div {int(n_t)}))) div 100"
                    )
                ).cast("long").alias("s"),
            )
        )
    return scores.select("id", F.col("s").alias("score_unat"))


def pagerank_topk(
    edges: DataFrame,
    k: int = 50,
    iterations: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    seeds: DataFrame | None = None,
    seed_col: str = "id",
) -> DataFrame:
    """Top-k nodes by (optionally personalized) PageRank with a
    deterministic row-number ranking (ties broken by ascending id, so
    equal scores get distinct consecutive ranks — not dense_rank).

    The cut is orderBy+limit (TakeOrderedAndProject — a per-partition
    top-k merge, never a global sort materialization); the rank column
    is computed over the k survivors only, so the single-partition
    window is bounded by k, not by the node count.
    """
    scores = pagerank(
        edges,
        iterations=iterations,
        damping_pct=damping_pct,
        src=src,
        dst=dst,
        seeds=seeds,
        seed_col=seed_col,
    )
    from pyspark.sql.window import Window

    top = scores.orderBy(F.col("score_unat").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("score_unat").desc(), F.col("id").asc())
    return top.select("id", "score_unat", F.row_number().over(w).alias("rank"))


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Connected components of the UNDIRECTED view of an edge list,
    via min-label propagation: every node starts labeled with its own
    id; each round a node takes the minimum of its label and its
    neighbors' labels; at fixpoint each component is labeled by its
    minimum node id. Converges in diameter(G) rounds — the driver
    stops at the first round that changes no label (the changed-count
    rides the round's checkpoint job as an observed metric; the
    same algorithm the near-dup clusterer runs on its candidate
    graph, exposed here as a first-class graph operator).

    Deterministic by construction (MIN is order/partition-immune), so
    a SQL oracle unrolled past the fixture graph's diameter matches
    exactly: extra unrolled rounds are no-ops at fixpoint.

    Returns (id, component). Per round: one edge⨝label join on the
    edge key + one map-side-combinable MIN aggregation; per-round
    localCheckpoint truncates lineage. Note for 100 TB graphs: label
    propagation is O(diameter) rounds; web-scale graphs with long
    chains want the large-star/small-star contraction variant — this
    operator states its diameter-bound contract rather than hiding it.
    """
    if max_iterations < 1:
        raise ValueError("max_iterations must be positive")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).localCheckpoint(
        eager=True
    )
    labels = (
        und.select(F.col("a").alias("id")).distinct().select("id", F.col("id").alias("l"))
    ).localCheckpoint(eager=True)
    # per-round Column expressions hoisted out of the loop (r15, the
    # connected_components_star discipline): Columns are immutable, so
    # reuse is plan-identical and saves the per-round py4j round-trips
    e_cand = [F.col("b").alias("id"), F.col("l").alias("_nl")]
    e_min = F.min("_nl").alias("_m")
    e_nxt = [
        "id",
        F.least(F.col("l"), F.col("_m")).alias("l"),
        (F.col("_m") < F.col("l")).alias("_ch"),
    ]
    e_obs = F.coalesce(F.sum(F.when(F.col("_ch"), 1).otherwise(0)), F.lit(0)).alias("_c")
    # release each round's pin behind the materialization frontier
    # (r15, guide §5): the previous round's label pin is dead once the
    # new one exists; the initial `labels` pin is round 0's.
    prev_pin = labels
    for _ in range(max_iterations):
        cand = (
            und.join(labels, und["a"] == labels["id"])
            .select(*e_cand)
            .groupBy("id")
            .agg(e_min)
        )
        # the change flag rides the label row, and the changed-count
        # rides the CHECKPOINT JOB as an observed metric (r14, guide
        # §1.2/§5): the old `nxt.filter(_ch).count()` was a second
        # full job over the pinned table every round — pure per-round
        # scheduling overhead. sum(when(_ch,1)) over all rows equals
        # the filtered count exactly (null _ch, a left-join miss,
        # contributes 0 on both paths).
        obs = Observation()
        nxt = (
            labels.join(cand, "id", "left")
            .select(*e_nxt)
            .observe(obs, e_obs)
            .localCheckpoint(eager=True)
        )
        changed = obs.get["_c"]
        release_local_checkpoint(prev_pin)
        prev_pin = nxt
        labels = nxt.select("id", "l")
        if changed == 0:
            # the returned frame's lineage is the LAST pin only — the
            # undirected edge pin is no longer reachable
            release_local_checkpoint(und)
            return labels.select("id", F.col("l").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(graph diameter exceeds the bound — raise max_iterations)"
    )


def connected_components_star(
    edges: DataFrame,
    max_rounds: int = 30,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii,
    "Connected Components in MapReduce and Beyond", SoCC 2014): the
    web-scale answer to min-label propagation's O(diameter) round
    bound. A CommonCrawl host graph has chains in the millions; this
    converges in O(log^2 n) rounds (a handful in practice) with the
    SAME per-round shape — one grouped MIN + one join over the
    current edge set.

    Per round, on the undirected view of the current edge set:
    - large-star(u): every neighbor v > u is re-pointed at
      m(u) = min(N(u) ∪ {u}) — long tails collapse toward small ids;
    - small-star(u): edges directed at their larger endpoint, every
      smaller neighbor AND u itself re-pointed at min(Γ(u) ∪ {u}).
    The fixpoint is a star forest — every node carries one edge to its
    component's minimum id — detected when a round leaves the edge set
    unchanged (count + order-independent signature observed on the
    round's own checkpoint job, then CONFIRMED by an exact exceptAll).

    Deterministic by construction (MIN over ids), so a SQL oracle that
    unrolls R >= convergence rounds replays it exactly — extra rounds
    are no-ops at the fixpoint, and the operator RAISES past
    ``max_rounds`` rather than returning an uncertified labeling (the
    same loud-overflow contract `connected_components` pins to its
    oracle's unroll).

    Returns (id, component) over all endpoint nodes; nodes whose only
    edges were self-loops label themselves. Per round: two grouped
    MINs (map-side combinable) + one dedup shuffle — intermediate
    stages tolerate duplicate pairs (MIN is idempotent; the large-star
    emission dedups at the round's single `distinct`), so the
    undirected view and the large-star output skip their own shuffles.
    The O(nodes) min tables take a size-gated broadcast hint (the
    PageRank rule: map-side hash probe under the gate, SMJ above it).
    Per-round localCheckpoint truncates lineage — O(edges) shuffle per
    round, O(log n) rounds, never O(diameter).
    """
    if max_rounds < 1:
        raise ValueError("max_rounds must be positive")
    # materialize the raw edge list ONCE — the node set and the deduped
    # edge set both derive from it, and left lazy the caller's upstream
    # build (typically a join+distinct pipeline) executed twice during
    # setup (r14, guide §1.2)
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    # the node count (broadcast gate) and the initial edge signature
    # ride their setup checkpoints as OBSERVED metrics — each used to
    # be its own full job over the just-pinned table (r14, guide §1.2)
    obs_nodes = Observation()
    nodes = (
        raw.select(F.col("a").alias("id"))
        .union(raw.select(F.col("b").alias("id")))
        .distinct()
        .observe(obs_nodes, F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=True)
    )
    hint = F.broadcast if obs_nodes.get["_n"] <= 2_000_000 else (lambda df: df)
    # Convergence prefilter (r14): count equality alone is a WEAK
    # signal — a contracting graph holds its edge count for many rounds
    # while the set still changes, so the exact exceptAll set-diff (a
    # full shuffle of the edge set) ran nearly every round. The
    # order-independent XOR-of-hashes signature (valid on a DISTINCT
    # edge set; never overflows under ANSI) changes whenever the set
    # changes except with probability 2^-64, so exceptAll now runs
    # ~once, at the true fixpoint — and it still CONFIRMS: a signature
    # collision would be caught (non-empty diff -> keep iterating),
    # preserving the exact-convergence contract at any scale.
    # Per-round Column expressions hoisted out of the loop (r15):
    # PySpark Columns are immutable unresolved expressions, so reusing
    # them across rounds is plan-identical — but building them fresh
    # each round cost a py4j round-trip PER EXPRESSION, measured 2.6 s
    # of pure driver-side construction over the 14-round sf0.1 chain
    # (~0.19 s/round); hoisting cuts it to ~1.1 s (the residual is the
    # DataFrame method calls themselves).
    c_a, c_b, c_u, c_v = F.col("a"), F.col("b"), F.col("u"), F.col("v")
    e_flip = [c_b.alias("a"), c_a.alias("b")]
    e_min = F.min("b").alias("_mb")
    e_big = [c_b.alias("a"), F.least(F.col("_mb"), c_a).alias("b")]
    e_dl = [F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")]
    e_m2 = F.min("v").alias("_m")
    e_nxt = [c_v.alias("a"), F.col("_m").alias("b")]
    e_nxt2 = [c_u.alias("a"), F.col("_m").alias("b")]
    f_big = c_b > c_a
    f_dl = c_u != c_v
    f_nxt = c_a != c_b
    sig_n = F.count(F.lit(1)).alias("_n")
    sig_h = F.expr("bit_xor(xxhash64(a, b))").alias("_h")

    obs_e = Observation()
    e = (
        raw.filter(f_nxt)
        .distinct()
        .observe(obs_e, sig_n, sig_h)
        .localCheckpoint(eager=True)
    )
    _m = obs_e.get
    prev_cnt, prev_sig = _m["_n"], _m["_h"]
    # the raw edge pin fed only the nodes/e setup pins — both
    # materialized above, so its blocks are dead (r15, guide §5)
    release_local_checkpoint(raw)
    for _ in range(max_rounds):
        # duplicates from (a,b)+(b,a) pairs are harmless below: MIN
        # absorbs them and the emission dedups at nxt — no distinct here
        ue = e.unionAll(e.select(*e_flip))
        # large-star: (v, m(u)) for v ∈ N(u), v > u; m(u) ≤ u < v so no self-loops
        mins = ue.groupBy("a").agg(e_min)
        big = ue.join(hint(mins), on="a").filter(f_big).select(*e_big)
        # small-star: direct at the larger endpoint, re-point Γ(u) ∪ {u}
        dl = big.select(*e_dl).filter(f_dl)
        mins2 = dl.groupBy("u").agg(e_m2)
        # the convergence signature rides the checkpoint job as an
        # observed metric (r14): the separate `nxt.agg(*_sig)` job
        # doubled the per-round job count — with a fixed O(log² n)
        # round budget that overhead is the loop's whole local floor
        obs = Observation()
        nxt = (
            dl.join(hint(mins2), on="u")
            .select(*e_nxt)
            .unionAll(mins2.select(*e_nxt2))
            .filter(f_nxt)
            .distinct()
            .observe(obs, sig_n, sig_h)
            .localCheckpoint(eager=True)
        )
        _m = obs.get
        cnt, sig = _m["_n"], _m["_h"]
        if cnt == prev_cnt and sig == prev_sig and nxt.exceptAll(e).isEmpty():
            # prev round's pin was last read by the exceptAll above
            release_local_checkpoint(e)
            e = nxt
            break
        release_local_checkpoint(e)
        e, prev_cnt, prev_sig = nxt, cnt, sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds — raise max_rounds (O(log^2 n) expected)"
        )
    star = e.select(F.col("a").alias("id"), F.col("b").alias("_c"))
    return nodes.join(star, on="id", how="left").select(
        "id", F.coalesce(F.col("_c"), F.col("id")).alias("component")
    )
