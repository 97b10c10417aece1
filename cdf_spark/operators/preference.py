"""Pairwise-preference strength fitting: Bradley-Terry by integer
fixed-point minorization-maximization.

The preference-aggregation primitive behind RLHF reward modeling,
LLM-judge leaderboards (Chatbot-Arena-style Elo tables are BT fits),
and ranked-choice data curation ("which of these two responses is
better" at corpus scale). Given pairwise win/match counts, the
Bradley-Terry model P(i beats j) = p_i / (p_i + p_j) is fit by
Hunter's (2004) MM iteration:

    p_i' = w_i / sum_j n_ij / (p_i + p_j)

Determinism discipline (the PageRank/BPE rule — iterative algorithms
earn EXACT oracles by making every per-iteration quantity an
integer): strengths are micro-units; each pair term is ONE floor
division (n_ij * 1e12) DIV (P_i + P_j) — pre-scaled so the floor
keeps ~6 significant digits; the per-player denominator is an exact
integer sum (order/partition-immune); the update and the sum-
normalization (total mass pinned to n_players * 1e6 each round —
BT is scale-invariant, pinning kills drift) are again single floor
divisions. A DuckDB oracle unrolls the whole fit bit-for-bit.

Scale posture (billions of comparisons, millions of players):
- matches reduce FIRST: per-(i, j) counts are a map-side-combinable
  aggregation of the raw duel stream — iterations never touch raw
  comparisons, only the O(distinct pairs) count table (checkpointed
  once).
- per iteration: the count table joins the O(players) strength table
  on each side (same keys every round) and reduces per player —
  map-side combinable; per-round localCheckpoint truncates lineage;
  the normalization total is a 1-row bounded collect.
- No Python in the loop: every expression is a JVM-side built-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..plans.checkpoint import release_local_checkpoint

MICRO = 1_000_000


def bradley_terry_strengths(
    duels: DataFrame,
    iterations: int = 5,
    i_col: str = "i",
    j_col: str = "j",
    win_col: str = "win",
) -> DataFrame:
    """Fit Bradley-Terry strengths from a duel stream.

    ``duels`` has one row per DIRECTED observation: (i, j, win) with
    win=1 when i beat j, 0 when i lost (ties are the caller's choice
    to exclude or double-count; this operator takes the stream as
    given). Both directions of a match may be present or the caller
    may emit only one — counts are symmetrized internally.

    Returns (id, strength_unat): micro-unit strengths normalized to
    total n_players * 1e6. Players with zero wins converge to 0 —
    the MM fixed point — rather than erroring.
    """
    if iterations < 1:
        raise ValueError("bradley_terry needs at least one iteration")
    d = duels.select(
        F.col(i_col).alias("_i"), F.col(j_col).alias("_j"), F.col(win_col).cast("long").alias("_w")
    )
    # symmetrize: every observation contributes to both endpoints'
    # match counts, and a win for i is a loss for j
    both = d.unionAll(
        d.select(F.col("_j").alias("_i"), F.col("_i").alias("_j"), (F.lit(1) - F.col("_w")).alias("_w"))
    )
    # the headroom bound RIDES the nij pin as an observed metric (r14,
    # the §9.3 observe-on-checkpoint pattern) — the separate max() agg
    # was one more job over the just-pinned pair table
    obs_nij = Observation()
    nij = (
        both.groupBy("_i", "_j")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_w").alias("wij"))
        .observe(obs_nij, F.max("n").alias("mx"))
        .localCheckpoint(eager=True)
    )
    # int64 headroom, stated and ENFORCED (ANSI mode would raise loudly
    # mid-fit anyway; this refuses up front with the actual bound): the
    # pair term is n_ij * 1e12, so a directed pair may carry at most
    # ~9.22e6 matches before the product leaves long range. Billions of
    # COMPARISONS are fine — the bound is per distinct (i, j) pair.
    max_n = obs_nij.get["mx"]
    if max_n is not None and int(max_n) > 9_200_000:
        raise ValueError(
            f"a directed pair carries {max_n} matches; the integer MM "
            "update (n_ij * 1e12) is exact only to 9.2e6 matches per "
            "pair — pre-aggregate duels (e.g. per epoch) or shard pairs"
        )
    # One aggregation serves both the win totals AND the player set
    # (every player appears as _i after symmetrization, zero-win
    # players included with w = 0) — the separate players distinct
    # paid its own shuffle + checkpoint for the same key set (r14,
    # guide §2.4). wins is checkpointed because every MM round joins
    # it; left lazy each round re-aggregated the pair table.
    obs_w = Observation()
    wins = (
        nij.groupBy(F.col("_i").alias("id"))
        .agg(F.sum("wij").alias("w"))
        .observe(obs_w, F.count(F.lit(1)).alias("np"))
        .localCheckpoint(eager=True)
    )
    n_players = int(obs_w.get["np"])
    if n_players == 0:
        raise ValueError("duel stream is empty")
    # normalization headroom: praw <= w * 1e12 / d and the re-pin
    # multiplies by n_players * 1e6 — enforced implicitly by ANSI long
    # arithmetic (raises, never wraps); the up-front guard above bounds
    # the dominant term.
    players = wins.select("id")

    # The strength/win tables are O(players) rows of (key, long) —
    # KB-to-MB scale for any leaderboard that fits the integer model —
    # while the pair table is O(distinct pairs). Joining them as
    # SortMergeJoin would re-sort the big pair table TWICE per MM
    # round; below the broadcast gate we hint the small side instead
    # (two broadcast joins, zero pair-table shuffles per round). Past
    # the gate (multi-million players) SMJ is the right plan and the
    # hint must not force an executor-memory blowup.
    bcast = n_players <= 2_000_000
    hint = F.broadcast if bcast else (lambda df: df)

    # MM round shape (r15, guide §1.2/§2.4 — the PageRank round
    # discipline applied to the MM update):
    # - The win totals no longer join the per-player denominators:
    #   `wins` contributes zero-term BASE rows to the same groupBy(_i)
    #   exchange the pair terms reduce through, and max(w) recovers
    #   the per-player total (pair rows carry w = 0, w >= 0, and every
    #   player has exactly one base row) — one broadcast build + one
    #   join less per round, identical integer sums.
    # - The normalization total is a SCALAR of the raw table being
    #   checkpointed anyway, so it rides that job as an observed
    #   metric and enters the next round's projection as a literal —
    #   the former in-plan 1-row aggregate + crossJoin broadcast
    #   subtree is gone. Same floor division; an all-zero collapse
    #   (unreachable for non-empty streams) still surfaces as ANSI
    #   division by zero, now at the literal.
    wbase = wins.select(
        F.col("id").alias("_i"), F.lit(0).cast("long").alias("_t"), F.col("w")
    )
    # per-round Column expressions hoisted out of the loop (r15, the
    # graph-loop discipline): Columns are immutable, reuse is
    # plan-identical and saves the per-round py4j round-trips; the
    # only per-round value is the observed normalization total
    e_pi = [F.col("id").alias("_i"), F.col("p").alias("_pi")]
    e_pj = [F.col("id").alias("_j"), F.col("p").alias("_pj")]
    e_pair = [
        F.col("_i"),
        F.expr("(n * 1000000000000) div greatest(_pi + _pj, 1)").alias("_t"),
        F.lit(0).cast("long").alias("w"),
    ]
    e_agg = [F.sum("_t").alias("d"), F.max("w").alias("w")]
    e_raw = [
        F.col("_i").alias("id"),
        F.expr("(w * 1000000000000) div greatest(d, 1)").alias("praw"),
    ]
    e_obs = F.coalesce(F.sum("praw"), F.lit(0)).alias("_tot")
    p = players.select("id", F.lit(MICRO).cast("long").alias("p"))
    # release each round's raw pin behind the frontier (r15, guide §5);
    # the final round's pin is the returned frame's whole lineage, so
    # the pair and win pins release after the loop.
    prev_pin = None
    for _ in range(iterations):
        pi = hint(p.select(*e_pi))
        pj = hint(p.select(*e_pj))
        pairs = nij.join(pi, on="_i").join(pj, on="_j").select(*e_pair)
        # Checkpoint RAW, not next-round p (r14, guide §1.2/§5): p is
        # a narrow projection consumed by both broadcast sides of the
        # next round; pinning raw runs the heavy subtree exactly once.
        obs_r = Observation()
        raw = (
            pairs.unionByName(wbase)
            .groupBy("_i")
            .agg(*e_agg)
            .select(*e_raw)
            .observe(obs_r, e_obs)
            .localCheckpoint(eager=True)
        )
        tot = int(obs_r.get["_tot"])
        if prev_pin is not None:
            release_local_checkpoint(prev_pin)
        prev_pin = raw
        p = raw.select(
            "id",
            F.expr(f"(praw * {n_players * MICRO}) div CAST({tot} AS BIGINT)").alias("p"),
        )
    release_local_checkpoint(nij)
    release_local_checkpoint(wins)
    return p.select("id", F.col("p").alias("strength_unat"))
