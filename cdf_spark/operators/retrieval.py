"""Full-text retrieval: BM25 scoring and a persisted incremental
inverted index.

The retrieval member of this suite's training-data toolchain: corpus
curation pipelines retrieve over their own corpus constantly —
benchmark-contamination forensics ("which documents would answer this
eval question"), RAG evaluation sets, targeted quality audits, and
retrieval-based dedup all reduce to "top-k documents for a query" at
corpus scale. The reference's query surface is declarative predicates
(`crates/cdf-kernel/src/expr`); ranked retrieval is the beyond-ref
generalization its curation story needs, in the same sense the NB
classifier generalizes its contract rules.

Scoring is Okapi BM25 (Robertson & Spärck Jones; the Lucene
`ln(1 + (N - df + 0.5)/(df + 0.5))` non-negative idf form) with the
standard k1=1.2, b=0.75. The constants are FIXED: they appear as
identical numeric literals in the Spark expression and the DuckDB
oracle, which is what keeps the double arithmetic bit-identical
across engines (a configurable k1 recomputed as `k1 + 1.0` on one
side and written `2.2` on the other would differ in the last ulp).

Determinism discipline (the house rule): the per-(query, term, doc)
partial score is ONE double expression over exact integer inputs
(tf, dl, df, N — identical operand order on both engines), scaled to
integer MICRO-UNITS (round(score * 1e6) AS BIGINT) at the leaf; the
per-(query, doc) sum is exact integer arithmetic, immune to float
summation order across partitions/engines; ranking compares integers
with doc-id tie-breaks. BM25 partials are non-negative, so Spark's
HALF_UP round and DuckDB's half-away-from-zero agree.

Scale posture (100 TB corpus):
- one-shot `bm25_topk`: tokenize+explode is narrow; ONE
  map-side-combinable groupBy builds the (doc, term, tf, dl) table
  (dl rides the grouping key — no corpus-sized lengths join); query
  terms and their document frequencies BROADCAST (a query set is
  bounded by definition); per-(query, doc) aggregation is the only
  other shuffle.
- `InvertedIndex`: the growing-corpus form. Postings parts are
  append-only (a doc's (tok, tf, dl) rows are immutable — BM25
  sufficient statistics are pure counts, so folds are exact and the
  folded index answers bit-identically to a one-shot scoring run);
  each part is hash-bucketed by term (`hb = hash64(tok) % 16`,
  hive-partitioned) so a probe reads only the buckets its query
  terms hash to — O(postings of the query terms), never O(index).
  Corpus-level stats (N, total token count) fold as two integers in
  the meta, so idf/avgdl need no corpus pass at query time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from ..plans.checkpoint import observed_get
from .index_base import IndexArtifact
from .text import hash64, hash64_py, spread_compute

MICRO = 1_000_000.0
_BUCKETS = 16


def _tok_array(col: Column) -> Column:
    """The suite's shared lowercase [a-z0-9]+ token stream (same
    stream the NB classifier / LM / BPE / DSIR stages see)."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != "")


def _doc_tf(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(_id, dl, tok, tf, ps): per-document term frequencies with the
    document length riding the grouping key — dl is functionally
    dependent on _id, so grouping by (_id, dl, tok) costs nothing
    extra and saves the corpus-sized lengths join at scoring time.
    `ps` is the SORTED 1-based position list of the term (sorted so
    the posting is deterministic under Spark's unordered
    collect_list) — the positional payload phrase matching needs."""
    return (
        df.select(F.col(id_col).alias("_id"), _tok_array(F.col(text_col)).alias("_ts"))
        .select(
            "_id",
            F.size("_ts").alias("dl"),
            F.posexplode("_ts").alias("_p0", "tok"),
        )
        .groupBy("_id", "dl", "tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list(F.col("_p0") + 1)).alias("ps"),
        )
    )


def _pinned_tf_stats(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, int, float]:
    """ONE corpus tokenize for BM25: the positions-free (_id, dl, tok,
    tf) table eagerly pinned, with the corpus stats (N, Σdl) riding
    the pin job as OBSERVED metrics over the pre-explode projection —
    zero-token documents count toward N/avgdl exactly as the former
    separate lens pass counted them (r13 PRF shape, shared with
    `bm25_topk` in r15: its lens pass was a second full corpus
    tokenize just to learn two integers — guide §1.2, the r14 §9.3
    observe-on-checkpoint pattern).

    Returns (tf, n_docs, avgdl)."""
    obs = Observation()
    toks = df.select(
        F.col(id_col).alias("_id"), _tok_array(F.col(text_col)).alias("_ts")
    ).observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size("_ts")), F.lit(0)).alias("total"),
    )
    tf = (
        toks.select("_id", F.size("_ts").alias("dl"), F.explode("_ts").alias("tok"))
        .groupBy("_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    stats = observed_get(obs)
    n_docs, total = int(stats["n_docs"]), int(stats["total"])
    return tf, n_docs, total / n_docs


def _bm25_partial_unat(n_docs: int, avgdl: float) -> Column:
    """The per-(query term, doc) BM25 partial in integer micro-units.
    Expects columns tf (BIGINT), dl (BIGINT), df (BIGINT). Operand
    order mirrors the oracle SQL token for token:
    round(ln(1.0 + (N - df + 0.5) / (df + 0.5))
          * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
          * 1000000.0) — every float op is IEEE-identical given the
    same operand order, ln parity is the suite's proven micro-nat
    discipline, and the result is non-negative so both engines' round
    modes agree."""
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(float(avgdl)))
    return F.round(idf * (F.col("tf") * F.lit(2.2)) / denom * F.lit(MICRO)).cast("long")


def _query_terms(queries: DataFrame, qid_col: str, qtext_col: str) -> DataFrame:
    """(qid, tok) — DISTINCT query terms per query (standard bag-of-
    words BM25 ignores query-side term repetition)."""
    return (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.explode(F.array_distinct(_tok_array(F.col(qtext_col)))).alias("tok"),
        )
        .distinct()
    )


def _score_topk(
    tf: DataFrame,
    qterms: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    id_col: str,
) -> DataFrame:
    """Shared scoring tail: df per query term from the (pre-filtered)
    tf rows, broadcast both small sides, integer partial sums per
    (query, doc), per-query top-k. The window partitions by qid —
    bounded query-set cardinality, ranking only docs that matched at
    least one term.

    Measured non-optimization, banked (r12, amended r14): eagerly
    checkpointing the ≤|query terms|-row df table measures ~30%
    SLOWER at sf0.1 — the checkpoint adds a separate eager job, and
    an eager tf checkpoint inside this shared tail double-pins when
    the caller (PRF) already checkpoints its tf. The r14 fix is
    structural instead: df rides a window over the matched rows, so
    the tf subtree has exactly one consumer and no pin is needed."""
    matched = tf.join(F.broadcast(qterms.select("tok").distinct()), on="tok")
    # df per term as a WINDOW over matched rather than a groupBy +
    # broadcast-join of the same subtree (r14, guide §2.4): the agg
    # form made `matched` — whose lineage is the corpus-scale tf
    # build — a two-consumer subtree, and under AQE the exchange is
    # NOT reused across the branches (the before-plan shows the
    # tokenize+tf pipeline twice). The window shuffles only the
    # matched rows (postings of the query terms — query-set-bounded,
    # never corpus-scale) and the tf pipeline now appears exactly
    # once in the plan. Value-identical: count over the tok partition
    # IS the per-term document frequency the agg computed.
    with_df = matched.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
    )
    scored = (
        with_df.join(F.broadcast(qterms), on="tok")
        .select("qid", "_id", _bm25_partial_unat(n_docs, avgdl).alias("_s"))
        .groupBy("qid", "_id")
        .agg(F.sum("_s").alias("score_unat"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score_unat").desc(), F.col("_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("_id").alias(id_col), "score_unat", "rk")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """One-shot BM25 top-k: rank every document against every query,
    return (qid, id_col, score_unat, rk) for the k best per query
    (ties break by doc id asc; docs matching no query term never
    appear — stated contract).

    2 shuffles at any corpus size (the tf groupBy and the per-
    (query, doc) sum); both model-side tables broadcast. A growing
    corpus should use `InvertedIndex` — this recomputes tf from
    scratch per call.

    r15: the corpus is tokenized ONCE — the tf table is eagerly
    pinned with the stats riding the pin job as observed metrics
    (`_pinned_tf_stats`); the former shape paid a second full corpus
    tokenize (a separate `lens` stats job) just to learn N and Σdl,
    and the AQE-final plan re-derived nothing but still scanned the
    corpus once per pass (guide §1.2)."""
    # tokenization runs in the scan stage — spread a single-split
    # corpus so the tf build fans out (r14, guide §2.5; no-op at real
    # scale)
    docs = spread_compute(docs)
    tf, n_docs, avgdl = _pinned_tf_stats(docs, text_col, id_col)
    return _score_topk(tf, _query_terms(queries, qid_col, qtext_col), n_docs, avgdl, k, id_col)


class InvertedIndex(IndexArtifact):
    """Persisted INCREMENTAL inverted index for BM25 retrieval over a
    GROWING corpus — the retrieval member of the incremental-index
    family (`NBIndex`, `curation.LMIndex`, `curation.ExactSubstrIndex`,
    `dedup_approx.MinHashLSHIndex`, `similarity.IVFIndex`):
    `bm25_topk` re-tokenizes the whole corpus per call, the wrong
    shape under continuous ingestion.

    Layout under `root/`:
    - `postings_p<N>/hb=<b>/` parquet (tok, doc_id, tf, dl) —
      append-only, one dir per committed fold, hive-partitioned on
      `hb = hash64(tok) % 16`; never rewritten. A doc's postings are
      immutable and live in exactly one part (doc ids are new to the
      index per fold — the fixture contract this family shares), so
      the fully-folded index is bit-identical to a one-shot build:
      BM25 sufficient statistics (tf, dl, df, N, Σdl) are pure counts.
    - `meta.json` {parts, n_docs, total_len, last_epoch} — atomic
      tmp+rename swap AFTER the postings write (crash leaves the
      previous index live; at most one unlisted dir, overwritten by
      the retried fold and swept on the next successful one).

    add() cost: O(batch) tokenize + one groupBy + one part write; no
    existing posting is read. query() reads ONLY the hb buckets the
    query terms hash to (hive partition pruning across every part)
    and pushes the term filter into the scan — O(postings of the
    query terms) at any index size. `epoch` is the same at-least-once
    replay fence the family uses (postings re-appends are not
    idempotent)."""

    def build(
        self,
        spark,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch: int | None = None,
    ) -> dict:
        """Seed the index with its first fold. Unlike IVFIndex there
        is no frozen model to derive — BM25 stats fold exactly from
        nothing — so build() is init + add()."""
        if self._meta() is not None:
            raise ValueError("InvertedIndex already built — use add()")
        self._swap_meta({"parts": [], "n_docs": 0, "total_len": 0, "last_epoch": -1})
        return self.add(spark, batch, text_col=text_col, id_col=id_col, epoch=epoch)

    def add(
        self,
        spark,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch: int | None = None,
    ) -> dict:
        """Fold a batch: tokenize ONLY these rows, commit their
        postings as a new bucket-partitioned part, fold the two
        corpus counters. Ids must be new to the index; replays are
        fenced by `epoch`."""
        meta = self._meta()
        if meta is None:
            raise ValueError("InvertedIndex is empty — build() first")
        if epoch is not None and int(epoch) <= meta.get("last_epoch", -1):
            return meta  # replayed fold — already appended
        seq = int(meta.get("seq", len(meta["parts"])))
        # per-fold LENGTHS sidecar (doc_id, dl) — one row per batch doc
        # INCLUDING zero-token docs (they carry dl=0 but count toward
        # N). This is what lets delete() adjust the corpus counters
        # exactly without scanning postings: a deleted doc's dl is a
        # point lookup here. Written FIRST so its stats gate the
        # postings write: a zero-ROW partitioned parquet write leaves
        # only _SUCCESS (unreadable on the probe path — verified), so
        # an all-zero-token batch folds its lengths and counters but
        # commits NO postings part, and an empty batch is a fenced
        # no-op that only advances the epoch watermark.
        lpart = f"lengths_p{seq}"
        lens = batch.select(
            F.col(id_col).alias("doc_id"),
            F.size(_tok_array(F.col(text_col))).alias("dl"),
        )
        lens.write.mode("overwrite").parquet(str(self.root / lpart))
        n_b, tot_b = self._read_parts(spark, [lpart], meta.get("schema_lens")).agg(
            F.count(F.lit(1)), F.coalesce(F.sum("dl"), F.lit(0))
        ).collect()[0]
        tombs = meta.get("tombstones", [])
        if not n_b:
            new_meta = {
                **meta,
                "schema_lens": meta.get("schema_lens", self._schema_json(lens)),
                "tombstones": tombs,
                "tseq": int(meta.get("tseq", len(tombs))),
                "seq": seq,
                "last_epoch": int(epoch) if epoch is not None else meta.get("last_epoch", -1),
            }
            self._swap_meta(new_meta)
            self._sweep(new_meta)  # the empty lengths dir is unlisted -> swept
            return new_meta
        parts = meta["parts"]
        if int(tot_b) > 0:
            tf = _doc_tf(batch, text_col, id_col).select(
                (hash64(F.col("tok")) % _BUCKETS).alias("hb"),
                "tok",
                F.col("_id").alias("doc_id"),
                "tf",
                "dl",
                "ps",
            )
            part = f"postings_p{seq}"
            tf.write.mode("overwrite").partitionBy("hb").parquet(str(self.root / part))
            parts = parts + [part]
            if "schema_posts" not in meta:
                # one inference read at WRITE time records the hive-
                # partitioned read-back schema (hb lands last); probes
                # then never pay the per-part inference job
                meta["schema_posts"] = spark.read.parquet(
                    str(self.root / part)
                ).schema.json()
        new_meta = {
            **self._carry_schemas(meta),
            "schema_lens": meta.get("schema_lens", self._schema_json(lens)),
            "parts": parts,
            "lparts": meta.get("lparts", []) + [lpart],
            "seq": seq + 1,
            "tombstones": tombs,
            "tseq": int(meta.get("tseq", len(tombs))),
            "n_docs": int(meta["n_docs"]) + int(n_b),
            "total_len": int(meta["total_len"]) + int(tot_b),
            "last_epoch": int(epoch) if epoch is not None else meta.get("last_epoch", -1),
        }
        self._swap_meta(new_meta)
        self._sweep(new_meta)
        return new_meta

    def _sweep(self, meta: dict) -> None:
        """Drop postings/lengths/tombstone dirs the live meta no
        longer lists: crash-orphans and dirs a previous compact()
        retired — retired dirs survive exactly one further mutation
        (the keep-live-minus-one discipline: a reader holding the
        pre-compact meta may still be scanning them)."""
        import shutil

        keep = (
            set(meta["parts"])
            | set(meta.get("lparts", []))
            | set(meta.get("tombstones", []))
            | set(meta.get("retired", []))
        )
        for d in self.root.iterdir():
            if not d.is_dir():
                continue
            if (
                d.name.startswith("postings_p")
                or d.name.startswith("lengths_p")
                or d.name.startswith("tombstones_t")
            ) and d.name not in keep:
                shutil.rmtree(d, ignore_errors=True)

    def _read_dead(self, spark, meta: dict):
        tombs = meta.get("tombstones", [])
        if not tombs:
            return None
        return self._read_parts(spark, tombs, meta.get("schema_tomb")).select("doc_id")

    def delete(
        self,
        spark,
        ids: DataFrame,
        id_col: str = "doc_id",
        epoch: int | None = None,
    ) -> dict:
        """Delete documents by id: their postings leave every probe
        and — unlike a vector index — the CORPUS STATISTICS shift too
        (df, N, avgdl are all live-set quantities in BM25), so a
        probe after a delete must equal a one-shot build over only
        the live docs. df re-derives from live postings at probe time
        (the tombstone anti-join runs before the df count); N and
        Σdl adjust here by point-looking the deleted ids up in the
        lengths sidecars — O(lengths ∩ batch), never a postings scan.
        Already-deleted and never-ingested ids contribute nothing
        (the tombstone part stores only NEWLY-dead ids, so counters
        can never double-subtract). Same monotone `epoch` fence as
        add()."""
        meta = self._meta()
        if meta is None:
            raise ValueError("InvertedIndex is empty — build() first")
        if epoch is not None and int(epoch) <= meta.get("last_epoch", -1):
            return meta  # replayed delete — already tombstoned
        new_dead = ids.select(F.col(id_col).alias("doc_id")).distinct()
        dead0 = self._read_dead(spark, meta)
        if dead0 is not None:
            new_dead = new_dead.join(dead0, on="doc_id", how="left_anti")
        lens = self._read_parts(spark, meta.get("lparts", []), meta.get("schema_lens"))
        gone = lens.join(new_dead, on="doc_id", how="left_semi")
        n_g, tot_g = gone.agg(
            F.count(F.lit(1)), F.coalesce(F.sum("dl"), F.lit(0))
        ).collect()[0]
        tombs = meta.get("tombstones", [])
        part = f"tombstones_t{int(meta.get('tseq', len(tombs)))}"
        # persist only ids that exist in the index (counter parity:
        # the tombstone set and the counter adjustment cover exactly
        # the same rows)
        gone.select("doc_id").write.mode("overwrite").parquet(str(self.root / part))
        new_meta = {
            **self._carry_schemas(meta),
            "schema_tomb": self._schema_json(gone.select("doc_id")),
            "parts": meta["parts"],
            "lparts": meta.get("lparts", []),
            "seq": int(meta.get("seq", len(meta["parts"]))),
            "tombstones": tombs + [part],
            "tseq": int(meta.get("tseq", len(tombs))) + 1,
            "n_docs": int(meta["n_docs"]) - int(n_g),
            "total_len": int(meta["total_len"]) - int(tot_g),
            "last_epoch": int(epoch) if epoch is not None else meta.get("last_epoch", -1),
        }
        self._swap_meta(new_meta)
        self._sweep(new_meta)
        return new_meta

    def compact(self, spark) -> dict:
        """Fold postings and lengths minus the tombstone set into ONE
        part each and clear the tombstones — bounds probe-side fan-in
        and the anti-join after churn. Replaced dirs are RETIRED one
        mutation (in-flight readers), then swept. Pure row-set
        rewrite: probes are bit-identical before and after."""
        from functools import reduce

        meta = self._meta()
        if meta is None or not meta["parts"]:
            raise ValueError("InvertedIndex is empty — build() first")
        seq = int(meta.get("seq", len(meta["parts"])))
        dead = self._read_dead(spark, meta)
        posts = reduce(
            DataFrame.unionByName,
            [self._read_parts(spark, [p], meta.get("schema_posts")) for p in meta["parts"]],
        )
        lens = self._read_parts(spark, meta.get("lparts", []), meta.get("schema_lens"))
        if dead is not None:
            posts = posts.join(dead, on="doc_id", how="left_anti")
            lens = lens.join(dead, on="doc_id", how="left_anti")
        part, lpart = f"postings_p{seq}", f"lengths_p{seq}"
        # a fully-tombstoned token set would write a zero-row
        # PARTITIONED part (unreadable — only _SUCCESS lands); the
        # live-adjusted meta counter already knows whether any live
        # token exists, so skip the postings write and leave parts
        # empty (query() refuses with "no postings", the honest state)
        new_parts: list[str] = []
        if int(meta["total_len"]) > 0:
            posts.select("hb", "tok", "doc_id", "tf", "dl", "ps").write.mode(
                "overwrite"
            ).partitionBy("hb").parquet(str(self.root / part))
            new_parts = [part]
        lens.write.mode("overwrite").parquet(str(self.root / lpart))
        new_meta = {
            **self._carry_schemas(meta),
            "parts": new_parts,
            "lparts": [lpart],
            "seq": seq + 1,
            "tombstones": [],
            "tseq": int(meta.get("tseq", len(meta.get("tombstones", [])))),
            "retired": meta["parts"] + meta.get("lparts", []) + meta.get("tombstones", []),
            "n_docs": int(meta["n_docs"]),
            "total_len": int(meta["total_len"]),
            "last_epoch": meta.get("last_epoch", -1),
        }
        self._swap_meta(new_meta)
        return new_meta

    def query(
        self,
        spark,
        queries: DataFrame,
        k: int = 10,
        qid_col: str = "qid",
        qtext_col: str = "qtext",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """BM25 top-k per query against everything folded so far —
        bit-identical to `bm25_topk` over the union of all folds.
        The query set is bounded by contract (it broadcasts), so
        collecting its distinct terms to plan the bucket scan is
        bounded driver state; the term list prunes hb partitions AND
        pushes an IN filter to the parquet scan."""
        meta = self._meta()
        if meta is None:
            raise ValueError("InvertedIndex is empty — build() first")
        if not meta["parts"]:
            raise ValueError("InvertedIndex has no postings")
        qterms = _query_terms(queries, qid_col, qtext_col)
        terms = [r["tok"] for r in qterms.select("tok").distinct().collect()]
        if not terms:
            raise ValueError("query set tokenizes to no terms")
        buckets = sorted({hash64_py(t) % _BUCKETS for t in terms})
        # one read per part (each part is its own hive-partitioned
        # root — a single multi-path read would see conflicting
        # structures), pruned + filtered BEFORE the union so every
        # branch scans only its touched buckets
        from functools import reduce

        parts = [
            self._read_parts(spark, [p], meta.get("schema_posts")).filter(
                F.col("hb").isin(buckets) & F.col("tok").isin(terms)
            )
            for p in meta["parts"]
        ]
        posts = reduce(DataFrame.unionByName, parts)
        # tombstoned docs leave BEFORE the df count — df, like N and
        # avgdl (already live-adjusted in the meta), is a live-set
        # quantity in BM25
        dead = self._read_dead(spark, meta)
        if dead is not None:
            posts = posts.join(dead, on="doc_id", how="left_anti")
        tf = posts.select("tok", F.col("doc_id").alias("_id"), "tf", "dl")
        if int(meta["n_docs"]) <= 0:
            raise ValueError("InvertedIndex has no live documents (all deleted)")
        avgdl = meta["total_len"] / meta["n_docs"]
        return _score_topk(tf, qterms, int(meta["n_docs"]), avgdl, k, id_col)

    def phrase_query(
        self,
        spark,
        phrases: DataFrame,
        qid_col: str = "qid",
        qtext_col: str = "qtext",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Exact phrase matching against everything folded so far —
        bit-identical to `phrase_match` over the union of live folds.
        The postings carry sorted position lists, so the probe is the
        same bucket-pruned scan BM25 pays (only the buckets the
        phrase's terms hash to), followed by the adjusted-position
        join — O(postings of the phrase terms) at any index size."""
        from functools import reduce

        meta = self._meta()
        if meta is None:
            raise ValueError("InvertedIndex is empty — build() first")
        if not meta["parts"]:
            raise ValueError("InvertedIndex has no postings")
        pterms = _phrase_terms(phrases, qid_col, qtext_col)
        terms = [r["tok"] for r in pterms.select("tok").distinct().collect()]
        if not terms:
            raise ValueError("phrase set tokenizes to no terms")
        buckets = sorted({hash64_py(t) % _BUCKETS for t in terms})
        parts = [
            self._read_parts(spark, [p], meta.get("schema_posts")).filter(
                F.col("hb").isin(buckets) & F.col("tok").isin(terms)
            )
            for p in meta["parts"]
        ]
        posts = reduce(DataFrame.unionByName, parts)
        dead = self._read_dead(spark, meta)
        if dead is not None:
            posts = posts.join(dead, on="doc_id", how="left_anti")
        tf = posts.select(F.col("doc_id").alias("_id"), "tok", "ps")
        return _phrase_hits(tf, pterms, id_col)


def _phrase_terms(phrases: DataFrame, qid_col: str, qtext_col: str) -> DataFrame:
    """(qid, i, tok, n) — each phrase term with its 0-based offset and
    the phrase length. Repeated terms keep their distinct offsets
    (matching 'order order' needs both)."""
    return phrases.select(
        F.col(qid_col).alias("qid"),
        F.posexplode(_tok_array(F.col(qtext_col))).alias("i", "tok"),
        F.size(_tok_array(F.col(qtext_col))).alias("n"),
    )


def _phrase_hits(tf: DataFrame, pterms: DataFrame, id_col: str) -> DataFrame:
    """Shared phrase tail over a positional tf table (_id, tok, ps):
    the classic adjusted-position join — a phrase occurrence starting
    at position p requires term i at position p+i, i.e. all n terms
    sharing the same ADJUSTED position p = pos − i. One groupBy on
    (qid, doc, adj) counting distinct offsets, then one per-(qid, doc)
    occurrence count. Both shuffles carry only rows whose terms appear
    in some phrase — never the corpus."""
    occ = (
        tf.join(F.broadcast(pterms), on="tok")
        .select("qid", "_id", "n", "i", F.explode("ps").alias("_p"))
        .select("qid", "_id", "n", "i", (F.col("_p") - F.col("i")).alias("adj"))
    )
    hits = (
        occ.groupBy("qid", "_id", "n", "adj")
        .agg(F.count_distinct("i").alias("_found"))
        .filter(F.col("_found") == F.col("n"))
    )
    return (
        hits.groupBy("qid", "_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .select("qid", F.col("_id").alias(id_col), "n_occurrences")
    )


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Exact phrase matching at token level: for each phrase, every
    document containing the EXACT consecutive token sequence, with its
    occurrence count — the contamination-forensics primitive n-gram
    hashing can't give you (hash overlap says "shares grams"; this
    says "contains the eval answer verbatim, here's how many times").
    Docs with zero occurrences never appear — stated contract.

    Output: (qid, id_col, n_occurrences)."""
    tf = _doc_tf(docs, text_col, id_col).select("_id", "tok", "ps")
    return _phrase_hits(tf, _phrase_terms(phrases, qid_col, qtext_col), id_col)


def rrf_fuse(
    legs: dict[str, DataFrame],
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    two or more ranked retrieval legs — the standard hybrid-search
    combiner (BM25 + dense ANN) every retrieval-augmented corpus
    pipeline ends with.

    Each leg is a DataFrame (qid, id, rk) — ALREADY cut to its own
    top-k, so every input here is bounded by |queries| x k rows: the
    fusion joins are broadcast-scale by construction and all the
    100 TB heavy lifting stays inside the legs (BM25's two shuffles,
    the ANN index probe). The classic fused score sum(1/(rrf_k+rank))
    is computed in integer NANO-units via floor division
    (1e9 DIV (rrf_k + rank)) so cross-leg sums are exact integers —
    order-independent across engines, same discipline as the BM25
    micro-unit scores. A document a leg did not rank contributes 0;
    its rank column reports 0 (= absent) in the output.

    Output: (qid, doc_id, rrf_unat, <leg>_rk per leg, rank), top-k
    per query by fused score, doc-id tie-break.
    """
    if len(legs) < 2:
        raise ValueError("rrf_fuse needs at least two legs")
    names = list(legs)
    joined = None
    for name, df in legs.items():
        cur = df.select("qid", "id", F.col("rk").cast("long").alias(f"{name}_rk"))
        joined = cur if joined is None else joined.join(cur, ["qid", "id"], "full_outer")
    score = None
    for name in names:
        part = F.coalesce(
            F.expr(f"1000000000 div ({rrf_k} + {name}_rk)"), F.lit(0).cast("long")
        )
        score = part if score is None else score + part
    fused = joined.select(
        "qid",
        F.col("id").alias("doc_id"),
        score.alias("rrf_unat"),
        *[F.coalesce(F.col(f"{n}_rk"), F.lit(0).cast("long")).alias(f"{n}_rk") for n in names],
    )
    w = Window.partitionBy("qid").orderBy(F.col("rrf_unat").desc(), F.col("doc_id").asc())
    return fused.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def bm25_prf_expand(
    docs: DataFrame,
    queries: DataFrame,
    fb_k: int = 5,
    expand_m: int = 3,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (the Rocchio/RM3
    family, two-pass form): rank with BM25, treat each query's top
    ``fb_k`` documents as relevant, add the ``expand_m`` strongest
    terms of that feedback set to the query (term weight = total term
    frequency across the feedback docs — an exact integer; ties break
    on the token), and re-rank with the expanded term set. Recovers
    vocabulary-mismatch documents the literal query misses.

    Determinism: both passes are the suite's integer micro-unit BM25;
    the expansion choice ranks integer tf sums — every step replays
    exactly in SQL.

    Scale posture: the corpus tf table is built ONCE — eagerly
    checkpointed (positions payload dropped first; PRF never reads it)
    — and the checkpoint feeds both scoring passes and the feedback-
    term mining. MEASURED (r13, the banked reuse-or-checkpoint rule):
    trusting ReuseExchange here was wrong — the AQE-final plan
    re-derived the tf subtree per consumer (11 `documents` scans, 69
    exchanges at sf0.1); with the checkpoint the final plan scans
    `documents` 0 times and the tf build runs exactly once. The corpus
    stats (N, Σdl) ride that same checkpoint job as observed metrics
    over the pre-explode projection (r14) — unlike bm25_topk, whose
    single-consumer tf is never materialized, PRF already pays the
    eager pin, so the former lens pass (a second full corpus scan +
    tokenize) folds away for free.
    Contrast `_score_topk`'s banked NON-checkpoint: its two consumers
    share one matched subtree in one action where reuse does fire; the
    difference is three consumers joined against three DIFFERENT
    broadcast sides, which AQE replans independently. Feedback mining
    joins tf to the BROADCAST |queries| x fb_k feedback set, so the
    candidate-term aggregation only touches feedback-doc tokens; the
    expanded term set stays query-bounded, so pass 2 costs what pass 1
    does. The 1-row stats collect is bounded driver state.

    Output: (qid, id_col, score_unat, rk) under the expanded queries.
    """
    if fb_k < 1 or expand_m < 1 or k < 1:
        raise ValueError("fb_k, expand_m and k must all be positive")
    docs = spread_compute(docs)  # r14, guide §2.5; no-op at real scale
    # corpus stats RIDE the tf checkpoint job as observed metrics over
    # the pre-explode (one row per doc, zero-token docs included)
    # projection — the separate lens pass was a second full corpus
    # scan + tokenize just to learn two integers (r14, the §9.3
    # observe-on-checkpoint pattern; guide §1.2). Same expressions the
    # lens pass aggregated, so n/total are value-identical. Shared
    # with bm25_topk since r15 (`_pinned_tf_stats`).
    tf, n_docs, avgdl = _pinned_tf_stats(docs, text_col, id_col)
    qterms = _query_terms(queries, qid_col, qtext_col)

    fb = _score_topk(tf, qterms, int(n_docs), avgdl, fb_k, id_col)
    fb_docs = fb.select("qid", F.col(id_col).alias("_id"))
    cand = (
        tf.join(F.broadcast(fb_docs), on="_id")
        .join(F.broadcast(qterms), on=["qid", "tok"], how="left_anti")
        .groupBy("qid", "tok")
        .agg(F.sum("tf").alias("_w"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("_w").desc(), F.col("tok").asc())
    expansion = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= expand_m)
        .select("qid", "tok")
    )
    # The expanded term set is O(query terms) rows but its LINEAGE is
    # the whole pass-1 scoring + mining pipeline; left lazy it would be
    # re-executed inside every pass-2 broadcast build (three of them).
    # A tiny eager checkpoint truncates it.
    qterms2 = qterms.union(expansion).distinct().localCheckpoint(eager=True)
    return _score_topk(tf, qterms2, int(n_docs), avgdl, k, id_col)


def mmr_rerank(
    candidates: DataFrame,
    pair_sims: DataFrame,
    k: int = 5,
    lambda_pct: int = 70,
) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein
    1998): greedily select ``k`` of each query's candidates, trading
    relevance against redundancy with what is already selected —
    the diversity stage a retrieval-augmented pipeline runs after
    ANN/BM25 top-k, and the sampling stage dataset curators use to
    de-clump near-identical examples.

    Inputs (both ALREADY query-bounded — candidates are a prior
    top-k cut, so every step below is broadcast-scale per query; the
    100 TB cost lives in the retrieval legs that produced them):
    - ``candidates``: (qid, id, rel_u) — relevance in integer
      micro-units;
    - ``pair_sims``: (qid, a, b, sim_u) — DIRECTED pairwise candidate
      similarities in micro-units (both orientations present; absent
      pairs count as similarity 0).

    Selection step i maximizes the integer score
    ``lambda_pct*rel_u - (100-lambda_pct)*max(sim_u to selected)``
    (step 1 has no penalty), ties by candidate id asc. Every
    comparison is integer-exact, so the greedy unrolls into SQL CTEs
    and the gate value-matches the whole selection sequence.

    Output: (qid, id, mmr_rank, sel_score_unat) — the score each item
    was selected AT (step-1 scores carry no penalty term).
    """
    if k < 1:
        raise ValueError("k must be positive")
    if not 0 < lambda_pct <= 100:
        raise ValueError("lambda_pct must be in (1, 100)")
    mu = 100 - lambda_pct
    # the greedy loop reuses cand/pairs every step and `selected`
    # grows by self-reference — without materialization the final
    # plan re-derives every prior step's subtree per step (measured:
    # 329 exchanges for k=4 before this checkpoint discipline, the
    # compounding-lineage failure the BPE/PageRank loops guard
    # against). Both inputs are query-bounded prior cuts, so the
    # checkpoints are small by contract.
    cand = (
        candidates.select("qid", "id", F.col("rel_u").cast("long").alias("rel_u"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        pair_sims.select("qid", "a", "b", F.col("sim_u").cast("long").alias("sim_u"))
        .localCheckpoint(eager=True)
    )

    w = Window.partitionBy("qid").orderBy(F.col("_score").desc(), F.col("id").asc())
    first = (
        cand.withColumn("_score", F.lit(lambda_pct) * F.col("rel_u"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("qid", "id", F.lit(1).alias("mmr_rank"), F.col("_score").alias("sel_score_unat"))
    )
    selected = first
    for step in range(2, k + 1):
        remaining = cand.join(selected.select("qid", "id"), ["qid", "id"], "left_anti")
        pen = (
            pairs.join(
                selected.select("qid", F.col("id").alias("b")), ["qid", "b"]
            )
            .groupBy("qid", F.col("a").alias("id"))
            .agg(F.max("sim_u").alias("_pen"))
        )
        pick = (
            remaining.join(pen, ["qid", "id"], "left")
            .withColumn(
                "_score",
                F.lit(lambda_pct) * F.col("rel_u")
                - F.lit(mu) * F.coalesce(F.col("_pen"), F.lit(0)),
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "qid",
                "id",
                F.lit(step).alias("mmr_rank"),
                F.col("_score").alias("sel_score_unat"),
            )
        )
        selected = selected.unionAll(pick).localCheckpoint(eager=True)
    return selected


def tfidf_doc_similarity(
    docs: DataFrame,
    query_ids: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse lexical document-to-document similarity: top-k corpus
    documents per query document by TF-IDF cosine, computed through
    POSTING-LIST joins (the sparse-GEMM shape) — never a dense
    vector, never an all-pairs product. The lexical complement of the
    dense-embedding ANN family: retrieval-based dedup audits and
    "more like this" corpus exploration run exactly this.

    Determinism discipline: per-(doc, term) weights are integers
    (round(tf * ln((N+1)/(df+1)) * 1000) — a single double expression
    over exact integer inputs, the BM25 micro-unit rule), so dots and
    squared norms are exact integer sums; the final cosine
    round(dot / (sqrt(nn_q) * sqrt(nn_d)) * 1e6) is again ONE double
    expression over three exact integers with fixed operand order —
    bit-identical across engines and partitionings.

    Scale posture: corpus tf builds with the shared one-shuffle
    groupBy; document frequencies join term-keyed (map-side combined
    first); the cross-products join only postings of the QUERY docs'
    terms (query side broadcast), and partial products reduce
    map-side per (query, candidate). Squared norms are one more
    combinable aggregate. No stage touches corpus x corpus.

    Output: (qid, id_col, sim_unat, rk) — self-matches excluded.
    """
    tf = _doc_tf(docs, text_col, id_col).select("_id", "tok", "tf")
    n_docs = docs.count()
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # the weighted posting table feeds FOUR consumers below (norms,
    # the query-side cut, and both sides of the dot join) — left lazy,
    # each one re-derives the tokenize+tf+dfreq pipeline (measured
    # r14: 10 corpus scans / 16 shuffles). The PRF/retrieval_metrics
    # checkpoint discipline pins it once; norms (O(docs) x 2 ints,
    # consumed twice) likewise. Guarded by
    # tests/test_retrieval.py::test_tfidf_final_plan_is_checkpoint_bounded.
    iw = (
        tf.join(dfreq, on="tok")
        .select(
            "_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log((F.lit(float(n_docs)) + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                * F.lit(1000.0)
            )
            .cast("long")
            .alias("iw"),
        )
        .localCheckpoint(eager=True)
    )
    norms = (
        iw.groupBy("_id")
        .agg(F.sum(F.col("iw") * F.col("iw")).alias("nn"))
        .localCheckpoint(eager=True)
    )
    # query-scale by contract, but its LINEAGE is the caller's (often
    # a corpus filter) and it feeds two broadcast builds
    q = query_ids.select(F.col(id_col).alias("_qid")).localCheckpoint(eager=True)
    qiw = iw.join(F.broadcast(q), iw["_id"] == q["_qid"]).select(
        F.col("_qid"), "tok", F.col("iw").alias("_qw")
    )
    dots = (
        iw.join(F.broadcast(qiw), on="tok")
        .filter(F.col("_id") != F.col("_qid"))
        .groupBy("_qid", "_id")
        .agg(F.sum(F.col("iw") * F.col("_qw")).alias("dot"))
    )
    qnorms = norms.join(F.broadcast(q), norms["_id"] == q["_qid"]).select(
        "_qid", F.col("nn").alias("_qnn")
    )
    sim = (
        dots.join(norms, on="_id")
        .join(F.broadcast(qnorms), on="_qid")
        .select(
            "_qid",
            "_id",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("_qnn")) * F.sqrt(F.col("nn")))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("sim_unat"),
        )
    )
    w = Window.partitionBy("_qid").orderBy(F.col("sim_unat").desc(), F.col("_id").asc())
    return (
        sim.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col("_qid").alias("qid"), F.col("_id").alias(id_col), "sim_unat", "rk")
    )
