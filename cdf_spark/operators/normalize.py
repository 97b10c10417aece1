"""Text normalization / canonicalization operators for web-scale
training-data curation.

Beyond-reference operators (SURVEY §7 step 8 family): the cleanup
passes every web-crawl pipeline runs before dedup and quality
filtering — HTML boilerplate stripping, control/zero-width character
removal, Unicode NFC canonicalization, and URL canonicalization for
per-domain dedup (the C4 / CCNet / RefinedWeb preprocessing shape).

Everything except NFC is pure `pyspark.sql.functions` string/regexp
arithmetic — whole-stage codegen, zero Python in the row path, and a
regex subset chosen to evaluate identically under Java regex (Spark)
and RE2 (DuckDB) so the oracle twin is exact. Unicode normalization
has NO Spark built-in, so `nfc` is the documented Arrow-batched
pandas_udf boundary (unicodedata.normalize over a pandas series);
DuckDB's `nfc_normalize` is its oracle twin.

At 100 TB each operator is a narrow projection over the documents
scan — no shuffle, no join; URL canonicalization feeds a single
hash-partitioned dedup shuffle downstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# The five entities every HTML tokenizer must decode (plus nbsp).
# Order matters: '&amp;' must decode LAST — decoding it first turns
# '&amp;lt;' (the ESCAPED text "&lt;") into '&lt;' and a later pass
# double-decodes it to '<'; with '&amp;' last, '&amp;lt;' → '&lt;'.
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(col: Column) -> Column:
    """Strip HTML to text: drop <script>/<style> elements wholesale
    (their content is never prose), remove every remaining tag,
    decode the core entities, collapse whitespace runs, trim.

    Regex notes for engine parity: `(?s)` dotall + non-greedy body
    for element removal and `<[^>]*>` for tags parse identically in
    Java regex and RE2 — element removal is two literal-tag passes
    (script, style) rather than one backreferenced `</\\1>` pattern
    because RE2 (the oracle engine) has no pattern backreferences;
    `\\s+` matches the same ASCII space class on the fixtures.
    """
    out = F.regexp_replace(col, r"(?s)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?s)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def clean_text(col: Column) -> Column:
    """Control/zero-width character removal + whitespace collapse —
    the per-document cleanup pass that precedes tokenization:
    C0/C1 control chars (except \\t \\n \\r, which count as
    whitespace), zero-width space/joiner/non-joiner and BOM dropped,
    then whitespace runs collapsed to single spaces and trimmed."""
    out = F.regexp_replace(col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    out = F.regexp_replace(out, "[\u200b\u200c\u200d\ufeff]", "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def _nfc_series(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda v: unicodedata.normalize("NFC", v) if v is not None else None
    )


def nfc(col: Column) -> Column:
    """Unicode NFC canonicalization. Spark has no normalization
    built-in, so this is an Arrow-batched pandas_udf (the documented
    vectorized boundary — same posture as the multimodal codecs);
    DuckDB `nfc_normalize` is the exact oracle twin. Composed forms
    are required before exact/fingerprint dedup: 'e'+U+0301 and
    U+00E9 are distinct bytes but the same text. The udf object is
    built per call (not at import) — decorating at module scope
    requires an active SparkSession, which importers may not have."""
    return pandas_udf(_nfc_series, "string")(col)


# Tracking parameters stripped by URL canonicalization: the shared
# utm_* set plus the common click-id params.
_TRACKING_PARAMS = r"(utm_[a-z]+|gclid|fbclid|ref)"


def canonical_url(col: Column) -> Column:
    """Canonicalize a URL for dedup identity: lowercase scheme+host,
    strip tracking query params (utm_*, gclid, fbclid, ref), drop a
    then-empty '?', drop fragments, strip one trailing slash from a
    non-root path. Pure regexp arithmetic with an RE2-safe subset."""
    # split scheme+host (lowercase) from the rest
    scheme_host = F.lower(F.regexp_extract(col, r"^([a-zA-Z]+://[^/?#]*)", 1))
    rest = F.regexp_replace(col, r"^[a-zA-Z]+://[^/?#]*", "")
    # drop fragment
    rest = F.regexp_replace(rest, r"#.*$", "")
    # drop tracking params wherever they sit in the query string
    rest = F.regexp_replace(rest, r"[?&]" + _TRACKING_PARAMS + r"=[^&#]*", "")
    # if the FIRST param was tracking, the survivor now leads with '&'
    # right after the path (which never contains & or ?): promote it
    rest = F.regexp_replace(rest, r"^([^?&]*)&", r"$1?")
    # a query string reduced to nothing leaves a dangling '?'
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # strip one trailing slash on a non-root path
    rest = F.regexp_replace(rest, r"(.+)/$", r"$1")
    return F.concat(scheme_host, rest)


def url_host(col: Column) -> Column:
    """Registrable host of a URL (lowercased, port dropped) — the
    partition key for per-domain statistics and politeness limits."""
    return F.lower(F.regexp_extract(col, r"^[a-zA-Z]+://([^/?#:]*)", 1))


# C4 line-filter banned phrases (Raffel et al. 2020 §2.2 uses a longer
# boilerplate list; this subset keeps SQL parity trivial).
C4_BANNED_PHRASES: tuple[str, ...] = ("javascript", "lorem ipsum", "cookie")


def c4_line_filter(
    col: Column,
    *,
    min_words: int = 5,
) -> dict[str, Column]:
    """C4-style line-level cleanup (Raffel et al. 2020, §2.2): keep
    only lines that end in terminal punctuation, have at least
    `min_words` words, and contain none of the banned boilerplate
    phrases ('javascript', 'lorem ipsum', 'cookie' — the
    enable-JS/placeholder/cookie-notice lines every crawl carries).
    Returns the cleaned text (kept lines re-joined), kept count and
    total count. Pure higher-order-function expressions over the
    split-lines array — zero shuffle, zero Python; the SQL twin is
    list_filter with the identical predicates."""
    lines = F.split(col, "\n")

    def _keep(l: Column) -> Column:
        t = F.trim(l)
        words = F.filter(F.split(t, " "), lambda w: F.length(w) > 0)
        ok = t.rlike('[.!?"]$') & (F.size(words) >= min_words)
        low = F.lower(l)
        for phrase in C4_BANNED_PHRASES:
            ok = ok & ~F.contains(low, F.lit(phrase))
        return ok

    kept = F.filter(lines, _keep)
    return {
        "clean_text": F.array_join(kept, "\n"),
        "n_lines_kept": F.size(kept).cast("bigint"),
        "n_lines_total": F.size(lines).cast("bigint"),
    }


def boilerplate_line_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_frac: float = 0.05,
) -> DataFrame:
    """CORPUS-LEVEL boilerplate line removal — the CCNet / web-crawl
    discipline C4's phrase list can't reach: a line is boilerplate
    not because of WHAT it says but because it appears in too many
    DOCUMENTS (site footers, licence blocks, nav text, cookie banners
    in any language). Every line whose document frequency reaches
    `min_doc_frac` of the corpus drops from ALL documents — unlike
    `curation.segment_dedup` (keep-first), frequency-boilerplate keeps
    ZERO copies; it is template noise, not content.

    Scale shape: one posexplode (narrow) -> one distinct-count shuffle
    keyed on the normalized line -> the boilerplate SET is inherently
    small (only lines common to >= frac of docs survive the HAVING),
    so the removal join BROADCASTS it -> one per-doc reassembly
    shuffle. The corpus size feeds the threshold via a 1-row agg
    cross-join, not a driver collect.

    Output: (id_col, text_kept, n_lines, n_dropped) — one row per
    input doc; a doc that was ALL boilerplate keeps an empty string
    (evidence, not silent drop).
    """
    lines = F.split(F.col(text_col), "\n")
    ex = df.select(
        F.col(id_col), F.posexplode(lines).alias("p", "line")
    ).withColumn("k", F.lower(F.trim("line")))
    total = df.select(F.count(F.lit(1)).alias("_n"))
    boiler = (
        ex.groupBy("k")
        .agg(F.countDistinct(id_col).alias("_df"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("_df") >= F.ceil(F.col("_n") * F.lit(min_doc_frac)))
        .select("k")
    )
    # ONE per-doc aggregate does removal, reassembly and the counts
    # (r14, guide §2.4): the old anti-join + re-join-with-df shape
    # consumed the exploded corpus twice and the source three times
    # (4 scans in the AQE-final plan, each re-running the caller's
    # text-transform lineage). A left-join FLAG keeps every line row,
    # so collect_list(when(kept)) rebuilds the doc (collect_list skips
    # nulls), count(*) IS n_lines (split always yields >= 1 element),
    # and the boilerplate count rides the same aggregate — the `total`
    # leg remains, but it prunes to a column-less rowcount scan.
    flagged = ex.join(
        F.broadcast(boiler.withColumn("_b", F.lit(1))), on="k", how="left"
    )
    keep_struct = F.when(F.col("_b").isNull(), F.struct("p", "line"))
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(keep_struct)),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_kept"),
        F.count(F.lit(1)).cast("int").alias("n_lines"),
        F.count("_b").cast("int").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Mojibake repair (UTF-8 read as cp1252 — the ftfy discipline's top class)

# The single dominant mojibake class in web crawls: UTF-8 bytes decoded
# as Windows-1252 ("cafÃ©", "â€œquotedâ€\x9d"). The repair map is
# GENERATED, not hand-typed: for each target char, its UTF-8 bytes
# re-decoded as cp1252 give the corrupted form. Applied longest-first
# so 3-byte sequences ("â€œ") repair before any 2-byte prefix could
# half-match. A replace CHAIN (not a regex) keeps the semantics
# byte-identical across Spark, DuckDB and Python.
_MOJIBAKE_CHARS = "éèêëáàâäíîïóôöúùûüñçãõ“”‘’–—€°"


def _mojibake_map() -> list[tuple[str, str]]:
    out = []
    for good in _MOJIBAKE_CHARS:
        try:
            bad = good.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            # bytes undefined in cp1252 (e.g. 0x9d in the RIGHT DOUBLE
            # QUOTATION MARK) — real decoders using strict cp1252 could
            # not have produced this corruption, so skip it.
            continue
        out.append((bad, good))
    out.sort(key=lambda p: (-len(p[0]), p[0]))
    return out


MOJIBAKE_FIXES: list[tuple[str, str]] = _mojibake_map()


def fix_mojibake(col: Column) -> Column:
    """Repair cp1252-mojibake by the generated replace chain. Pure
    built-in string ops, zero shuffle; each replacement shrinks the
    text, so (len before - len after) is a free corruption signal."""
    out = col
    for bad, good in MOJIBAKE_FIXES:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def mojibake_repair(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text_fixed, chars_collapsed) — chars_collapsed > 0 flags
    documents that were corrupted (each repair shrinks a 2-3 char
    corruption to 1 char)."""
    fixed = fix_mojibake(F.col(text_col))
    return df.select(
        F.col(id_col),
        fixed.alias("text_fixed"),
        (F.length(F.col(text_col)) - F.length(fixed)).alias("chars_collapsed"),
    )
