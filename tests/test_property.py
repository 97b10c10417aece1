"""Property tests (hypothesis): type mapping, predicates, positions,
watermarks — the analogue of the reference's property_fuzz suites
(`crates/cdf-conformance/src/property_fuzz/`)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from cdf_spark.expressions.ast import Binary, Col, Lit, parse_predicate_text
from cdf_spark.positions import CursorPosition, FileManifest, aggregate_positions
from cdf_spark.streaming.watermark import WatermarkLedger
from cdf_spark.types.arrow_types import parse_arrow_type, spark_to_canonical
from cdf_spark.types.schema import CanonicalSchema

# --- type grammar -----------------------------------------------------------

_primitives = st.sampled_from(
    ["utf8", "string", "boolean", "int8", "int16", "int32", "int64",
     "uint8", "uint16", "uint32", "uint64", "float16", "float32", "float64",
     "binary", "date32", "timestamp(us, UTC)", "timestamp(ms)", "decimal128(12,3)"]
)


def _nested(children):
    return st.one_of(
        children.map(lambda t: f"list<{t}>"),
        st.tuples(children, children).map(lambda ab: f"map<{ab[0]}, {ab[1]}>"),
        st.lists(
            st.tuples(st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True), children),
            min_size=1, max_size=3, unique_by=lambda kv: kv[0],
        ).map(lambda fs: "struct<" + ", ".join(f"{n}: {t}" for n, t in fs) + ">"),
    )


type_strings = st.recursive(_primitives, _nested, max_leaves=6)


@given(type_strings)
@settings(max_examples=200, deadline=None)
def test_type_mapping_roundtrip(text):
    """parse -> spark type -> canonicalize -> parse again is a fixpoint."""
    mt = parse_arrow_type(text)
    canon = spark_to_canonical(mt.spark_type)
    mt2 = parse_arrow_type(canon)
    assert mt2.spark_type == mt.spark_type
    # canonicalization is idempotent
    assert spark_to_canonical(mt2.spark_type) == canon


@given(st.lists(
    st.tuples(st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True), _primitives),
    min_size=1, max_size=8, unique_by=lambda kv: kv[0],
))
@settings(max_examples=100, deadline=None)
def test_schema_fingerprint_properties(fields):
    s = CanonicalSchema.from_declared(fields)
    assert s.fingerprint() == CanonicalSchema.from_declared(fields).fingerprint()
    if len(fields) > 1:
        rotated = fields[1:] + fields[:1]
        assert s.fingerprint() != CanonicalSchema.from_declared(rotated).fingerprint()


# --- predicates -------------------------------------------------------------

_idents = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,12}", fullmatch=True)
_ops = st.sampled_from(["=", "!=", ">", ">=", "<", "<="])
_literals = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(lambda f: f"{f:.4f}"),
    st.sampled_from(["true", "false", "null"]),
    st.from_regex(r"[a-zA-Z0-9 _.-]{0,12}", fullmatch=True).map(lambda s: "'" + s + "'"),
)


@given(st.lists(st.tuples(_idents, _ops, _literals), min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_predicate_parse_stability(terms):
    text = " AND ".join(f"{c} {op} {lit}" for c, op, lit in terms)
    e1 = parse_predicate_text(text)
    e2 = parse_predicate_text(text)
    assert e1.content_hash() == e2.content_hash()
    assert e1.columns() == {c for c, _, _ in terms}


@given(_idents, _ops, st.integers(min_value=-(10**9), max_value=10**9))
@settings(max_examples=100, deadline=None)
def test_predicate_literal_roundtrip(col, op, value):
    e = parse_predicate_text(f"{col} {op} {value}")
    assert isinstance(e, Binary)
    assert isinstance(e.left, Col) and e.left.name == col
    assert isinstance(e.right, Lit) and e.right.value == value


# --- position algebra -------------------------------------------------------


@given(st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_cursor_merge_is_max(values):
    ps = [CursorPosition("id", v) for v in values]
    assert aggregate_positions(ps).value == max(values)
    # commutative
    assert aggregate_positions(list(reversed(ps))).value == max(values)
    # idempotent
    assert aggregate_positions(ps + ps).value == max(values)


@given(st.lists(st.sets(st.from_regex(r"[a-z]{1,6}", fullmatch=True), max_size=5), min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_file_manifest_merge_is_union(sets):
    merged = aggregate_positions([FileManifest(s) for s in sets])
    assert merged.completed == set().union(*sets)


# --- watermark monotonicity -------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_watermark_ledger_monotone_under_any_sequence(tmp_path_factory, values):
    led = WatermarkLedger(tmp_path_factory.mktemp("wm"), "r")
    running_max = None
    for v in values:
        eff = led.advance("c", v)
        running_max = v if running_max is None else max(running_max, v)
        assert eff == running_max


# --- iceberg single-value serde + pruning conservativeness ------------------


_BOUND_CASES = st.one_of(
    st.tuples(st.just("int"), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    st.tuples(st.just("long"), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    st.tuples(
        st.just("double"),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    st.tuples(st.just("string"), st.text(max_size=40)),
)


@given(_BOUND_CASES)
@settings(max_examples=200, deadline=None)
def test_iceberg_bound_serde_roundtrip(case):
    from cdf_spark.sources.iceberg import _decode_bound, _encode_bound

    typ, value = case
    data = _encode_bound(value, typ)
    assert data is not None
    assert _decode_bound(data, typ) == value


@given(
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=-1200, max_value=1200),
    st.sampled_from(["eq", "ne", "lt", "le", "gt", "ge"]),
)
@settings(max_examples=300, deadline=None)
def test_file_can_match_never_prunes_a_matching_value(lo, span, v, op):
    """Conservativeness law: if _file_can_match says False for a
    [lo, hi] interval, then NO value inside the interval satisfies the
    predicate — a False that hides a matching row is data loss."""
    from cdf_spark.sources.iceberg import _file_can_match

    hi = lo + span
    expr = Binary(op, Col("c"), Lit(v))
    verdict = _file_can_match(expr, {"c": (lo, hi)})
    if verdict is False:
        import operator as _op

        fn = {
            "eq": _op.eq,
            "ne": _op.ne,
            "lt": _op.lt,
            "le": _op.le,
            "gt": _op.gt,
            "ge": _op.ge,
        }[op]
        # check the endpoints and a midpoint — for these monotone ops a
        # satisfying value inside the interval implies one at an endpoint
        assert not any(fn(x, v) for x in (lo, hi, (lo + hi) // 2))


# --- matview MIN/MAX heap algebra --------------------------------------------

from collections import Counter as _Counter
from decimal import Decimal as _D

from cdf_spark.operators.matview import _merge_extreme_rows


def _heal(live, asc, k):
    """Simulated fence recompute: the k nearest-to-extreme values with
    multiplicity + the (k+1)-th as the bound (what _heap_agg builds)."""
    vals = sorted(live.elements(), reverse=not asc)
    heap = vals[:k]
    bound = vals[k] if len(vals) > k else None
    return heap, bound


@given(
    st.booleans(),
    st.integers(min_value=1, max_value=4),
    st.lists(  # batches of signed value-deltas; deletes drawn from live later
        st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=8),
        min_size=1, max_size=6,
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=150, deadline=None)
def test_extreme_heap_fold_serves_exact_or_fences(asc, k, batches, rnd):
    """Through ANY valid insert/delete sequence, the heap fold either
    serves the exact extreme or fences — never a wrong answer. Fences
    heal from the live multiset exactly as the snapshot recompute
    does."""
    live: _Counter = _Counter()
    heap, bound = [], None
    for batch in batches:
        pairs = []
        for v in batch:
            dv = _D(v)
            # half the time try a delete of a live value (valid feed)
            if rnd.random() < 0.5 and live:
                dv = rnd.choice(sorted(live.elements()))
                live[dv] -= 1
                if live[dv] == 0:
                    del live[dv]
                pairs.append({"v": dv, "sg": -1})
            else:
                live[dv] += 1
                pairs.append({"v": dv, "sg": 1})
        heap, bound, fence = _merge_extreme_rows(heap, bound, pairs, asc, k)
        if fence:
            heap, bound = _heal(live, asc, k)
        if live:
            true_ext = min(live) if asc else max(live)
            assert heap, "nonempty live multiset must serve an extreme after heal"
            assert heap[0] == true_ext, (
                f"served {heap[0]} but true extreme is {true_ext} "
                f"(asc={asc}, k={k}, live={dict(live)}, bound={bound})"
            )
        else:
            assert not heap
