"""Deterministic scalar-function allowlist.

The reference admits only *immutable* scalar built-ins from a pinned
DataFusion feature set (crypto, datetime, encoding, math, nested,
regex, string, unicode — `crates/cdf-kernel/src/expression.rs:13-17`)
and rejects volatile functions (now(), random()) so compiled plans
replay byte-identically (`crates/cdf-engine/src/expression.rs:570-599`).

We replicate the gate over `pyspark.sql.functions`: anything that
lands in a replayable plan must be on this list; volatile and
session-dependent functions are named explicitly so the error is
actionable.
"""

from __future__ import annotations

ALLOWED_FUNCTIONS: dict[str, frozenset[str]] = {
    "crypto": frozenset({"md5", "sha1", "sha2", "crc32", "xxhash64", "hash"}),
    "datetime": frozenset(
        {
            "date_add", "date_sub", "datediff", "date_trunc", "trunc",
            "year", "quarter", "month", "day", "dayofmonth", "dayofweek",
            "dayofyear", "weekofyear", "hour", "minute", "second",
            "to_date", "to_timestamp", "unix_timestamp_from", "from_unixtime",
            "make_date", "make_timestamp", "last_day", "next_day",
            "add_months", "months_between", "extract", "date_format",
        }
    ),
    "encoding": frozenset({"base64", "unbase64", "hex", "unhex", "encode", "decode", "to_json", "from_json", "get_json_object", "json_tuple"}),
    "math": frozenset(
        {
            "abs", "ceil", "floor", "round", "bround", "sqrt", "cbrt",
            "exp", "expm1", "ln", "log", "log2", "log10", "log1p",
            "pow", "power", "sign", "signum", "sin", "cos", "tan",
            "asin", "acos", "atan", "atan2", "sinh", "cosh", "tanh",
            "degrees", "radians", "greatest", "least", "pmod", "factorial",
        }
    ),
    "nested": frozenset(
        {
            "array", "array_contains", "array_distinct", "array_except",
            "array_intersect", "array_join", "array_max", "array_min",
            "array_position", "array_remove", "array_repeat", "array_sort",
            "array_union", "arrays_overlap", "arrays_zip", "size",
            "slice", "sort_array", "element_at", "flatten", "sequence",
            "struct", "named_struct", "map_keys",
            "map_values", "map_entries", "map_from_entries", "map_concat",
            "explode_outer", "posexplode", "transform", "filter_array",
            "aggregate", "zip_with", "exists", "forall",
        }
    ),
    "regex": frozenset({"regexp_extract", "regexp_extract_all", "regexp_replace", "regexp_count", "rlike", "regexp_like"}),
    "string": frozenset(
        {
            "concat", "concat_ws", "format_number", "format_string",
            "instr", "length", "octet_length", "bit_length", "locate",
            "lower", "upper", "initcap", "lpad", "rpad", "ltrim", "rtrim",
            "trim", "repeat", "reverse", "split", "substring", "substr",
            "substring_index", "translate", "overlay", "left", "right",
            "replace", "startswith", "endswith", "contains", "levenshtein",
            "soundex", "ascii", "chr", "char",
        }
    ),
    "unicode": frozenset({"char_length", "character_length", "unicode", "btrim"}),
    "conditional": frozenset({"coalesce", "nullif", "nvl", "nvl2", "ifnull", "isnan", "when", "case"}),
}

VOLATILE_FUNCTIONS = frozenset(
    {
        "now", "current_timestamp", "current_date", "current_timezone",
        "rand", "randn", "random", "uuid", "shuffle",
        "monotonically_increasing_id", "spark_partition_id",
        "input_file_name", "current_user", "session_user",
    }
)

_ALL_ALLOWED = frozenset().union(*ALLOWED_FUNCTIONS.values())


class DeterminismError(ValueError):
    pass


def assert_deterministic_call(func: str) -> None:
    """Gate a function name for admission into a replayable plan."""
    f = func.lower()
    if f in VOLATILE_FUNCTIONS:
        raise DeterminismError(
            f"function {func!r} is volatile and not admitted into replayable plans "
            "(reference parity: crates/cdf-engine/src/expression.rs:570-599)"
        )
    if f not in _ALL_ALLOWED:
        raise DeterminismError(
            f"function {func!r} is not on the deterministic scalar allowlist"
        )
