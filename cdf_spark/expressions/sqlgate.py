"""Project-SQL admission gate.

Re-expresses the reference's SQL analyzer
(`crates/cdf-engine/src/sql_analysis.rs:85-368`): a `.cdf.sql` resource
may contain exactly ONE ``SELECT <projection> FROM upstream(source =>
'<resource>', ...) [WHERE <predicate>]``. Everything else is rejected
with a stable error code so plans stay replayable and single-upstream:

  E_WITH            WITH / CTEs                     (sql_analysis.rs:309-314)
  E_JOIN            joins or >1 FROM relation        (:297-306)
  E_SET_OP          UNION/INTERSECT/EXCEPT           (:331-337)
  E_GROUP           GROUP BY / HAVING / DISTINCT     (:338-346)
  E_ORDER_LIMIT     ORDER BY / LIMIT / OFFSET        (:338-346)
  E_WINDOW          OVER / QUALIFY / named windows   (:338-346)
  E_SUBQUERY        nested SELECT                    (:297-306)
  E_UPSTREAM        FROM is not a single upstream()  (:370-637)
  E_SHAPE           not a single SELECT statement

The admitted query is returned as a :class:`ProjectQuery`; the engine
then runs the projection/filter through Spark with the upstream bound
to a temp view. The *gate* is the custom part — Spark itself would
happily run everything we reject.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class SqlAdmissionError(ValueError):
    def __init__(self, code: str, message: str):
        self.code = code
        super().__init__(f"{code}: {message}")


@dataclass
class ProjectQuery:
    projection_sql: str          # text between SELECT and FROM
    upstream_source: str         # the source => '<name>' argument
    upstream_options: dict[str, str] = field(default_factory=dict)
    where_sql: str | None = None

    def render(self, view_name: str) -> str:
        """Render admitted SQL against a bound temp view."""
        sql = f"SELECT {self.projection_sql} FROM {view_name}"
        if self.where_sql:
            sql += f" WHERE {self.where_sql}"
        return sql


_TOKEN_RE = re.compile(
    r"""
      '(?:[^']|'')*'          # string literal
    | "(?:[^"]|"")*"          # quoted identifier
    | `(?:[^`]|``)*`          # backtick-quoted identifier (Spark SQL)
    | --[^\n]*                # line comment
    | /\*.*?\*/               # block comment
    | [A-Za-z_][A-Za-z0-9_$]* # identifier / keyword
    | \d+\.\d+ | \.\d+ | \d+  # numeric literal
    | =>|<>|!=|>=|<=|\|\|
    | .                       # any single char
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokens(sql: str) -> list[str]:
    toks = []
    for m in _TOKEN_RE.finditer(sql):
        t = m.group(0)
        if t.startswith("--") or t.startswith("/*") or t.isspace():
            continue
        toks.append(t)
    return toks


_FORBIDDEN_KEYWORDS = [
    ("with", "E_WITH", "WITH / common table expressions are not admitted"),
    ("join", "E_JOIN", "joins and multiple upstream relations are not admitted"),
    ("union", "E_SET_OP", "set operations are not admitted"),
    ("intersect", "E_SET_OP", "set operations are not admitted"),
    ("except", "E_SET_OP", "set operations are not admitted"),
    ("group", "E_GROUP", "GROUP BY is not admitted"),
    ("having", "E_GROUP", "HAVING is not admitted"),
    ("distinct", "E_GROUP", "DISTINCT is not admitted"),
    ("order", "E_ORDER_LIMIT", "ORDER BY is not admitted"),
    ("limit", "E_ORDER_LIMIT", "LIMIT is not admitted"),
    ("offset", "E_ORDER_LIMIT", "OFFSET is not admitted"),
    ("over", "E_WINDOW", "window functions are not admitted"),
    ("qualify", "E_WINDOW", "QUALIFY is not admitted"),
    ("window", "E_WINDOW", "named windows are not admitted"),
]


def analyze_project_query(sql: str) -> ProjectQuery:
    """Shape-gate a project SQL text and extract its admitted parts."""
    stripped = sql.strip()
    # one optional statement terminator may trail the statement; any
    # OTHER ';' in the token stream (e.g. `WHERE 1=1 ; DROP TABLE t`)
    # breaks the single-statement guarantee and is rejected outright
    if stripped.endswith(";"):
        stripped = stripped[:-1]
    toks = _tokens(stripped)
    if not toks:
        raise SqlAdmissionError("E_SHAPE", "empty statement")
    if ";" in toks:
        raise SqlAdmissionError("E_SHAPE", "multiple statements are not admitted (stray ';')")
    low = [t.lower() for t in toks]

    if low[0] == "with":
        raise SqlAdmissionError("E_WITH", "WITH / common table expressions are not admitted")
    if low[0] != "select":
        raise SqlAdmissionError("E_SHAPE", "statement must be a single SELECT")
    for kw, code, msg in _FORBIDDEN_KEYWORDS:
        if kw in low:
            raise SqlAdmissionError(code, msg)
    if low.count("select") > 1:
        raise SqlAdmissionError("E_SUBQUERY", "nested SELECT / subqueries are not admitted")

    if "from" not in low:
        raise SqlAdmissionError("E_UPSTREAM", "FROM upstream(...) is required")
    from_idx = low.index("from")
    if low.count("from") > 1:
        raise SqlAdmissionError("E_JOIN", "multiple FROM relations are not admitted")

    projection = " ".join(toks[1:from_idx]).strip()
    if not projection:
        raise SqlAdmissionError("E_SHAPE", "empty projection")

    # FROM must be exactly `upstream ( ... )` [WHERE ...]
    rest = toks[from_idx + 1 :]
    rest_low = [t.lower() for t in rest]
    if not rest or rest_low[0] != "upstream" or len(rest) < 2 or rest[1] != "(":
        raise SqlAdmissionError("E_UPSTREAM", "FROM relation must be upstream(source => '...')")

    # Find matching close paren.
    depth = 0
    close = None
    for i, t in enumerate(rest[1:], start=1):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
            if depth == 0:
                close = i
                break
    if close is None:
        raise SqlAdmissionError("E_UPSTREAM", "unbalanced parens in upstream(...)")

    args = rest[2:close]
    source, options = _parse_upstream_args(args)

    tail = rest[close + 1 :]
    tail_low = [t.lower() for t in tail]
    where_sql: str | None = None
    if tail:
        if tail_low[0] == ",":
            raise SqlAdmissionError("E_JOIN", "joins and multiple upstream relations are not admitted")
        if tail_low[0] != "where":
            raise SqlAdmissionError("E_SHAPE", f"unexpected token after upstream(): {tail[0]!r}")
        where_sql = " ".join(tail[1:]).strip()
        if not where_sql:
            raise SqlAdmissionError("E_SHAPE", "empty WHERE clause")
        if "," in tail:
            # commas in WHERE only legal inside calls; calls carry parens
            if "(" not in tail:
                raise SqlAdmissionError("E_JOIN", "joins and multiple upstream relations are not admitted")

    return ProjectQuery(projection, source, options, where_sql)


def _parse_upstream_args(args: list[str]) -> tuple[str, dict[str, str]]:
    """Parse `source => 'name', key => value, ...` argument tokens."""
    if not args:
        raise SqlAdmissionError("E_UPSTREAM", "upstream() requires source => '...'")
    # Split on top-level commas.
    groups: list[list[str]] = [[]]
    depth = 0
    for t in args:
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        if t == "," and depth == 0:
            groups.append([])
        else:
            groups[-1].append(t)

    source: str | None = None
    options: dict[str, str] = {}
    for g in groups:
        if len(g) != 3 or g[1] != "=>":
            raise SqlAdmissionError("E_UPSTREAM", f"bad upstream() argument: {' '.join(g)!r}")
        key = g[0].lower()
        val = g[2]
        if val.startswith("'"):
            val = val[1:-1].replace("''", "'")
        if key == "source":
            source = val
        else:
            options[key] = val
    if source is None:
        raise SqlAdmissionError("E_UPSTREAM", "upstream() missing source => '...'")
    return source, options
