"""Generic DB-API destination: SQLite / Postgres-shaped engines.

Re-expresses the reference's database destination family
(`crates/cdf-dest-sqlite/`, `crates/cdf-dest-postgres/`,
`crates/cdf-dest-clickhouse/`) as ONE dialect-parameterized commit path
speaking the same plan_commit -> verify protocol as
:class:`cdf_spark.package.ledger.ParquetDestination` and
:class:`cdf_spark.package.duckdb_dest.DuckDbDestination`:

- **stage**: package data segments (canonical parquet) are streamed in
  Arrow record batches into a staging table — batched `executemany`,
  never a per-row Python round trip per value.
- **merge**: one transaction: ``DELETE FROM target WHERE EXISTS
  (null-safe key match against stage)`` then ``INSERT ... SELECT`` from
  stage (the reference's DELETE..USING + IS NOT DISTINCT FROM shape,
  `crates/cdf-dest-duckdb/src/commit.rs:150-216`; SQLite renders the
  null-safe predicate with its ``IS`` operator).
- **verify**: containment recomputed in SQL. Engines without
  ``EXCEPT ALL`` (SQLite) use the grouped-count construction: two
  multisets are equal iff their (row, count(*)) group sets are equal,
  and A ⊆ B (multiset) iff no group of A exceeds its match in B.

Scale posture: like the reference's database sinks, this is a
single-connection, driver-side copy — the distributed work (scan,
contract, dedup, evidence) happened upstream in Spark, and what crosses
the wire is the final admitted batch. Postgres at cluster scale would
use COPY via a partitioned foreachPartition writer; the dialect object
is where that upgrade slots in without touching protocol semantics.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import SparkSession

from ..sources.base import WriteDisposition
from .builder import PackageResult
from .ledger import Receipt


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


@dataclass(frozen=True)
class SqlDialect:
    """The per-engine knobs the commit path needs. Everything else —
    transaction shape, staging, verification algebra — is shared."""

    name: str
    placeholder: str  # DB-API paramstyle token: "?" (qmark) or "%s" (format)
    null_safe_eq: str  # template with {l} and {r}
    supports_except_all: bool
    temp_table_prefix: str  # "TEMPORARY" or "" (engines without temp tables)
    type_map: dict[str, str]  # arrow type family -> SQL column type

    def nse(self, left: str, right: str) -> str:
        return self.null_safe_eq.format(l=left, r=right)

    def sql_type(self, arrow_type) -> str:
        import pyarrow as pa

        t = arrow_type
        if pa.types.is_boolean(t):
            fam = "bool"
        elif pa.types.is_integer(t):
            fam = "int"
        elif pa.types.is_floating(t):
            fam = "float"
        elif pa.types.is_decimal(t):
            return self.type_map["decimal"].format(p=t.precision, s=t.scale)
        elif pa.types.is_timestamp(t):
            fam = "timestamp"
        elif pa.types.is_date(t):
            fam = "date"
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            fam = "binary"
        else:
            fam = "string"
        return self.type_map[fam]


SQLITE = SqlDialect(
    name="sqlite",
    placeholder="?",
    null_safe_eq="{l} IS {r}",  # SQLite IS == IS NOT DISTINCT FROM
    supports_except_all=False,
    temp_table_prefix="TEMPORARY",
    type_map={
        "bool": "INTEGER",
        "int": "INTEGER",
        "float": "REAL",
        "decimal": "NUMERIC",
        "timestamp": "TEXT",
        "date": "TEXT",
        "binary": "BLOB",
        "string": "TEXT",
    },
)

POSTGRES = SqlDialect(
    name="postgres",
    placeholder="%s",
    null_safe_eq="{l} IS NOT DISTINCT FROM {r}",
    supports_except_all=True,
    temp_table_prefix="TEMPORARY",
    type_map={
        "bool": "BOOLEAN",
        "int": "BIGINT",
        "float": "DOUBLE PRECISION",
        "decimal": "NUMERIC({p},{s})",
        "timestamp": "TIMESTAMP",
        "date": "DATE",
        "binary": "BYTEA",
        "string": "TEXT",
    },
)

DUCKDB_DIALECT = SqlDialect(
    name="duckdb",
    placeholder="?",
    null_safe_eq="{l} IS NOT DISTINCT FROM {r}",
    supports_except_all=True,
    temp_table_prefix="TEMPORARY",
    type_map={
        "bool": "BOOLEAN",
        "int": "BIGINT",
        "float": "DOUBLE",
        "decimal": "DECIMAL({p},{s})",
        "timestamp": "TIMESTAMP",
        "date": "DATE",
        "binary": "BLOB",
        "string": "VARCHAR",
    },
)


def _bindable(value, dialect: SqlDialect):
    """Convert an Arrow-python value into what the driver can bind.

    SQLite cannot bind Decimal/date/datetime natively (Python 3.12
    removed the implicit adapters) — render them as canonical strings,
    matching the TEXT/NUMERIC affinity the DDL declares so staged and
    target rows compare equal in SQL.
    """
    if value is None:
        return None
    if isinstance(value, _decimal.Decimal):
        return str(value) if dialect.name == "sqlite" else value
    if isinstance(value, _dt.datetime):
        return value.isoformat(sep=" ") if dialect.name == "sqlite" else value
    if isinstance(value, _dt.date):
        return value.isoformat() if dialect.name == "sqlite" else value
    if isinstance(value, bool) and dialect.name == "sqlite":
        return int(value)
    return value


class DbApiDestination:
    """A commit-protocol destination over any DB-API connection.

    ``connect`` returns a fresh connection (``sqlite3.connect(path)``,
    ``psycopg.connect(dsn)``, ...). One connection spans stage + merge +
    commit so the whole apply is a single transaction: a crash rolls
    back and the target is untouched (reference delivery guarantee
    `crates/cdf-dest-sqlite/` / `cdf-dest-postgres/` commit paths).
    """

    def __init__(
        self,
        connect: Callable[[], object],
        table: str,
        merge_keys: list[str] | None = None,
        dialect: SqlDialect = SQLITE,
        batch_rows: int = 10_000,
        destination_uri: str | None = None,
    ):
        self.connect = connect
        self.table = table
        self.merge_keys = merge_keys or []
        self.dialect = dialect
        self.batch_rows = batch_rows
        self.destination_uri = destination_uri or f"dbapi+{dialect.name}://#{table}"

    # -- helpers ----------------------------------------------------------
    def _segments(self, package: PackageResult) -> list[str]:
        return sorted(str(p) for p in Path(package.data_path()).glob("*.parquet"))

    def _arrow_schema(self, package: PackageResult):
        import pyarrow.parquet as pq

        return pq.read_schema(self._segments(package)[0])

    def _ddl_columns(self, schema) -> str:
        return ", ".join(f"{_q(f.name)} {self.dialect.sql_type(f.type)}" for f in schema)

    def _create_target(self, cur, schema) -> None:
        cur.execute(f"CREATE TABLE IF NOT EXISTS {_q(self.table)} ({self._ddl_columns(schema)})")

    def _load_segments(self, cur, package: PackageResult, into: str, schema) -> int:
        """Stream parquet segments into `into` via Arrow record batches."""
        import pyarrow.parquet as pq

        cols = ", ".join(_q(f.name) for f in schema)
        ph = ", ".join([self.dialect.placeholder] * len(schema))
        insert = f"INSERT INTO {_q(into)} ({cols}) VALUES ({ph})"
        names = [f.name for f in schema]
        total = 0
        for seg in self._segments(package):
            pf = pq.ParquetFile(seg)
            for batch in pf.iter_batches(batch_size=self.batch_rows):
                pyd = batch.to_pydict()
                rows = list(
                    zip(*[[_bindable(v, self.dialect) for v in pyd[n]] for n in names])
                )
                if rows:
                    cur.executemany(insert, rows)
                    total += len(rows)
        return total

    # -- protocol ---------------------------------------------------------
    def commit(
        self,
        spark: SparkSession,  # unused (driver-side copy); kept for protocol parity
        package: PackageResult,
        disposition: WriteDisposition = WriteDisposition.APPEND,
    ) -> Receipt:
        schema = self._arrow_schema(package)
        t = _q(self.table)
        con = self.connect()
        try:
            cur = con.cursor()
            if disposition is WriteDisposition.REPLACE:
                cur.execute(f"DROP TABLE IF EXISTS {t}")
                self._create_target(cur, schema)
                self._load_segments(cur, package, self.table, schema)
            elif disposition is WriteDisposition.APPEND:
                self._create_target(cur, schema)
                self._load_segments(cur, package, self.table, schema)
            elif disposition is WriteDisposition.MERGE:
                if not self.merge_keys:
                    raise ValueError("merge disposition requires merge_keys")
                self._create_target(cur, schema)
                stg = f"_cdf_stage_{uuid.uuid4().hex[:8]}"
                cur.execute(
                    f"CREATE {self.dialect.temp_table_prefix} TABLE {_q(stg)} "
                    f"({self._ddl_columns(schema)})"
                )
                self._load_segments(cur, package, stg, schema)
                pred = " AND ".join(
                    self.dialect.nse(f"{t}.{_q(k)}", f"{_q(stg)}.{_q(k)}")
                    for k in self.merge_keys
                )
                cur.execute(
                    f"DELETE FROM {t} WHERE EXISTS "
                    f"(SELECT 1 FROM {_q(stg)} WHERE {pred})"
                )
                cur.execute(f"INSERT INTO {t} SELECT * FROM {_q(stg)}")
                cur.execute(f"DROP TABLE {_q(stg)}")
            else:
                raise ValueError(f"disposition {disposition} not supported by DbApiDestination")
            con.commit()
        except Exception:
            con.rollback()
            raise
        finally:
            con.close()

        return Receipt(
            receipt_id="rcp-" + uuid.uuid4().hex[:16],
            package_id=package.package_id,
            destination=self.destination_uri,
            disposition=disposition.value,
            delivery_guarantee=disposition.delivery_guarantee,
            rows_written=package.rows_admitted,
            value_hash=package.value_hash,
            committed_at_ms=int(time.time() * 1000),
        )

    # -- verification ------------------------------------------------------
    def _with_stage(self, cur, package: PackageResult):
        schema = self._arrow_schema(package)
        stg = f"_cdf_verify_{uuid.uuid4().hex[:8]}"
        cur.execute(
            f"CREATE {self.dialect.temp_table_prefix} TABLE {_q(stg)} "
            f"({self._ddl_columns(schema)})"
        )
        self._load_segments(cur, package, stg, schema)
        return stg, [f.name for f in schema]

    def verify(self, spark: SparkSession, receipt: Receipt, package: PackageResult) -> Receipt:
        """REPLACE: multiset equality; MERGE: staged batch present
        verbatim (multiset containment); APPEND: row-count lower bound.

        Without EXCEPT ALL the multiset checks use grouped counts:
        ``(row, count(*))`` sets are EXCEPT-compared (SQL set ops treat
        NULLs as not distinct, so the grouping is null-safe for free).
        """
        t = _q(self.table)
        con = self.connect()
        try:
            cur = con.cursor()
            if receipt.disposition == WriteDisposition.APPEND.value:
                cur.execute(f"SELECT count(*) FROM {t}")
                ok = cur.fetchone()[0] >= receipt.rows_written
            else:
                stg, names = self._with_stage(cur, package)
                cols = ", ".join(_q(n) for n in names)
                if self.dialect.supports_except_all:
                    fwd = f"SELECT {cols} FROM {_q(stg)} EXCEPT ALL SELECT {cols} FROM {t}"
                    bwd = f"SELECT {cols} FROM {t} EXCEPT ALL SELECT {cols} FROM {_q(stg)}"
                else:
                    gs = f"SELECT {cols}, count(*) AS _n FROM {_q(stg)} GROUP BY {cols}"
                    gt = f"SELECT {cols}, count(*) AS _n FROM {t} GROUP BY {cols}"
                    fwd = f"{gs} EXCEPT {gt}"
                    bwd = f"{gt} EXCEPT {gs}"
                if receipt.disposition == WriteDisposition.REPLACE.value:
                    # two separate counts: EXCEPT/UNION are equal-precedence
                    # left-associative in SQLite, so one compound misparses
                    cur.execute(f"SELECT count(*) FROM ({fwd})")
                    n_fwd = cur.fetchone()[0]
                    cur.execute(f"SELECT count(*) FROM ({bwd})")
                    ok = n_fwd == 0 and cur.fetchone()[0] == 0
                else:  # merge: staged ⊆ target as multisets
                    if self.dialect.supports_except_all:
                        cur.execute(f"SELECT count(*) FROM ({fwd})")
                        ok = cur.fetchone()[0] == 0
                    else:
                        on = " AND ".join(
                            self.dialect.nse(f"s.{_q(n)}", f"g.{_q(n)}") for n in names
                        )
                        cur.execute(
                            f"SELECT count(*) FROM "
                            f"(SELECT {cols}, count(*) AS _n FROM {_q(stg)} GROUP BY {cols}) s "
                            f"LEFT JOIN "
                            f"(SELECT {cols}, count(*) AS _n FROM {t} GROUP BY {cols}) g "
                            f"ON {on} WHERE g._n IS NULL OR g._n < s._n"
                        )
                        ok = cur.fetchone()[0] == 0
                cur.execute(f"DROP TABLE {_q(stg)}")
            con.commit()
        finally:
            con.close()
        receipt.verified = bool(ok)
        return receipt

    # -- readback ----------------------------------------------------------
    def read_back(self, spark: SparkSession):
        """Round-trip the committed table into Spark (driver-side; the
        table is a single-node artifact, like the reference's sinks)."""
        import pandas as pd

        con = self.connect()
        try:
            cur = con.cursor()
            cur.execute(f"SELECT * FROM {_q(self.table)}")
            names = [d[0] for d in cur.description]
            rows = cur.fetchall()
        finally:
            con.close()
        return spark.createDataFrame(pd.DataFrame(rows, columns=names))
