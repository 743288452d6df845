"""Named-query catalog: the driver-facing registry of engine operations.

Every operator from SURVEY.md §2 (plus the training-data extensions) is
registered here as a named query: a ``(spark, sf_dir) -> DataFrame``
callable, optionally paired with an equivalent ANSI-SQL oracle string
runnable by DuckDB over the same parquet tables. The driver compares the
two (row count + schema + order-insensitive value hash) at sf=0.01.

Conventions that keep the comparison honest:

- Every computed/aggregate column is aliased identically on both sides.
- Double aggregates are rounded (2-4 dp) on both sides — float sums are
  order-dependent, and Spark and DuckDB reduce in different orders.
- Top-k queries order by a unique tie-break key so the row set is
  deterministic.
- Timestamps are pinned to UTC (session.py) and compared as-is.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Parquet tables the driver provides at each scale factor.
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided parquet table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    rejects by default; read it as a long (nanos) and truncate to a
    proper microsecond timestamp — the same truncation DuckDB applies.
    """
    if name == "events":
        from pyspark.sql import functions as F

        # The driver builds a bare SparkSession that never goes through
        # session.py's DEFAULT_CONF, so set the nanos conf here too — it is
        # runtime-settable and must be in place *before* the parquet read
        # or Spark raises PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB-equivalent
    SQL (omit for non-SQL-expressible ops -> rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from virapipe_spark.queries import (  # noqa: F401
        relational,
        genomics,
        dataflow,
        extensions,
        streaming,
        multimodal,
    )


def _verified_rounds(root: str | None = None) -> dict[str, int]:
    """name -> latest round in which the driver proved the query, read
    from the repo's ``CORRECTNESS_r*.json`` files at call time.

    "Proved" means the driver row exists and is clean: for oracle-backed
    entries, rows/schema/hash all matched with no error; for rows-only
    entries (``err == "no_oracle"``), the Spark side executed and
    returned a row count. A hash-fail, schema-fail, or crash does NOT
    count — and if the MOST RECENT check of an entry failed, the entry
    is demoted to never-verified (key absent → sorts first) regardless
    of older green rounds, so a regression rotates straight back into
    the window instead of hiding behind its past passes (precedent:
    ``window_lag_gap`` passed r1 then crashed r2). Self-maintaining:
    each round's driver output rotates the next round's window with no
    hand-edited name lists (rounds 1-3 kept frozensets here; round 4
    derives them)."""
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_pass: dict[str, int] = {}
    latest_checked: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    not row.get("err")
                    and bool(row.get("rows_match"))
                    and bool(row.get("schema_match"))
                    and bool(row.get("hash_match"))
                )
            if ok:
                latest_pass[name] = max(latest_pass.get(name, 0), rnd)
            if rnd >= latest_checked.get(name, (0, False))[0]:
                latest_checked[name] = (rnd, ok)
    return {
        name: rnd
        for name, rnd in latest_pass.items()
        if latest_checked[name][1]  # most recent check passed
    }


def ordered_queries() -> dict[str, QueryFn]:
    """``QUERIES`` reordered so the driver's correctness window is spent
    on unproven entries first.

    The driver hash-checks only the first 50 entries of
    ``__spark_entry__.queries()`` in iteration order. Sort key: the
    latest round in which the driver proved the entry
    (:func:`_verified_rounds`), ascending — never-proven entries
    (including ones added this round, and any that ever hash-failed)
    sort to 0 and are checked first, then the least-recently-proven.
    Registration order breaks ties (stable sort), so each round's
    checked set is deterministic and the union over rounds converges to
    — then maintains — full catalog coverage."""
    proven = _verified_rounds()
    names = sorted(QUERIES, key=lambda n: proven.get(n, 0))
    return {n: QUERIES[n] for n in names}
