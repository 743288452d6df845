"""Scale utilities: skew-safe joins and co-located (bucketed) joins.

These are the knobs a 100 TB deployment turns when the default
shuffle-hash/sort-merge plan hits a pathological key distribution.
AQE's skew-join split (on by default in session.py) handles moderate
skew at runtime; :func:`salted_join` is the explicit fallback for the
extreme case — one key owning a double-digit percentage of the fact
table — where even a split partition overwhelms its executor.

No reference counterpart (the reference never joins at scale; its RDD
``leftOuterJoin`` at BlastNFilter.java:172 runs on per-sample data) —
this module exists for the 100 TB design bar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side.

    The fact table's join key is suffixed with a uniform salt in
    [0, n_salts); the dim side is exploded ×n_salts so every salted key
    finds its match. A key that owned one shuffle partition now spreads
    over ``n_salts`` partitions; the dim side grows ×n_salts, so use
    this when dim ≪ fact (the usual skew shape: huge fact, modest dim,
    one hot key).

    Output columns = fact columns + dim columns minus the dim's join key
    (same shape as ``fact.join(dim, key, how)``).
    """
    salt = F.floor(F.rand(seed=42) * n_salts).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    joined = f.join(d, on=[key, "__salt"], how=how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist a table bucketed+sorted by its join key, so future joins
    on ``key`` between co-bucketed tables skip the shuffle entirely
    (SortMergeJoin over pre-sorted buckets, zero Exchange — asserted in
    tests/test_scale_plans.py).

    This is the 100 TB answer to a fact-fact join both of whose sides
    are reused across queries: pay the shuffle once at write time,
    amortize it over every subsequent join/aggregation on the key.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)
