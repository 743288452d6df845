"""Generic SQL pass-through — the reference's flagship query surface.

The reference exposes exactly this in three programs: register the
scanned records under a user-chosen view name (default ``records``) and
hand an arbitrary SQL string to Catalyst (reference
``SQLQueryFastq.java:92-99``, ``SQLQueryBAM.java:69-73``,
``SQLQueryBlast.java:100-106``). Query planning is 100% delegated to
Spark; no rewrite happens here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from virapipe_spark.schemas import DEFAULT_TABLE


def sql(df: DataFrame, query: str, table: str = DEFAULT_TABLE) -> DataFrame:
    """Run ``query`` against ``df`` registered as view ``table``.

    Mirrors ``registerTempTable(tablename); sqlContext.sql(query)``
    (reference ``SQLQueryFastq.java:92,99``). The view persists in the
    session afterwards, as in the reference.
    """
    df.createOrReplaceTempView(table)
    return df.sparkSession.sql(query)
