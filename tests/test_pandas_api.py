"""pandas-on-Spark API surface (pyspark.pandas): the dataframe dialect
pandas users reach for first runs on the same engine — checked against
the native DataFrame result so the two dialects provably agree."""

from __future__ import annotations


class TestPandasOnSpark:
    def test_pandas_api_agrees_with_native(self, spark):
        import pyspark.pandas as ps
        from pyspark.sql import functions as F

        sdf = spark.range(100).select(
            (F.col("id") % 7).alias("k"), (F.col("id") * 2).alias("v")
        )
        native = {
            r["k"]: r["s"]
            for r in sdf.groupBy("k").agg(F.sum("v").alias("s")).collect()
        }
        psdf = sdf.pandas_api()
        got = psdf.groupby("k")["v"].sum().to_dict()
        assert got == native
        # value_counts — the pandas idiom with no direct F.* spelling
        vc = psdf["k"].value_counts().to_dict()
        assert vc[0] == 15 and vc[1] == 15 and vc[6] == 14
