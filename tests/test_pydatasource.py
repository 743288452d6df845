"""Python DataSource API: registration, schema, partition planning,
deterministic content vs the pure-python reference."""

from __future__ import annotations

from virapipe_spark.pydatasource import SyntheticReadsDataSource, synth_read


class TestPythonDataSource:
    def test_reads_match_reference_and_partitioning(self, spark):
        spark.dataSource.register(SyntheticReadsDataSource)
        df = (
            spark.read.format("synthetic_reads")
            .option("n", 50)
            .option("partitions", 4)
            .option("read_len", 48)
            .load()
        )
        assert df.schema.simpleString() == (
            "struct<read_id:bigint,name:string,bases:string,quality:string>"
        )
        rows = {r["read_id"]: r for r in df.collect()}
        assert len(rows) == 50
        for i in (0, 7, 49):
            rid, name, bases, qual = synth_read(i, 48)
            assert rows[i]["name"] == name
            assert rows[i]["bases"] == bases
            assert rows[i]["quality"] == qual
            assert len(rows[i]["bases"]) == 48

    def test_feeds_existing_operators(self, spark):
        """The source plugs straight into the quality-filter operator
        family — proving custom connectors compose with the engine."""
        from virapipe_spark.functions import avg_quality

        spark.dataSource.register(SyntheticReadsDataSource)
        df = (
            spark.read.format("synthetic_reads")
            .option("n", 40)
            .option("partitions", 2)
            .load()
        )
        out = df.select(avg_quality("quality").alias("aq")).collect()
        assert len(out) == 40
        assert all(r["aq"] > 0 for r in out)


    def test_empty_source_yields_zero_rows(self, spark):
        spark.dataSource.register(SyntheticReadsDataSource)
        df = spark.read.format("synthetic_reads").option("n", 0).load()
        assert df.count() == 0
