"""truncate_lineage: localCheckpoint on plain sessions, RELIABLE
checkpoint when a checkpoint dir is configured — the preemptible-
cluster upgrade every iterative operator gets for free."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from virapipe_spark.scale import truncate_lineage


class TestTruncateLineage:
    def test_local_fallback_without_dir(self, spark):
        assert spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()
        out = truncate_lineage(spark.range(10).withColumn("v", F.col("id") * 2))
        assert out.count() == 10

    def test_reliable_when_dir_configured(self, spark, tmp_path):
        sc = spark.sparkContext
        d = str(tmp_path / "ckpt")
        sc.setCheckpointDir(d)
        try:
            out = truncate_lineage(
                spark.range(20).withColumn("v", F.col("id") + 1)
            )
            assert out.count() == 20
            # reliable checkpoints materialize files under the dir
            found = [
                f
                for root, _, files in os.walk(d)
                for f in files
                if not f.startswith(".")
            ]
            assert found, "no reliable checkpoint files written"
            # BFS still correct under reliable checkpointing (dist
            # frame checkpoints each round with checkpoint_every=1)
            from virapipe_spark.graph import bfs_hops

            edges = spark.createDataFrame(
                [(0, 1), (1, 2), (2, 3)], ["src", "dst"]
            )
            srcs = spark.createDataFrame([(0,)], ["node"])
            got = {
                r["node"]: r["dist"]
                for r in bfs_hops(
                    edges, srcs, max_hops=3, checkpoint_every=1
                ).collect()
            }
            assert got == {0: 0, 1: 1, 2: 2, 3: 3}
        finally:
            # restore the no-dir state so the shared session's other
            # tests keep the localCheckpoint fast path
            setter = getattr(sc._jsc.sc(), "checkpointDir_$eq")
            setter(sc._jvm.scala.Option.empty())
        assert sc._jsc.sc().getCheckpointDir().isEmpty()
