"""Interleaved A/B: the `_adaptive_ranged` scaffold's checkpoint.

A (old): each ranging pass ran an EAGER reliable checkpoint (a
dedicated materialization job) and THEN the per-range stats collect —
three jobs per pass counting the range-sampling job.

B (new, r12): LAZY checkpoint; the stats collect (a FULL action — one
aggregate row per partition consumes every partition) materializes it
in the same job, freezing the range partitioning at the same point.

The scaffold backs two_phase_rank, two_phase_prefix_agg and
KeyedRanges — every exact global-order/running-agg rewrite in the
catalog — so the A/B drives the REAL scale.two_phase_rank with
`scale._adaptive_ranged` swapped between the committed (new) version
and an inline copy of the old one. Fixture: the events_rfm_segments
triple rank (three scaffold passes per run). Equality asserted on the
full segmentation first.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from virapipe_spark import catalog, scale
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_NEW_RANGED = scale._adaptive_ranged


def _adaptive_ranged_old(df, order, stat_exprs, num_partitions,
                         target_rows_per_range):
    """The pre-r12 scaffold, verbatim: eager checkpoint then collect."""
    spark = df.sparkSession

    def _pass(src: DataFrame, p: int):
        ranged = truncate_lineage(
            src.repartitionByRange(p, *order).withColumn(
                "__pid", F.spark_partition_id()
            ),
            reliable=True,
        )
        stats = {
            r["__pid"]: r
            for r in ranged.groupBy("__pid").agg(*stat_exprs).collect()
        }
        return ranged, stats

    floor_p = max(int(spark.sparkContext.defaultParallelism), 1)
    ranged, stats = _pass(df, num_partitions or floor_p)
    if num_partitions is None:
        total_rows = sum(r["c"] for r in stats.values())
        need = max(
            floor_p, -(-total_rows // max(target_rows_per_range, 1))
        )
        if need > floor_p:
            ranged, stats = _pass(ranged.drop("__pid"), need)
    return ranged, stats


def run_rfm(spark, lazy: bool):
    scale._adaptive_ranged = _NEW_RANGED if lazy else _adaptive_ranged_old
    try:
        return catalog.QUERIES["events_rfm_segments"](spark, SF)
    finally:
        scale._adaptive_ranged = _NEW_RANGED


def main():
    catalog.load_all()
    spark = session(app_name="ab_ranged_lazyckpt")
    a = sorted(tuple(r) for r in run_rfm(spark, lazy=False).collect())
    b = sorted(tuple(r) for r in run_rfm(spark, lazy=True).collect())
    assert a == b and a, "segmentations differ!"
    print(f"rfm rows: {len(a)} (identical)")
    times = {"old(eager)": False, "new(lazy-fuse)": True}
    res = {k: [] for k in times}
    for _ in range(7):
        for k, lazy in times.items():
            t0 = time.perf_counter()
            run_rfm(spark, lazy=lazy).write.format("noop").mode(
                "overwrite"
            ).save()
            res[k].append(time.perf_counter() - t0)
    for k, xs in res.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"rfm {k}: {xs} -> median {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
