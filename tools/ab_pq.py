"""Interleaved A/B: embed_knn_pq block-distance expression shape.

A = production (_pq_block_dist: aggregate over an index sequence with
element_at on both arrays). B = slice+zip_with (slice each 8-dim block
once, zip the two slices, aggregate the squared diffs) — fewer nested
element_at nodes, potentially smaller codegen.

Protocol per SCALE.md: interleaved reps in ONE session, medians compared;
this VM swings +-15-50% across sessions, so only same-session deltas count.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column
from pyspark.sql import functions as F

from virapipe_spark import catalog
from virapipe_spark.queries import extensions as X
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 7


def slice_block_dist(qc: Column, cw: Column, m: Column) -> Column:
    a = F.slice(qc, (m - 1) * X._PQ_D + 1, X._PQ_D)
    b = F.slice(cw, (m - 1) * X._PQ_D + 1, X._PQ_D)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def main() -> None:
    catalog.load_all()
    spark = session(app_name="ab_pq", shuffle_partitions=8)
    orig = X._pq_block_dist

    def run(tag, fn):
        X._pq_block_dist = fn
        t0 = time.perf_counter()
        X.embed_knn_pq(spark, SF).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        X._pq_block_dist = orig
        return dt

    # verify B matches A row-for-row first
    X._pq_block_dist = slice_block_dist
    b_rows = sorted(map(tuple, X.embed_knn_pq(spark, SF).collect()))
    X._pq_block_dist = orig
    a_rows = sorted(map(tuple, X.embed_knn_pq(spark, SF).collect()))
    assert a_rows == b_rows, "variants disagree"
    print(f"variants agree on {len(a_rows)} rows")

    times = {"A_element_at": [], "B_slice_zip": []}
    for rep in range(REPS):
        times["A_element_at"].append(run("A", orig))
        times["B_slice_zip"].append(run("B", slice_block_dist))
    for tag, ts in times.items():
        print(f"{tag}: median {statistics.median(ts):.3f}s  {[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
