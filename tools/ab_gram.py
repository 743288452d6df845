"""Interleaved A/B: the spectral family's Gram-matrix subtree
(extensions._gram) with vs without localCheckpoint. The Gram table
feeds every power-iteration round plus the per-vector moment joins —
2-4 consumers per entry — and is a SHUFFLE aggregate, so the
pagerank-edges/setsim-sets precedent predicts checkpoint wins; this
script verifies rather than assumes (the IVF counter-example is why)."""
import statistics
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F
from virapipe_spark.session import session
from virapipe_spark.queries import extensions as ext

SF = "/root/testdata/sf0.1"


def run(spark, checkpoint: bool):
    orig = ext.truncate_lineage
    if not checkpoint:
        ext.truncate_lineage = lambda df, eager=True: df  # identity
    try:
        df = ext.embed_abtt_residual(spark, SF)
        df.write.format("noop").mode("overwrite").save()
    finally:
        ext.truncate_lineage = orig


def main():
    spark = session(app_name="ab_gram", shuffle_partitions=32)
    times = {False: [], True: []}
    for rep in range(7):
        for ck in (False, True):
            t0 = time.time()
            run(spark, ck)
            times[ck].append(time.time() - t0)
    for ck, ts in times.items():
        print(("checkpoint" if ck else "recompute "),
              [round(t, 2) for t in ts], "median", round(statistics.median(ts), 2))
    spark.stop()


if __name__ == "__main__":
    main()
