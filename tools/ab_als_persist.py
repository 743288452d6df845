"""Interleaved A/B: embed_als_factorize's shared-subtree persists.

A (old): no persist — vf (init item factors) feeds THREE consumers
(user-solve join, s0, s1) and uf1 (the applyInPandas user half-step)
feeds three more (item-solve join, s1, s2); each consumer re-ran the
init distinct-shuffle and, for uf1, the whole grouped ridge solve
through the Python boundary.

B (new, r12): vf.persist() + uf1.persist() — the computed results are
shared across the final plan's subtrees with no extra materialization
job (guide §5: reused AND expensive to recompute).

The ONLY .persist() calls on the embed_als_factorize path are the two
added in r12 (ratings' lazy localCheckpoint does not route through
DataFrame.persist), so variant A is reproduced exactly by no-op'ing
DataFrame.persist around the entry call. Equality asserted on the full
output first; interleaved same-session reps, median decides.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from virapipe_spark import catalog
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_REAL_PERSIST = DataFrame.persist


def run_entry(spark, cached: bool):
    if not cached:
        DataFrame.persist = lambda self, *a, **k: self
    try:
        fn = catalog.QUERIES["embed_als_factorize"]
        return fn(spark, SF)
    finally:
        DataFrame.persist = _REAL_PERSIST


def main():
    catalog.load_all()
    spark = session(app_name="ab_als_persist")
    variants = {
        "old(no-persist)": lambda: run_entry(spark, cached=False),
        "new(persist)": lambda: run_entry(spark, cached=True),
    }
    a = sorted(tuple(r) for r in variants["old(no-persist)"]().collect())
    b = sorted(tuple(r) for r in variants["new(persist)"]().collect())
    assert a == b and a, "outputs differ!"
    print(f"output rows: {len(a)} (identical)")
    times = {k: [] for k in variants}
    for _ in range(7):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"als {k}: {xs} -> median {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
