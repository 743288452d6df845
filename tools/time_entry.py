"""Warm per-entry timer: run named catalog entries N times each in one
process (noop sink, guide §1.4) and print per-entry order statistics.

Usage: python tools/time_entry.py [--sf SF_DIR] [--reps N] name [name ...]

Entries alternate rep-by-rep (name1, name2, ..., name1, ...) so ambient
load lands on every entry equally — the same interleaving discipline as
the ab_*.py tools, applied across entries instead of variants. First
rep of each entry is reported separately as the cold number (plan
compile + codegen + any construction-time collect jobs land there).
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from virapipe_spark import catalog
from virapipe_spark.session import session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    catalog.load_all()
    spark = session(app_name="time_entry")
    cold: dict[str, float] = {}
    warm: dict[str, list[float]] = {n: [] for n in args.names}
    for rep in range(args.reps + 1):
        for name in args.names:
            fn = catalog.QUERIES[name]
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            dt = time.perf_counter() - t0
            if rep == 0:
                cold[name] = dt
            else:
                warm[name].append(dt)
    for name in args.names:
        xs = sorted(round(t, 3) for t in warm[name])
        print(
            f"{name}: cold {cold[name]:.3f} warm {xs} "
            f"-> median {statistics.median(xs):.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
