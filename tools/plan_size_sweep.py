"""Plan-size sweep: build every catalog entry's frame and report the
explain("formatted") line count — the cheap detector for the
docs_greedy_coverage failure class (r12: persist-only iterative loops
whose LOGICAL tree grows combinatorially; that entry hit 8,427 plan
lines / 920 Exchanges while every healthy entry stays in the low
hundreds). Plans only — no execution beyond whatever collect jobs an
entry runs at construction.

Usage: python tools/plan_size_sweep.py [--sf SF_DIR] [--top N]
"""
from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from virapipe_spark import catalog
from virapipe_spark.session import session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    catalog.load_all()
    spark = session(app_name="plan_size_sweep")
    sizes = {}
    for name, fn in sorted(catalog.QUERIES.items()):
        try:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            sizes[name] = buf.getvalue().count("\n")
        except Exception as exc:  # surface, keep sweeping
            print(f"ERR   {name}: {type(exc).__name__}: {exc}")
    for name, n in sorted(sizes.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{n:7d}  {name}")
    print(f"{len(sizes)} plans built; median "
          f"{sorted(sizes.values())[len(sizes) // 2]} lines")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
