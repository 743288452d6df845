"""Decade-out smoke: run named catalog entries at a base dir and an
N-fold synthetic (tools/make_scale_synth.py), print wall-clock ratios.

Single runs, completion + scaling only (no oracle coupling) — the
round-10 protocol. The FIRST entry absorbs session warmup; a separate
throwaway warm query is run first so no entry eats it. Run on a QUIET
box (no concurrent gate/pytest) or the ratios are ambient noise.

``--reps N`` (default 1) runs each entry N times per directory,
INTERLEAVED (base, synth, base, synth, ...), and reports per-dir
minima — single base-first runs charge the entry's first-use costs
(codegen, UDF init) to the base column and bias ratios down (the r12
skew smoke measured 0.4-0.5 "ratios" that were really warmup).

Usage:
    python tools/run_scale_smoke.py [--reps N] [base_dir] [synth_dir] name ...
    # default dirs: /root/testdata/sf0.1 /tmp/sf1.0-synth
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from virapipe_spark import catalog  # noqa: E402
from virapipe_spark.session import session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    base = args[0] if args else "/root/testdata/sf0.1"
    synth = args[1] if len(args) > 1 else "/tmp/sf1.0-synth"
    names = args[2:]
    catalog.load_all()
    spark = session(app_name="scale_smoke")
    # warmup: pay JVM/codegen/session costs outside any timed entry
    catalog.table(spark, base, "lineitem").count()

    print("| entry | base | synth | t-ratio | base_rows | synth_rows |")
    print("|---|---|---|---|---|---|")
    for name in names:
        fn = catalog.QUERIES[name]
        times: dict[str, list[float]] = {base: [], synth: []}
        rows: dict[str, int] = {}
        failed = False
        for _ in range(reps):
            for d in (base, synth):
                t0 = time.perf_counter()
                try:
                    rows[d] = fn(spark, d).count()
                except Exception as e:  # noqa: BLE001
                    msg = str(e).replace("|", "/").replace("\n", " ")[:120]
                    print(f"| {name} | FAILED@{d}: {msg} | — | — | — | — |")
                    failed = True
                    break
                times[d].append(time.perf_counter() - t0)
            if failed:
                break
        if failed:
            continue
        tb, ts = round(min(times[base]), 1), round(min(times[synth]), 1)
        ratio = round(ts / tb, 1) if tb > 0 else float("inf")
        print(
            f"| {name} | {tb} s | {ts} s | {ratio} "
            f"| {rows[base]} | {rows[synth]} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
