"""r7 watch-item settlement: window_topk_per_group and embed_knn_lsh
read above the uniform noise band in the r6 driver bench (2.15x / 1.98x
their r5 figures) — two consecutive elevated readings trigger this
same-session interleaved repetition run (SCALE.md protocol: only
same-session medians are comparable on this VM).

No code variant is on trial (neither query's plan changed since r5);
the hypothesis is machine load. Interleave the two suspects with a
constant-work NEGATIVE CONTROL (scan_project) x REPS and compare
medians to the r5 driver figures: flat suspects + flat control =>
noise, close the watch; elevated suspects + flat control => real
regression, bisect.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from virapipe_spark import catalog
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 9
R5 = {"window_topk_per_group": 1.05, "embed_knn_lsh": 0.52, "scan_project": 0.17}


def main() -> None:
    catalog.load_all()
    spark = session(app_name="watch_topk_lsh", shuffle_partitions=32)
    names = ["window_topk_per_group", "embed_knn_lsh", "scan_project"]
    times: dict[str, list[float]] = {n: [] for n in names}
    # one warm rep each (codegen/JIT), then interleaved timed reps
    for n in names:
        catalog.QUERIES[n](spark, SF).write.format("noop").mode("overwrite").save()
    for _ in range(REPS):
        for n in names:
            t0 = time.perf_counter()
            catalog.QUERIES[n](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            times[n].append(time.perf_counter() - t0)
    for n in names:
        med = statistics.median(times[n])
        print(
            f"{n}: median {med:.3f}s over {REPS} (r5 driver {R5[n]:.2f}s, "
            f"ratio {med / R5[n]:.2f}) all={['%.2f' % t for t in times[n]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
