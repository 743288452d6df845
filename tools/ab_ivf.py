"""A/B harness for embed_knn_ivf's shared-assignment materialization
(VERDICT r04 "What's wrong #3": the r04 switch from persist() to
localCheckpoint(eager=False) coincided with 0.60 -> 0.80 s at sf0.1).

Measures the PRODUCTION pipeline (extensions._ivf_topk) under each
strategy — same protocol as tools/ab_minhash.py (warm-up, median of
reps, full rep list printed; winner recorded in SCALE.md §IVF and set
as extensions._IVF_MAT):

- checkpoint: localCheckpoint(eager=False). Blocks freed by the
  ContextCleaner when the result is unreferenced; pays a partition
  serialization at first materialization.
- persist: StorageLevel default. In-memory relation reuse, but a
  catalog callable can't unpersist after its caller's action, so cache
  pins per invocation ("already cached" warnings across bench reps in
  r03). To keep reps comparable we explicitly unpersist between reps
  here — the bench can't, which is the checkpoint rationale.
- none: no materialization — the centroid broadcast + per-vector window
  recomputes once per consumer (2 BNLJ in the plan).

Usage: python tools/ab_ivf.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from virapipe_spark.queries.extensions import _ivf_topk
from virapipe_spark.session import session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = session(app_name="ab_ivf")
    modes = ["checkpoint", "persist", "none"]
    # warm-up: JVM/codegen/parquet-footer caches
    for m in modes:
        _ivf_topk(spark, sf_dir, mode=m).count()
        spark.catalog.clearCache()
    results = {}
    for m in modes:
        times, rows = [], None
        for _ in range(reps):
            t0 = time.time()
            rows = _ivf_topk(spark, sf_dir, mode=m).count()
            times.append(time.time() - t0)
            if m == "persist":
                spark.catalog.clearCache()
        results[m] = (statistics.median(times), rows, times)
    for m, (med, rows, times) in results.items():
        print(
            f"{m}: median {med:.3f}s rows={rows} "
            f"[{', '.join(f'{t:.3f}' for t in times)}]"
        )
    spark.stop()


if __name__ == "__main__":
    main()
