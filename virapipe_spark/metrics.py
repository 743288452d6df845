"""Assembly / sequence-set summary metrics.

The reference assembles contigs (MegaHit stage, virapipe.sh:47) but
never evaluates the assembly; N50 and friends are the standard
assessment every assembly pipeline reports (public convention:
N50 = the length L such that contigs of length >= L cover at least
half the total assembled bases).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gc_content(sequence: Column | str) -> Column:
    """Fraction of G/C bases in [0, 1] (double; null for empty
    sequences). Case-insensitive; non-ACGT characters count toward the
    denominator (the permissive convention — ambiguity codes dilute).
    One translate+length pass, fully codegen'd: GC fraction =
    (len - len_without_GC_removed) / len via translate-delete."""
    s = F.upper(_col(sequence))
    n = F.length(s)
    gc = n - F.length(F.translate(s, "GC", ""))
    return F.when(n > 0, gc.cast("double") / n)


def assembly_stats(
    contigs: DataFrame, length_col: Column | str | None = None,
    sequence_col: str = "sequence",
) -> DataFrame:
    """One-row assembly summary: ``n_contigs, total_bp, max_len,
    mean_len, n50``.

    ``length_col`` defaults to ``length(sequence_col)``. N50 by the
    standard definition: sort lengths descending, take the first length
    at which the running sum reaches half the total.

    Scale shape: the running sum is a TWO-LEVEL prefix sum, not one
    global-ordered window (that plan carries a "No Partition Defined"
    WindowExec — every row on one executor). Lengths aggregate into
    fixed-width buckets (``__len div _N50_BUCKET``); the bucket summary
    (≤ max_len/_N50_BUCKET rows — thousands, not millions) takes the
    only unpartitioned window to derive each bucket's base offset (sum
    of all longer buckets); the base broadcast-joins back and the
    per-row cumulative sum runs in a window PARTITIONED by bucket. Same
    pattern as io.read_fastq's block index: global order reconstructed
    from a tiny summary + partition-local windows, nothing ever funnels
    to a single task. Ties within a bucket don't affect the answer —
    equal lengths yield the same candidate length wherever the
    half-total threshold lands inside the tie run."""
    length = (
        F.length(F.col(sequence_col)) if length_col is None else _col(length_col)
    ).cast("long")
    lens = contigs.select(length.alias("__len"))
    total = lens.agg(
        F.count("*").alias("n_contigs"),
        F.sum("__len").alias("total_bp"),
        F.max("__len").alias("max_len"),
        F.round(F.avg("__len"), 2).alias("mean_len"),
    )
    lens_b = lens.withColumn("__b", F.expr(f"__len div {_N50_BUCKET}"))
    wb = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = (
        lens_b.groupBy("__b")
        .agg(F.sum("__len").alias("__bsum"))
        .select(
            "__b",
            F.coalesce(F.sum("__bsum").over(wb), F.lit(0)).alias("__base"),
        )
    )
    wr = (
        Window.partitionBy("__b")
        .orderBy(F.col("__len").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = lens_b.join(F.broadcast(bases), "__b").select(
        "__len", (F.col("__base") + F.sum("__len").over(wr)).alias("__cum")
    )
    n50 = (
        ranked.crossJoin(total.select(F.col("total_bp").alias("__t")))
        .filter(F.col("__cum") * 2 >= F.col("__t"))
        .orderBy(F.col("__len").desc())
        .select(F.col("__len").alias("n50"))
        .limit(1)
    )
    return total.crossJoin(n50)


#: Bucket width for the N50 two-level prefix sum: the bucket summary
#: holds at most max_contig_len/_N50_BUCKET rows (a 100 Mbp scaffold ->
#: ~100k summary rows, still a trivial single window), while per-row
#: cumulative sums stay partitioned.
_N50_BUCKET = 1024


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def observed(df, name: str, *metrics):
    """Attach an ``Observation`` to ``df`` — Spark's zero-cost pipeline
    telemetry: the named metric expressions are accumulated DURING the
    action that consumes the frame (no second pass, no extra job),
    then read from the returned handle. The production pattern for
    per-stage counters in a 100 TB dataflow — counting filter
    pass-rates or null rates with a separate ``.count()`` would rescan
    the input; an observation rides the existing scan for free.

    Returns ``(instrumented_df, observation)``; read
    ``observation.get`` AFTER an action has run. Default metrics when
    none are given: row count. Works on batch frames (streaming
    queries surface the same metrics through
    ``StreamingQueryProgress.observedMetrics`` instead).
    """
    from pyspark.sql import Observation

    if not metrics:
        metrics = (F.count(F.lit(1)).alias("n_rows"),)
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
