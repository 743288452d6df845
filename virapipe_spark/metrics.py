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

    Scale shape: one global sort of the per-contig LENGTHS only (a long
    per contig — the sort payload is 8 bytes/row regardless of contig
    size), one running-sum window over that order, one filter + limit.
    Assemblies are ~10^5..10^7 contigs — trivial for a range-partitioned
    sort; the expensive thing (contig text) never moves."""
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
    w = Window.orderBy(F.col("__len").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = lens.select("__len", F.sum("__len").over(w).alias("__cum"))
    n50 = (
        ranked.crossJoin(total.select(F.col("total_bp").alias("__t")))
        .filter(F.col("__cum") * 2 >= F.col("__t"))
        .orderBy(F.col("__len").desc())
        .select(F.col("__len").alias("n50"))
        .limit(1)
    )
    return total.crossJoin(n50)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c
