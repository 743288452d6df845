"""Genomic interval overlap join — the bedtools-intersect primitive.

The reference has no interval algebra (its BLAST-tab overlap filter,
BlastNFilter.java:172-192, is a per-row ratio, not a join); every
annotation task downstream of :func:`io.read_gff` / :func:`io.read_vcf`
needs one: features × alignments, variants × genes, peaks × promoters.

Spark has no interval-join primitive either, and the naive formulation
``a.start <= b.end AND b.start <= a.end`` is a theta join — a
BroadcastNestedLoopJoin or CartesianProduct, O(|A|·|B|) at scale. The
scale shape here is the standard bin decomposition (the same
equi-join-ification the events range join uses for time, applied to
genome coordinates):

- each interval explodes to the fixed-width bins it touches —
  ``floor(start/W) .. floor(end/W)`` on its sequence;
- candidates equi-join on ``(seq, bin)`` — a plain shuffled hash join,
  partitioned across the cluster by genome region;
- the exact inclusive-overlap predicate filters candidates;
- **each overlapping pair matches exactly once with NO distinct**: the
  join keeps only the bin containing ``greatest(a.start, b.start)`` —
  the overlap's leftmost point. A pair sharing k bins would otherwise
  appear k times; conditioning on the overlap-start bin is a filter,
  not a dedup shuffle.

Shuffle volume is Σ interval-length/W per side — tune ``bin_size`` to
the data (reads: ~1e4; whole-gene features: ~1e5). A chromosome-length
interval explodes into len/W bin rows; for pathological inputs raise
``bin_size`` or pre-split giants upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _binned(df: DataFrame, seq: str, start: str, end: str, w: int) -> DataFrame:
    b0 = F.floor(F.col(start) / w).cast("long")
    b1 = F.floor(F.col(end) / w).cast("long")
    return df.withColumn("__bin", F.explode(F.sequence(b0, b1)))


def overlap_join(
    a: DataFrame,
    b: DataFrame,
    seq_col: str = "seqid",
    start_col: str = "start",
    end_col: str = "end",
    bin_size: int = 10_000,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All pairs of rows whose ``[start, end]`` intervals overlap on the
    same ``seq_col`` sequence (1-based INCLUSIVE coordinates — GFF/SAM
    convention, so ``[1,10]`` and ``[10,20]`` DO overlap at base 10).

    Returns every column of both inputs, shared names suffixed with
    ``suffixes``. Exactly one output row per overlapping pair (see
    module docstring for why no ``distinct`` is needed). Intervals with
    ``end < start`` produce no candidates (``sequence(b0,b1)`` would
    descend; they are filtered out, matching the "malformed rows null
    out" reader convention rather than raising mid-join).
    """
    sa, sb = suffixes

    def _side(df: DataFrame, suffix: str) -> DataFrame:
        renames = {
            c: c + suffix for c in df.columns if c in set(a.columns) & set(b.columns)
        }
        out = df.filter(F.col(end_col) >= F.col(start_col))
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return out

    left = _binned(
        _side(a, sa), seq_col + sa, start_col + sa, end_col + sa, bin_size
    )
    right = _binned(
        _side(b, sb), seq_col + sb, start_col + sb, end_col + sb, bin_size
    )

    def col(name: str, suffix: str) -> Column:
        return F.col(name + suffix)

    overlap_start_bin = F.floor(
        F.greatest(col(start_col, sa), col(start_col, sb)) / bin_size
    ).cast("long")
    joined = left.join(
        right,
        (col(seq_col, sa) == col(seq_col, sb))
        & (left["__bin"] == right["__bin"])
        & (col(start_col, sa) <= col(end_col, sb))
        & (col(start_col, sb) <= col(end_col, sa))
        & (left["__bin"] == overlap_start_bin),
    )
    return joined.drop("__bin")


def merge_overlapping(
    df: DataFrame,
    seq_col: str = "seqid",
    start_col: str = "start",
    end_col: str = "end",
    gap: int = 0,
) -> DataFrame:
    """Collapse overlapping intervals into maximal merged spans per
    sequence (bedtools ``merge``): returns ``(seq, start, end,
    n_merged)`` with one row per span.

    ``gap`` is the maximum separation (in bases) still merged: 0 merges
    only overlapping-or-touching intervals (``start <= running_end``,
    inclusive coordinates); ``gap=1`` also merges book-ended neighbors.

    Gaps-and-islands in one ranking window: sort by start within each
    sequence, carry the running max of ``end`` over preceding rows, open
    a new island when the current start clears it by more than ``gap``,
    and number islands with a running sum of the open-flags. Two window
    passes + one grouped agg, all map-side-combinable.

    Scale: the window partitions by ``seq_col`` — per-chromosome
    parallelism (~10² partitions on a genome). A single monster
    sequence serializes its own partition; for that shape pre-chunk the
    sequence into ranges, merge per chunk, and stitch the chunk
    boundaries with one extra pass (same trick as scale.topk_per_group's
    two-phase split)."""
    w = Window.partitionBy(seq_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max.isNull() | (F.col(start_col) > prev_max + F.lit(int(gap))),
        F.lit(1),
    ).otherwise(F.lit(0))
    island = F.sum(opens).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__island", island)
        .groupBy(seq_col, "__island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count("*").alias("n_merged"),
        )
        .drop("__island")
    )


def coverage(
    df: DataFrame,
    seq_col: str = "seqid",
    start_col: str = "start",
    end_col: str = "end",
    bin_size: int = 1_000,
) -> DataFrame:
    """Per-bin interval coverage (bedtools ``genomecov`` at bin
    resolution): ``(seq, bin_start, bin_end, n_intervals)`` — how many
    input intervals touch each ``bin_size``-wide genome window.

    The same bin explode as :func:`overlap_join` feeding a plain
    count aggregate: explode is fused with the scan, the shuffle
    carries one partial count per touched (seq, bin) — bounded by
    genome-size/bin_size, independent of read count. The 100 TB shape
    for depth-of-coverage rollups."""
    binned = _binned(
        df.filter(F.col(end_col) >= F.col(start_col)),
        seq_col,
        start_col,
        end_col,
        bin_size,
    )
    return (
        binned.groupBy(seq_col, "__bin")
        .agg(F.count("*").alias("n_intervals"))
        .select(
            seq_col,
            (F.col("__bin") * bin_size).alias("bin_start"),
            (F.col("__bin") * bin_size + bin_size - 1).alias("bin_end"),
            "n_intervals",
        )
    )


def subtract(
    a: DataFrame,
    b: DataFrame,
    seq_col: str = "seqid",
    start_col: str = "start",
    end_col: str = "end",
    id_col: str = "id",
    bin_size: int = 10_000,
) -> DataFrame:
    """Interval subtraction (bedtools ``subtract``): each ``a`` interval
    minus the union of ``b``, emitted as its surviving sub-segments
    ``(id, seq, seg_start, seg_end)`` — zero rows for a fully covered
    interval, the untouched interval verbatim when nothing overlaps.
    Completes the interval algebra with :func:`overlap_join`,
    :func:`merge_overlapping`, and :func:`coverage`.

    Shape: ``b`` first collapses to disjoint spans
    (:func:`merge_overlapping` — so per ``a`` row the overlapping
    blocks are non-overlapping and sortable), candidates come from the
    binned :func:`overlap_join` (never an unblocked pair), and the
    complement segments fall out of one per-``a`` lag window over the
    clipped blocks: gap-before-each-block plus the trailing gap, empty
    segments filtered, non-overlapped ``a`` rows restored by anti-join.

    Scale: merge is per-sequence windows; the candidate join is the
    bin-decomposed equi-join; the segment window partitions by the FULL
    a-interval identity ``(id, seq, start, end)`` — ids need not be
    globally unique — with parallelism = interval count and partition
    size = blocks per interval (bounded by interval length / typical
    span). Exact duplicate ``a`` rows collapse to one segment set
    (their blocks land in one window partition)."""
    mb = merge_overlapping(b, seq_col, start_col, end_col).select(
        seq_col, start_col, end_col
    )
    ov = overlap_join(
        a.select(id_col, seq_col, start_col, end_col),
        mb,
        seq_col,
        start_col,
        end_col,
        bin_size=bin_size,
    )
    sa, ea = start_col + "_a", end_col + "_a"
    sb, eb = start_col + "_b", end_col + "_b"
    clipped = ov.select(
        id_col,
        F.col(seq_col + "_a").alias(seq_col),
        F.col(sa),
        F.col(ea),
        F.greatest(F.col(sb), F.col(sa)).alias("bs"),
        F.least(F.col(eb), F.col(ea)).alias("be"),
    )
    # partition by the FULL a-interval identity, not id alone: ids need
    # not be globally unique (same id on two seqids, duplicate rows) and
    # blocks from two different a-intervals must never interleave in one
    # lag window (ADVICE r6)
    w = Window.partitionBy(id_col, seq_col, sa, ea).orderBy("bs")
    gaps = clipped.select(
        id_col,
        seq_col,
        F.coalesce(F.lag("be").over(w) + 1, F.col(sa)).alias("seg_start"),
        (F.col("bs") - 1).alias("seg_end"),
    )
    trailing = clipped.groupBy(id_col, seq_col, sa, ea).agg(
        F.max("be").alias("last_be")
    ).select(
        id_col,
        seq_col,
        (F.col("last_be") + 1).alias("seg_start"),
        F.col(ea).alias("seg_end"),
    )
    untouched = (
        a.select(id_col, seq_col, start_col, end_col)
        .filter(F.col(end_col) >= F.col(start_col))
        .join(
            # anti-join on the full identity too: an id overlapped on
            # one seqid must not drop the same id's untouched interval
            # on another
            ov.select(
                id_col,
                F.col(seq_col + "_a").alias(seq_col),
                F.col(sa).alias(start_col),
                F.col(ea).alias(end_col),
            ).distinct(),
            [id_col, seq_col, start_col, end_col],
            "left_anti",
        )
        .select(
            id_col,
            seq_col,
            F.col(start_col).alias("seg_start"),
            F.col(end_col).alias("seg_end"),
        )
    )
    return (
        gaps.unionAll(trailing)
        .filter(F.col("seg_start") <= F.col("seg_end"))
        .unionAll(untouched)
    )


def depth_histogram(
    iv: DataFrame,
    seq_col: str = "seqid",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Exact per-base DEPTH-OF-COVERAGE histogram (the `samtools
    depth | sort | uniq -c` shape): for every (seqid, depth > 0), how
    many bases are covered by exactly `depth` intervals. Ends are
    INCLUSIVE (the convention of this module's fixtures).

    The diff-array / sweep-line formulation: +1 at start, -1 at
    end+1, pre-aggregate deltas per position (making positions unique
    per seqid, so the window sort is total without a tiebreak), prefix
    sum = depth of the segment [pos, next_pos), histogram by summing
    segment lengths. Never materializes per-base rows — cost is
    O(breakpoints), not O(genome length).

    Scale: one union + one (seq, pos) partial-aggregated shuffle, one
    seq-partitioned ordered window, one (seq, depth) rollup — all keys
    bounded by breakpoint count. A chromosome is one window partition;
    for extreme single-contig skew, range-partition the prefix sum by
    position block and carry block offsets (the standard distributed
    prefix-sum refinement)."""
    ev = iv.select(
        F.col(seq_col).alias("seqid"),
        F.col(start_col).alias("pos"),
        F.lit(1).alias("d"),
    ).unionByName(
        iv.select(
            F.col(seq_col).alias("seqid"),
            (F.col(end_col) + 1).alias("pos"),
            F.lit(-1).alias("d"),
        )
    )
    ag = ev.groupBy("seqid", "pos").agg(F.sum("d").alias("delta"))
    w = Window.partitionBy("seqid").orderBy("pos")
    seg = ag.withColumn(
        "depth",
        F.sum("delta").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("seg_len", F.lead("pos").over(w) - F.col("pos"))
    return (
        seg.filter((F.col("depth") > 0) & F.col("seg_len").isNotNull())
        .groupBy("seqid", "depth")
        .agg(F.sum("seg_len").cast("long").alias("n_bases"))
        .select("seqid", F.col("depth").cast("long").alias("depth"), "n_bases")
    )
