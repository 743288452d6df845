"""Genomics scalar functions (SURVEY.md §2.8) as Column-expression builders.

Every function here returns a Catalyst ``Column`` built from JVM built-ins
(``pyspark.sql.functions``) — no Python UDFs — so whole-stage codegen,
predicate pushdown, and vectorization all apply. The only reference
operations that genuinely need Python are the 6-frame ORF scan
(:mod:`virapipe_spark.orf`).

Where the reference implementation carries an off-by-one or similar bug,
the *intended* semantics are implemented and the deviation documented on
the function (see also QUIRKS.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Quality-string functions (phred+33 ASCII, kept as string — SURVEY §1.2)
# ---------------------------------------------------------------------------


def quality_bytes(quality: Column | str) -> Column:
    """``array<int>`` of raw ASCII byte values of the quality string.

    The reference iterates ``quality.getBytes()`` row-at-a-time
    (FastqFilter.java:174-196); here the byte expansion is a codegen'd
    array expression evaluated lazily inside the same stage as its
    consumer, so nothing is materialized.
    """
    q = _col(quality)
    # split('') materializes the char array in one O(n) pass; the
    # per-index substr(i, 1) alternative re-seeks the UTF8 string from
    # its start per char — O(n²) per row, measured 6× slower at sf0.1.
    # Empty strings need the explicit guard: split('','') yields ['']
    # (and sequence(1,0) is DESCENDING → [1,0]), both of which would
    # fabricate phantom zero-bytes.
    arr = F.transform(F.split(q, ""), F.ascii)
    return F.when(F.length(q) > 0, arr).otherwise(F.array().cast("array<int>"))


def avg_quality(quality: Column | str) -> Column:
    """Mean quality byte value (double; null for empty strings).

    Matches ``avgQualityTest``'s accumulator (FastqFilter.java:174-184):
    plain mean over raw ASCII values, no phred-33 offset subtraction.
    """
    q = _col(quality)
    total = F.aggregate(
        quality_bytes(q), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return F.when(F.length(q) > 0, total / F.length(q))


def low_quality_count(quality: Column | str, threshold: int) -> Column:
    """Count of quality bytes strictly below ``threshold``
    (``lowQCountTest``, FastqFilter.java:186-196)."""
    q = _col(quality)
    return F.size(F.filter(quality_bytes(q), lambda b: b < F.lit(threshold)))


def avg_quality_pass(quality: Column | str, min_avg: float) -> Column:
    """Boolean: read passes the average-quality filter
    (keep iff mean byte > ``min_avg``, FastqFilter.java:109-120)."""
    return avg_quality(quality) > F.lit(float(min_avg))


def low_quality_pass(quality: Column | str, threshold: int, max_count: int) -> Column:
    """Boolean: read passes the low-quality-count filter
    (keep iff count(byte < threshold) < max_count, FastqFilter.java:186-196)."""
    return low_quality_count(quality, threshold) < F.lit(int(max_count))


# ---------------------------------------------------------------------------
# Sequence functions
# ---------------------------------------------------------------------------

#: DNA complement map used by the reference (ORF.scala:13-33): A<->T,
#: C<->G, N->N; lowercase handled by upper-casing first.
_COMPLEMENT_FROM = "ATCGN"
_COMPLEMENT_TO = "TAGCN"


def reverse_complement(sequence: Column | str) -> Column:
    """DNA reverse complement.

    Implements the *intended* full-length semantics; the reference's loop
    ``for i <- len-1 to 1`` drops the final base (ORF.scala:36-38 — see
    QUIRKS.md). One ``translate`` + ``reverse``, fully codegen'd.
    """
    s = F.upper(_col(sequence))
    return F.reverse(F.translate(s, _COMPLEMENT_FROM, _COMPLEMENT_TO))


def kmers(sequence: Column | str, k: int) -> Column:
    """All overlapping k-length substrings, in order (``array<string>``).

    Full slide — ``length - k + 1`` k-mers; the reference's loop bound
    ``i < len - k - 1`` drops the last two (NormalizeRDD.java:78-81, see
    QUIRKS.md). Sequences shorter than ``k`` yield an empty array.
    """
    s = _col(sequence)
    n = F.length(s) - F.lit(int(k) - 1)
    return F.when(
        n > 0,
        F.transform(F.sequence(F.lit(1), n), lambda i: s.substr(i, F.lit(int(k)))),
    ).otherwise(F.array().cast("array<string>"))


def trim_point_sliding(
    quality: Column | str, window: int = 4, min_avg: float = 60.0
) -> Column:
    """1-based cut position for sliding-window quality trimming (int):
    keep ``quality[1..result]``; 0 means the whole read is discarded.

    Trimmomatic ``SLIDINGWINDOW:<w>:<q>`` semantics, the standard read
    QC step the reference's pipeline leaves to external tools: scan
    windows of ``window`` bytes left to right; the read is cut at the
    START of the first window whose mean byte value drops below
    ``min_avg`` (reads shorter than one window are kept whole — too
    short to judge). Same raw-byte convention as :func:`avg_quality`
    (no phred-33 offset).

    Pure JVM-side array expressions — a projection inside the scan
    stage, no shuffle, no Python. The byte array is LET-BOUND through a
    single-element transform (QUIRKS #11) so every window reads the
    SAME materialized array: higher-order-function lambdas run
    interpreted with no common-subexpression elimination, so the
    pre-r11 shape — ``slice(quality_bytes(q), i, w)`` per window —
    re-derived the whole O(n) byte array for every one of the n
    windows, O(n²) per row (measured 16.5 s for 500 ~300-char docs at
    sf0.01; the let-bound single-pass filter below: 0.22 s, 75×,
    bit-identical). Window sums are unrolled ``element_at`` adds over
    the bound array and the mean test divides exactly as before, so
    float boundary behavior is unchanged. O(n·w) per row.
    """
    q = _col(quality)
    w = int(window)

    def _first_fail(b: Column) -> Column:
        starts = F.sequence(F.lit(1), F.size(b) - F.lit(w - 1))

        def win_sum(i: Column) -> Column:
            s = F.element_at(b, i).cast("double")
            for j in range(1, w):
                s = s + F.element_at(b, i + F.lit(j)).cast("double")
            return s

        fails = F.filter(
            starts, lambda i: win_sum(i) / F.lit(float(w)) < F.lit(float(min_avg))
        )
        # first failing start (1-based), or keep the whole read
        return F.when(F.size(fails) == 0, F.size(b)).otherwise(
            F.element_at(fails, 1) - 1
        )

    bound = F.element_at(F.transform(F.array(quality_bytes(q)), _first_fail), 1)
    # NULL quality must stay NULL (the pre-r11 contract): without the
    # explicit isNull branch, `length(q) < w` is NULL, the otherwise
    # branch evaluates, and the descending `sequence(1, -(w-1))` over
    # the empty byte array reaches element_at(b, 0) — which THROWS
    # under ANSI mode instead of returning NULL.
    return (
        F.when(q.isNull(), F.lit(None))
        .when(F.length(q) < w, F.length(q))  # too short to judge: keep
        .otherwise(bound)
        .cast("int")
    )


def dust_score(sequence: Column | str, k: int = 3) -> Column:
    """Low-complexity score in [0, 1]: 0 = maximally diverse k-mer
    composition, 1 = a single repeated k-mer (double; null for
    sequences shorter than ``k``).

    The DUST-style statistic (Morgulis et al. 2006, as used by BLAST's
    masker): ``sum over distinct k-mers of c*(c-1)/2``, normalized by
    its maximum ``n*(n-1)/2`` where ``n = len-k+1`` is the k-mer count.
    The reference pipes reads through external BLAST with DUST enabled;
    this is the in-engine equivalent for pre-filtering.

    Expression shape: the k-mer array is LET-BOUND once through a
    single-element transform (QUIRKS #11 — interpreted HOF lambdas get
    no common-subexpression elimination, so a lambda body referencing
    the raw :func:`kmers` expression would re-derive the whole array
    per distinct gram; the trim_point_sliding r11 lesson), and each
    DISTINCT k-mer counts its occurrences with a size(filter) —
    O(d·n) per row with d = distinct k-mers. Stays a zero-shuffle
    projection; for corpus-wide k-mer statistics use the explode+groupBy
    entries instead (this is per-row).
    """
    s = F.upper(_col(sequence))

    def _score(grams: Column) -> Column:
        n = F.size(grams)
        # accumulate 2*Σ c*(c-1)/2 = Σ c*(c-1) exactly; divide once
        pairs2 = F.aggregate(
            F.transform(
                F.array_distinct(grams),
                lambda g: F.size(F.filter(grams, lambda x: x == g)).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, c: acc + c * (c - F.lit(1)),
        )
        denom = n.cast("long") * (n - F.lit(1)).cast("long")
        return F.when(n > 1, pairs2.cast("double") / denom.cast("double")).when(
            n == 1, F.lit(0.0)
        )

    return F.element_at(F.transform(F.array(kmers(s, k)), _score), 1)


def codons(sequence: Column | str, frame: int = 0) -> Column:
    """Non-overlapping 3-char codons of one reading frame (0, 1 or 2),
    truncated to whole codons (``Codondict.scala:9-55`` splits ORF strings
    the same way)."""
    if frame not in (0, 1, 2):
        raise ValueError(f"frame must be 0, 1 or 2, got {frame}")
    s = _col(sequence)
    n_codons = (F.length(s) - F.lit(frame)) / F.lit(3)
    n = F.floor(n_codons).cast("int")
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: s.substr(i * 3 + F.lit(frame + 1), F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# Read-name / record-shape functions
# ---------------------------------------------------------------------------


def sample_id(key: Column | str) -> Column:
    """Sample id = first ``:``-field of the read name
    (``readname.split(":")[0]``, FastqGroupper.java:65)."""
    return F.split(_col(key), ":").getItem(0)


def mate_suffix(name: Column | str, is_first: Column) -> Column:
    """Append ``/1`` or ``/2`` to a read name by first/second-of-pair flag
    (HDFSWriter.java:141-146, SamToFastq.java:52-57)."""
    return F.concat(_col(name), F.when(is_first, F.lit("/1")).otherwise(F.lit("/2")))


def is_forward_read(key: Column | str) -> Column:
    """Forward-mate predicate: Illumina ``" 1:N:"`` tag or legacy ``/1``
    suffix (FastqFilter.java:80-83)."""
    k = _col(key)
    return k.contains(" 1:N:") | k.endswith("/1")


def is_reverse_read(key: Column | str) -> Column:
    """Reverse-mate predicate (FastqFilter.java:84-87)."""
    k = _col(key)
    return k.contains(" 2:N:") | k.endswith("/2")


def fasta_record(id_: Column | str, sequence: Column | str) -> Column:
    """``>id\\nsequence`` FASTA reconstruction (BlastNFilter.java:194,
    FastaFilter.java:67)."""
    return F.format_string(">%s\n%s", _col(id_), _col(sequence))


def fastq_record(
    key: Column | str, sequence: Column | str, quality: Column | str
) -> Column:
    """4-line FASTQ stanza. The reference writes the *literal string*
    ``"key"`` as every read name (SQLQueryFastq.java:117 — bug, see
    QUIRKS.md); intended semantics write the actual key."""
    return F.format_string(
        "@%s\n%s\n+\n%s", _col(key), _col(sequence), _col(quality)
    )


#: SAM mandatory-column positions used by the reference's line splitter
#: (AlignInterleaved.java:108-116: indices 0,1,9,10).
_SAM_FIELDS = {"qname": 0, "flag": 1, "rname": 2, "pos": 3, "mapq": 4,
               "cigar": 5, "rnext": 6, "pnext": 7, "tlen": 8, "seq": 9,
               "qual": 10}


def sam_field(line: Column | str, field: str) -> Column:
    """Extract one mandatory SAM column from a raw tab-separated line
    (HDFSWriter.java:139-149). Numeric fields are cast permissively
    (malformed -> null), matching the reference's silent tolerance
    (HDFSWriter.java:109-128)."""
    idx = _SAM_FIELDS[field]
    c = F.split(_col(line), "\t").getItem(idx)
    if field in ("flag", "pos", "mapq", "pnext", "tlen"):
        return c.cast("int")
    return c


def sam_unmapped(flag: Column | str) -> Column:
    """SAM flag bit 0x4 (read unmapped) — the predicate under
    ``getReadUnmappedFlag`` (AlignNFilter.java:157-184)."""
    return (_col(flag).cast("int").bitwiseAND(F.lit(4))) != 0


def sentence_splitter_udtf():
    """Python UDTF (Spark 4 user-defined TABLE function) splitting a
    text into ordered sentences — the lateral-correlated plug-point
    for row-expanding logic a scalar UDF can't express (one input row,
    N typed output rows with per-row derived columns). Returned lazily
    from a factory so importing this module never touches the UDTF
    registry.

    Usage: ``Split = sentence_splitter_udtf();
    df.lateralJoin(Split(F.col("text").outer()))`` or register for SQL
    ``LATERAL``. Covered by tests/test_functions.py::TestUdtf, which
    pins parity with the built-in split+posexplode pipeline.

    Scale: a UDTF is ROW-AT-A-TIME Python — the slow path, same class
    as a scalar Python UDF (pickled rows across the boundary, no Arrow
    batching, no codegen). Every catalog query that needs sentence
    expansion uses the JVM-side split+posexplode instead
    (`docs_sentence_dedup`); this exists to cover the API surface for
    logic that genuinely cannot be composed from built-ins (stateful
    per-row expansion, third-party row generators) — and even then,
    prefer ``mapInPandas`` when the expansion is vectorizable."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx INT, sentence STRING, n_chars INT")
    class SentenceSplitter:
        def eval(self, text: str):
            if text is None:
                return
            start = 0
            idx = 0
            for i, ch in enumerate(text):
                if ch in ".!?":
                    sent = text[start : i + 1].strip()
                    if sent:
                        yield idx, sent, len(sent)
                        idx += 1
                    start = i + 1
            tail = text[start:].strip()
            if tail:
                yield idx, tail, len(tail)

    return SentenceSplitter
