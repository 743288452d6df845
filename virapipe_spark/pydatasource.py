"""Custom PYTHON DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the connector plug-point when no JVM source exists for a system: the
source declares a schema, plans ``InputPartition``s (which drive task
parallelism exactly like file splits), and each task materializes only
its partition's rows.

The demo source generates deterministic synthetic FASTQ-shaped reads
from md5 arithmetic (the repo's cross-engine hash idiom), so tests can
pin exact content — the same derivation as the BAM round-trip fixtures.

Scale notes: partition planning is the whole story — N partitions = N
parallel tasks, and a real connector shards by the remote system's
native ranges (key ranges, topic partitions, time slices). Since r12
the readers yield pyarrow.RecordBatches (SPARK-48493) — chunked to
``_ARROW_CHUNK_ROWS`` rows each since r13 so a huge split cannot spike
worker memory — so rows cross the Python worker boundary as Arrow
arrays, not pickled tuples; what remains driver-side is the split-planning stream (the
reference-faithful Interleave pass), so for data-plane volume a JVM
source (io.read_fastq) or landing as parquet is still preferred — the
Python DataSource earns its place for bespoke-format feeds where
correctness of the split logic dominates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_DNA16 = "ACGTACGTACGTACGT"
_HEX = "0123456789abcdef"

#: Max rows per yielded RecordBatch (r13, ADVICE_r12): a split's row
#: count is data/option-driven with no upper bound, so one batch per
#: split held the whole split as Python lists plus the Arrow copy
#: (~2-3x split bytes peak). Fixed-size chunks bound the Arrow-side
#: peak regardless of split sizing; 64k rows ≈ a few MB at read-length
#: scale, far above the vectorization-payoff floor.
_ARROW_CHUNK_ROWS = 65536


def synth_read(i: int, read_len: int = 32) -> tuple[int, str, str, str]:
    """Pure-python reference for one synthetic read (shared by the
    reader and the tests): bases = md5(i) hex mapped onto ACGT
    (repeated to read_len), quality = rotating printable phred band."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    bases = "".join(_DNA16[_HEX.index(c)] for c in h)
    bases = (bases * ((read_len + 31) // 32))[:read_len]
    qual = "".join(chr(33 + ((i + j) % 40)) for j in range(read_len))
    return i, f"synth.{i}", bases, qual


class SyntheticReadsDataSource(DataSource):
    """``format("synthetic_reads")`` after
    ``spark.dataSource.register(SyntheticReadsDataSource)``; options:
    ``n`` total reads, ``partitions`` split count, ``read_len``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_reads"

    def schema(self) -> str:
        return "read_id BIGINT, name STRING, bases STRING, quality STRING"

    def reader(self, schema) -> "SyntheticReadsReader":
        return SyntheticReadsReader(self.options)


class SyntheticReadsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100))
        self.parts = int(options.get("partitions", 4))
        self.read_len = int(options.get("read_len", 32))

    def partitions(self):
        # contiguous id ranges — the split planning a real connector
        # does against its remote system's native sharding. An empty
        # source still plans ONE empty partition: Spark requires a
        # non-empty split list (and ceil-div of n=0 would make the
        # range step 0).
        per = max(1, -(-self.n // self.parts))
        return [
            InputPartition((lo, min(lo + per, self.n)))
            for lo in range(0, max(self.n, 1), per)
        ]

    def read(self, partition):
        # r12 (guide §4): yield Arrow batches instead of row-at-a-time
        # tuples — Spark 4's DataSourceReader accepts
        # pyarrow.RecordBatch directly (SPARK-48493), so the rows skip
        # per-row pickling entirely. Values are identical; only the
        # serialization changes.
        # r13 (ADVICE_r12): batches are CHUNKED to _ARROW_CHUNK_ROWS —
        # a split is n/partitions rows with no upper bound, and one
        # batch per split would hold the whole split as Python lists
        # plus the Arrow copy (~2-3x split bytes peak); fixed-size
        # chunks bound worker memory regardless of n/partitions.
        import pyarrow as pa

        lo, hi = partition.value
        for base in range(lo, hi, _ARROW_CHUNK_ROWS):
            top = min(base + _ARROW_CHUNK_ROWS, hi)
            recs = [synth_read(i, self.read_len) for i in range(base, top)]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in recs], type=pa.int64()),
                    pa.array([r[1] for r in recs], type=pa.string()),
                    pa.array([r[2] for r in recs], type=pa.string()),
                    pa.array([r[3] for r in recs], type=pa.string()),
                ],
                names=["read_id", "name", "bases", "quality"],
            )


# ---------------------------------------------------------------------------
# FASTQ file source (round-11): real files behind the same plug-point
# ---------------------------------------------------------------------------


def _fastq_files(path: str) -> list[str]:
    """The file list a path denotes: itself for a file, the sorted
    non-hidden regular files for a directory (a Spark text-write output
    dir: part files, minus _SUCCESS/dot files). Sorted so record order
    — and therefore split numbering — is deterministic."""
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
            and os.path.isfile(os.path.join(path, f))
        )
    return [path]


def _line_split_offsets(
    path: str, lines_per_split: int
) -> list[tuple[int, int, int]]:
    """Byte ranges of consecutive ``lines_per_split``-line runs — the
    ``NLineInputFormat.getSplitsForFile`` pass the reference drives its
    FASTQ splitting with (Interleave.java:97,136: splits of
    ``splitsize*4`` lines, one driver-side streaming pass per file).
    Whole stanzas by construction: every boundary is a line start at a
    multiple of 4 lines, so readers never guess record boundaries (the
    '@'-ambiguity a byte-range FASTQ reader must disambiguate). Returns
    ``(start, end, n_lines)`` per split — one streaming pass yields the
    offsets AND the line counts, so split planning never re-reads.

    Scale note, same trade as the reference: the planning pass streams
    each file once on the driver. The zero-pass alternative is
    byte-range splits + boundary detection in the task; at data-plane
    volume prefer the JVM text source (io.read_fastq) — this connector
    exists for the split-planning seam, not throughput (module
    docstring)."""
    ranges: list[tuple[int, int, int]] = []
    start = 0
    n = 0
    with open(path, "rb") as fh:
        while True:
            line = fh.readline()
            if not line:
                break
            n += 1
            if n % lines_per_split == 0:
                pos = fh.tell()
                ranges.append((start, pos, lines_per_split))
                start = pos
        end = fh.tell()
    if end > start:
        ranges.append((start, end, n % lines_per_split or lines_per_split))
    return ranges


def _read_stanzas(path: str, start: int, end: int) -> list[tuple[str, str, str]]:
    """Parse the whole 4-line stanzas in ``[start, end)`` of ``path``
    (a planned split — guaranteed stanza-aligned) into
    (key, sequence, quality); the '@' prefix is stripped and the '+'
    separator line discarded, mirroring io.read_fastq's assembly.

    Lines are split on ``\\n`` EXACTLY as the planning pass counts them
    (binary readline) — ``str.splitlines()`` would additionally split
    on \\x0b/\\x0c/\\x85/\\u2028 etc., desyncing stanza framing on any
    record containing such a byte. A trailing \\r is stripped (CRLF
    files plan and parse identically)."""
    with open(path, "rb") as fh:
        fh.seek(start)
        chunk = fh.read(end - start)
    try:
        text = chunk.decode("utf-8")
    except UnicodeDecodeError as e:
        # surface file + split instead of an opaque executor-side
        # UnicodeDecodeError (ADVICE r11) — the planning pass is
        # byte-oriented and accepts such files, so name the divergence
        raise ValueError(
            f"{path}: split [{start}, {end}) contains non-UTF-8 bytes "
            f"at chunk offset {e.start} — the fastq datasource emits "
            "UTF-8 STRING columns; re-encode the file or read it via "
            "io.read_fastq"
        ) from e
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()  # chunk ends at a line boundary by construction
    lines = [ln[:-1] if ln.endswith("\r") else ln for ln in lines]
    if len(lines) % 4:
        raise ValueError(
            f"{path}: split [{start}, {end}) holds {len(lines)} lines — "
            "not whole 4-line stanzas (truncated or malformed FASTQ)"
        )
    out = []
    for i in range(0, len(lines) - 3, 4):
        header = lines[i]
        out.append(
            (
                header[1:] if header.startswith("@") else header,
                lines[i + 1],
                lines[i + 3],
            )
        )
    return out


class FastqDataSource(DataSource):
    """``format("fastq")`` file source: plans Interleave-faithful
    whole-stanza splits (``split_reads`` reads = ``split_reads*4``
    lines per split, the reference's ``splitsize`` knob) over a file or
    a text-write output directory, and emits
    ``(rec_idx, key, sequence, quality)`` with ``rec_idx`` the global
    record ordinal (cumulative over the sorted file list) — so
    positional semantics (mate pairing, interleave order) are DATA,
    checkable by an order-insensitive hash.

    ``option("paired", <path2>)`` reads a second equal-shape file set
    and INTERLEAVES: split i of set 1 zips with split i of set 2,
    records alternate r1[j], r2[j] within the split —
    Interleave.java:141 (writeInterleavedSplits)'s order, so
    ``rec_idx = 2*j`` for mate 1 and ``2*j+1`` for mate 2. Mismatched
    shapes (file counts, split counts, records within a split pair)
    raise rather than silently truncate — the reference zips readers
    until the FIRST exhausts (Interleave.java:149-166), which drops
    tail reads; honest-claims says error out instead.

    ``.gz`` inputs decompress to a reused scratch copy before planning
    (Interleave.java:88-95's --decompress, same order of operations);
    the copy lives in a per-user 0700 scratch dir keyed on the source's
    (path, mtime, size) identity."""

    @classmethod
    def name(cls) -> str:
        return "fastq"

    def schema(self) -> str:
        return "rec_idx BIGINT, key STRING, sequence STRING, quality STRING"

    def reader(self, schema) -> "FastqReader":
        return FastqReader(self.options)


def _scratch_root() -> str:
    """Per-user 0700 scratch directory for decompressed copies. A
    predictable path in the WORLD-SHARED tempdir would let another
    local user pre-plant the file (silently read as our data) or own
    the path (os.replace fails) — ADVICE r11. The uid suffix keeps two
    users' dirs distinct; if the dir pre-exists it must be OURS and
    0700, else fail loudly rather than trust it."""
    import os
    import stat
    import tempfile

    posix = hasattr(os, "getuid")
    uid = os.getuid() if posix else 0
    root = os.path.join(tempfile.gettempdir(), f"vp_fqds_scratch_{uid}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.lstat(root)
    # ownership/mode are POSIX concepts; on Windows st_mode reports
    # 0o777-style bits regardless, so gate BOTH checks on POSIX
    if not stat.S_ISDIR(st.st_mode) or (
        posix and (st.st_uid != uid or stat.S_IMODE(st.st_mode) & 0o077)
    ):
        raise PermissionError(
            f"scratch dir {root} exists but is not a private directory "
            f"owned by uid {uid} with mode 0700 — refusing to use it"
        )
    return root


def _maybe_decompress(path: str) -> str:
    """Gzip transparency, the reference's way: Interleave.java:88-95
    decompresses the whole .gz to a temp file BEFORE split planning
    (compressed byte offsets are not seekable to line boundaries), then
    splits the plain copy. The scratch name is keyed on the source's
    (abspath, mtime_ns, size) identity — a changed source (including a
    replacement with a preserved-older mtime, ``cp -p``) keys to a NEW
    name and decompresses fresh, so an existing keyed copy is always
    valid to reuse; repeated plans within a session reuse one copy.
    Local-mode assumption (the scratch file must be visible to driver
    and executors), same as io.scratch_dir."""
    if not path.endswith(".gz"):
        return path
    import gzip
    import hashlib
    import os

    root = _scratch_root()
    st = os.stat(path)
    # two-part key: <path tag>_<identity tag> — the path tag lets stale
    # identities of the SAME source be evicted when it changes (without
    # it, every rewrite of a .gz would accrete one more scratch copy
    # until reboot; r12 review finding)
    ptag = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:16]
    ident = f"{st.st_mtime_ns}\x00{st.st_size}"
    itag = hashlib.md5(ident.encode()).hexdigest()[:16]
    out = os.path.join(root, f"vp_fqds_gunzip_{ptag}_{itag}.fastq")
    if os.path.exists(out):
        return out
    # evict copies of prior identities of this source before writing
    # the new one (concurrent readers of a live plan hold open fds —
    # POSIX unlink leaves those intact)
    prefix = f"vp_fqds_gunzip_{ptag}_"
    for old in os.listdir(root):
        if old.startswith(prefix) and old.endswith(".fastq"):
            try:
                os.unlink(os.path.join(root, old))
            except OSError:
                pass
    # unique temp + atomic replace: concurrent sessions planning the
    # same .gz each write their own temp and the last replace wins with
    # a COMPLETE file either way (a shared fixed temp path would let
    # two writers interleave chunks and publish a corrupt copy)
    import tempfile

    fd, tmp = tempfile.mkstemp(
        dir=root, prefix=f"vp_fqds_gunzip_{ptag}_{itag}_", suffix=".part"
    )
    try:
        with gzip.open(path, "rb") as src, os.fdopen(fd, "wb") as dst:
            while True:
                chunk = src.read(1 << 20)
                if not chunk:
                    break
                dst.write(chunk)
        os.replace(tmp, out)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return out


class FastqReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fastq source requires load(<path>)")
        self.paired = options.get("paired")
        self.split_reads = int(options.get("split_reads", 5000))
        if self.split_reads < 1:
            # domain error at construction beats a bare ZeroDivisionError
            # (or a negative modulus) deep in _line_split_offsets at plan
            # time (ADVICE r11)
            raise ValueError(
                f"split_reads must be >= 1, got {self.split_reads}"
            )

    def _plan(self, root: str) -> list[tuple[str, int, int, int]]:
        """(path, start, end, base_rec) per split, base_rec cumulative
        across the sorted file list (one streaming pass per file — the
        offsets pass also yields each split's line count)."""
        lines_per_split = self.split_reads * 4
        plan = []
        rec = 0
        for f in _fastq_files(root):
            f = _maybe_decompress(f)
            splits = _line_split_offsets(f, lines_per_split)
            total_lines = sum(n for _s, _e, n in splits)
            if total_lines % 4:
                # surfacing at PLAN time beats each task floor-dividing
                # a damaged tail away (the connector's error-out-over-
                # silent-truncate stance, same as the paired checks)
                raise ValueError(
                    f"{f}: {total_lines} lines is not a whole number of "
                    "4-line FASTQ stanzas (truncated or malformed file)"
                )
            for start, end, n_lines in splits:
                plan.append((f, start, end, rec))
                rec += n_lines // 4  # whole stanzas by construction
        return plan

    def partitions(self):
        plan = self._plan(self.path)
        if self.paired is None:
            return [InputPartition(("single", s)) for s in plan] or [
                InputPartition(("single", None))
            ]
        plan2 = self._plan(self.paired)
        if len(plan) != len(plan2):
            raise ValueError(
                f"paired fastq split counts differ: {len(plan)} vs "
                f"{len(plan2)} (equal read counts and split_reads "
                "required, as in Interleave.java's zip)"
            )
        return [
            InputPartition(("paired", a, b)) for a, b in zip(plan, plan2)
        ] or [InputPartition(("paired", None, None))]

    @staticmethod
    def _batch(ids, recs):
        """(rec_idx list, (key, sequence, quality) list) -> ONE Arrow
        batch. r12 (guide §4): Spark 4's DataSourceReader accepts
        pyarrow.RecordBatch directly (SPARK-48493), so a split's rows
        cross the boundary as four Arrow arrays instead of pickled
        per-row tuples. Values identical; only serialization changes."""
        import pyarrow as pa

        return pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array([r[0] for r in recs], type=pa.string()),
                pa.array([r[1] for r in recs], type=pa.string()),
                pa.array([r[2] for r in recs], type=pa.string()),
            ],
            names=["rec_idx", "key", "sequence", "quality"],
        )

    def read(self, partition):
        # r13 (ADVICE_r12): yield in _ARROW_CHUNK_ROWS-row batches —
        # one batch per split peaked at ~2-3x split bytes (stanza list
        # + Arrow copy); chunked yields bound the Arrow-side copy while
        # the stanza list stays one split (bounded by lines_per_split).
        kind = partition.value[0]
        if kind == "single":
            split = partition.value[1]
            if split is None:
                return
            path, start, end, base = split
            recs = _read_stanzas(path, start, end)
            for lo in range(0, len(recs), _ARROW_CHUNK_ROWS):
                chunk = recs[lo : lo + _ARROW_CHUNK_ROWS]
                yield self._batch(
                    range(base + lo, base + lo + len(chunk)), chunk
                )
            return
        a, b = partition.value[1], partition.value[2]
        if a is None:
            return
        p1, s1, e1, base1 = a
        p2, s2, e2, _base2 = b
        r1 = _read_stanzas(p1, s1, e1)
        r2 = _read_stanzas(p2, s2, e2)
        if len(r1) != len(r2):
            raise ValueError(
                f"paired fastq split record counts differ: "
                f"{len(r1)} vs {len(r2)}"
            )
        if not r1:
            return
        ids, recs = [], []
        for j, (m1, m2) in enumerate(zip(r1, r2)):
            ids.append(2 * (base1 + j))
            recs.append(m1)
            ids.append(2 * (base1 + j) + 1)
            recs.append(m2)
        for lo in range(0, len(recs), _ARROW_CHUNK_ROWS):
            yield self._batch(
                ids[lo : lo + _ARROW_CHUNK_ROWS],
                recs[lo : lo + _ARROW_CHUNK_ROWS],
            )
