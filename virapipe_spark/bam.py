"""BAM binary source: BGZF container + BAM record layout, pure stdlib.

Closes the read side of the reference's BAM surface with an actual
binary parser (the catalog's ``sam_scan_roundtrip`` covers the TEXT
path; until round 6 binary BAM was wholly scoped out). Both layers are
public spec (SAM/BAM specification v1, hts-specs): BGZF is a series of
gzip members whose FEXTRA ``BC`` subfield carries the compressed block
size, and the BAM payload is a little-endian record stream. Python's
stdlib handles both — ``gzip`` decodes concatenated members natively,
``zlib``/``struct`` build them — so unlike JPEG/MP3/H.264 this needs no
external library and is REAL, not stubbed.

Reference counterpart: the reference reads BAM through hadoop-bam
(DecompressInterleave.java:59-86, HDFSWriter.java:109-149); this module
replaces that dependency with ~150 lines over Spark's ``binaryFile``
source.

Write side: ``encode_bam``/``bgzf_compress`` exist and round-trip (they
build the reader's test fixtures), but the engine's production
alignment SINK remains SAM text (``io.write_sam``) per SURVEY §2.2 —
emitting indexed, spec-complete BAM (bai/csi, full tag preservation)
stays external-tool territory.

Scale notes:

- ``read_bam`` parallelizes per FILE by default (Spark's
  ``binaryFile`` model — one task per .bam), the right grain for
  alignment stores, which shard into many files. ``split_size=N``
  switches to SUB-FILE parallelism for the few-giant-files shape
  (hadoop-bam's splitter design): a distributed member-index pass over
  byte ranges, then one task per ~N decompressed bytes with
  record-chain resync — see ``_read_bam_split``.
- The decode is one Arrow-batched ``mapInPandas`` whose input rows are
  whole files; payload bytes cross the Python boundary once per file.
  ``binaryFile`` pushes ``pathGlobFilter`` down, and the driver never
  touches content bytes.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

#: 4-bit sequence codes, SAM spec table (0-15).
_SEQ16 = "=ACMGRSVTWYHKDBN"
_CIGAR_OPS = "MIDNSHP=X"

#: BGZF end-of-file marker: a fixed empty member every writer appends.
_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def bgzf_compress(data: bytes, block_size: int = 60000) -> bytes:
    """Pack ``data`` into BGZF: gzip members of <= ``block_size``
    payload bytes, each carrying the spec's ``BC`` extra subfield
    (total member length - 1), terminated by the EOF marker member."""
    out = bytearray()
    for off in range(0, len(data), block_size):
        chunk = data[off : off + block_size]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        deflated = co.compress(chunk) + co.flush()
        # 12-byte gzip header + 6-byte extra (XLEN=6) + payload + crc + isize
        bsize = 12 + 6 + len(deflated) + 8
        member = (
            b"\x1f\x8b\x08\x04"          # magic, deflate, FEXTRA
            + b"\x00\x00\x00\x00"        # mtime
            + b"\x00\xff"                # XFL, OS=unknown
            + struct.pack("<H", 6)       # XLEN
            + b"BC" + struct.pack("<HH", 2, bsize - 1)
            + deflated
            + struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk))
        )
        assert len(member) == bsize
        out += member
    out += _BGZF_EOF
    return bytes(out)


def bgzf_decompress(data: bytes) -> bytes:
    """Inflate a BGZF stream. BGZF members are valid gzip members, so
    the stdlib decodes the whole container — but NOT via
    ``gzip.decompress``: that helper re-slices the remaining buffer
    once per member, which is O(members x bytes) — measured 221 s for
    a 58 MB shard of ~5000 x 60 KB members vs 1.4 s through the
    streaming ``GzipFile`` reader used here (the EOF marker inflates
    to zero bytes either way)."""
    import io

    return gzip.GzipFile(fileobj=io.BytesIO(data)).read()


def encode_bam(header_text: str, refs: list[tuple[str, int]],
               records: list[dict], block_size: int = 60000) -> bytes:
    """Serialize alignment records into a BGZF-wrapped BAM stream.

    ``records`` dicts carry: read_name, ref_id, pos (0-based), flag,
    mapq, cigar (string, e.g. '32M'), seq (ACGT... string). Quality is
    written as 0xFF (missing) — the text sink owns quality-bearing
    output. Tags are not emitted (reader skips them by block_size)."""
    body = bytearray(b"BAM\x01")
    text = header_text.encode()
    body += struct.pack("<i", len(text)) + text
    body += struct.pack("<i", len(refs))
    for name, l_ref in refs:
        nb = name.encode() + b"\x00"
        body += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l_ref)
    for r in records:
        name = r["read_name"].encode() + b"\x00"
        cig = _encode_cigar(r["cigar"])
        seq = _encode_seq(r["seq"])
        l_seq = len(r["seq"])
        rec = (
            struct.pack(
                "<iiBBHHHiiii",
                r["ref_id"],
                r["pos"],
                len(name),
                r.get("mapq", 60),
                0,  # bin: unused by this reader
                len(cig) // 4,
                r["flag"],
                l_seq,
                -1,  # next_refID
                -1,  # next_pos
                0,  # tlen
            )
            + name
            + cig
            + seq
            + b"\xff" * l_seq  # qual missing
        )
        body += struct.pack("<i", len(rec)) + rec
    return bgzf_compress(bytes(body), block_size)


def _encode_cigar(cigar: str) -> bytes:
    out = bytearray()
    n = ""
    for ch in cigar:
        if ch.isdigit():
            n += ch
        else:
            out += struct.pack("<I", (int(n) << 4) | _CIGAR_OPS.index(ch))
            n = ""
    return bytes(out)


def _encode_seq(seq: str) -> bytes:
    codes = [_SEQ16.index(c) for c in seq]
    if len(codes) % 2:
        codes.append(0)
    return bytes((codes[i] << 4) | codes[i + 1] for i in range(0, len(codes), 2))


def decode_bam(data: bytes) -> tuple[str, list[tuple[str, int]], list[dict]]:
    """Parse a BGZF-wrapped BAM stream into (header_text, refs,
    records); records carry the fields the ``alignments`` schema needs
    (read_name, ref_id, pos, flag, cigar, seq). Trailing per-record
    tag bytes are skipped via block_size, per spec."""
    raw = bgzf_decompress(data)
    header_text, refs, pos = _parse_header(raw)
    records = _decode_records(raw, _record_offsets(raw, pos))
    return header_text, refs, records


def _parse_header(raw) -> tuple[str, list[tuple[str, int]], int]:
    """Parse the BAM magic, header text and reference dictionary;
    returns (header_text, refs, first_record_offset)."""
    if raw[:4] != b"BAM\x01":
        raise ValueError("not a BAM stream (bad magic)")
    (l_text,) = struct.unpack_from("<i", raw, 4)
    pos = 8 + l_text
    header_text = raw[8:pos].decode(errors="replace")
    (n_ref,) = struct.unpack_from("<i", raw, pos)
    pos += 4
    refs: list[tuple[str, int]] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", raw, pos)
        name = raw[pos + 4 : pos + 4 + l_name - 1].decode()
        (l_ref,) = struct.unpack_from("<i", raw, pos + 4 + l_name)
        refs.append((name, l_ref))
        pos += 8 + l_name
    return header_text, refs, pos


def _record_offsets(raw, pos: int) -> list[int]:
    """Byte offsets of every record from ``pos`` to the end of ``raw``.

    The record walk is inherently sequential (each offset depends on
    the previous block_size), but it reads ONE int32 per record; the
    field decode — the actual per-byte work — happens vectorized in
    :func:`_decode_records` afterwards."""
    offs: list[int] = []
    n = len(raw)
    while pos + 4 <= n:
        offs.append(pos)
        (bs,) = struct.unpack_from("<i", raw, pos)
        pos += 4 + bs
    return offs


def _decode_records_py(raw, offsets: list[int]) -> list[dict]:
    """Reference per-record decode (the pre-r8 path), kept for the
    throughput A/B (tools/bench_bam_decode.py) and as the readable
    twin the vectorized path is tested against."""
    return [_decode_one(raw, o)[0] for o in offsets]


def _gather_fields(raw, offsets: list[int]):
    """Vectorized field extraction for many records at once: every
    fixed-width field is a numpy gather over the block buffer, and the
    variable-length payloads (names, cigar ops, seq nibbles) are
    flattened-index gathers sliced back per record — the same
    offset-arithmetic pattern as the JPEG bit-reader. Replaces the
    per-base Python generator that dominated decode at real shard
    sizes (r8 VERDICT item 6; measured numbers in SCALE.md).

    Returns ``(names, cigars, seqs, ref_id, rpos, mapq, flag, l_seq)``
    — the first three as Python lists, the rest as numpy int arrays."""
    import numpy as np

    a = np.frombuffer(raw, np.uint8)
    off = np.asarray(offsets, dtype=np.int64)
    base = off + 4

    def u16(o):
        return a[o].astype(np.int64) | (a[o + 1].astype(np.int64) << 8)

    def i32(o):
        v = (
            a[o].astype(np.uint32)
            | (a[o + 1].astype(np.uint32) << 8)
            | (a[o + 2].astype(np.uint32) << 16)
            | (a[o + 3].astype(np.uint32) << 24)
        )
        return v.astype(np.int32).astype(np.int64)

    ref_id = i32(base)
    rpos = i32(base + 4)
    l_read_name = a[base + 8].astype(np.int64)
    mapq = a[base + 9].astype(np.int64)
    n_cigar = u16(base + 12)
    flag = u16(base + 14)
    l_seq = i32(base + 16)

    def flat_idx(starts, lengths):
        """Indices of a[starts[i] : starts[i]+lengths[i]] for all i,
        concatenated — one fancy-index replaces per-record slicing."""
        total = int(lengths.sum())
        pos0 = np.cumsum(lengths) - lengths
        return (
            np.arange(total, dtype=np.int64)
            - np.repeat(pos0, lengths)
            + np.repeat(starts, lengths)
        )

    # read names (l_read_name includes the NUL terminator, dropped here)
    name_start = base + 32
    name_len = l_read_name - 1
    nb = a[flat_idx(name_start, name_len)].tobytes()
    nbound = np.concatenate(([0], np.cumsum(name_len)))
    names = [nb[s:e].decode() for s, e in zip(nbound[:-1], nbound[1:])]

    # cigars: one gather of every op uint32, stitched back per record
    cig_start = name_start + l_read_name
    ops = np.frombuffer(
        a[flat_idx(cig_start, 4 * n_cigar)].tobytes(), dtype="<u4"
    )
    op_len = (ops >> 4).tolist()
    op_chr = [_CIGAR_OPS[x] for x in (ops & 0xF).tolist()]
    cbound = np.concatenate(([0], np.cumsum(n_cigar)))
    cigars = [
        "".join(f"{op_len[i]}{op_chr[i]}" for i in range(s, e))
        for s, e in zip(cbound[:-1].tolist(), cbound[1:].tolist())
    ]

    # sequences: nibble-expand every seq byte in one shot, slice per
    # record (odd l_seq drops the final pad nibble via the length cap)
    n_seq_bytes = (l_seq + 1) // 2
    sb = a[flat_idx(cig_start + 4 * n_cigar, n_seq_bytes)]
    nib = np.empty(sb.size * 2, np.uint8)
    nib[0::2] = sb >> 4
    nib[1::2] = sb & 0xF
    chars = np.frombuffer(_SEQ16.encode(), np.uint8)[nib].tobytes()
    sbound = (2 * np.cumsum(n_seq_bytes) - 2 * n_seq_bytes).tolist()
    seqs = [
        chars[s : s + n].decode()
        for s, n in zip(sbound, l_seq.tolist())
    ]
    return names, cigars, seqs, ref_id, rpos, mapq, flag, l_seq


def _decode_records(raw, offsets: list[int]) -> list[dict]:
    """Record dicts (same shape as :func:`_decode_one`) built from the
    vectorized gathers — the `decode_bam` public-contract path."""
    if not offsets:
        return []
    names, cigars, seqs, ref_id, rpos, mapq, flag, _l_seq = _gather_fields(
        raw, offsets
    )
    return [
        {
            "read_name": names[i],
            "ref_id": ref_id_i,
            "pos": pos_i,
            "mapq": mapq_i,
            "flag": flag_i,
            "cigar": cigars[i],
            "seq": seqs[i],
        }
        for i, (ref_id_i, pos_i, mapq_i, flag_i) in enumerate(
            zip(
                ref_id.tolist(),
                rpos.tolist(),
                mapq.tolist(),
                flag.tolist(),
            )
        )
    ]


def _decode_columns(raw, offsets: list[int], refs: list[tuple[str, int]]):
    """The ``alignments``-schema output columns, built column-wise
    straight from the vectorized gathers — no per-record dict or tuple
    is ever materialized. Both ``read_bam`` decode paths feed pandas
    from this (row-wise assembly measured ~2x the whole decode)."""
    import numpy as np
    import pandas as pd

    cols = [
        "readName",
        "start",
        "referenceName",
        "length",
        "bases",
        "cigar",
        "readUnmapped",
        "duplicateRead",
    ]
    if not offsets:
        return pd.DataFrame({c: [] for c in cols})
    names, cigars, seqs, ref_id, rpos, _mapq, flag, l_seq = _gather_fields(
        raw, offsets
    )
    # ref_id == -1 (unmapped) indexes the appended None sentinel
    ref_names = np.array([n for n, _ in refs] + [None], dtype=object)
    return pd.DataFrame(
        {
            "readName": names,
            "start": (rpos + 1).astype(np.int32),
            "referenceName": ref_names[ref_id],
            "length": l_seq.astype(np.int32),
            "bases": seqs,
            "cigar": cigars,
            "readUnmapped": (flag & 0x4).astype(bool),
            "duplicateRead": (flag & 0x400).astype(bool),
        }
    )


def _decode_one(raw, pos: int) -> tuple[dict, int]:
    """Decode ONE BAM record at ``pos`` (which must hold the record's
    block_size int32); returns (record, next_pos). Shared by the
    whole-file reader and the sub-file split reader."""
    (block_size,) = struct.unpack_from("<i", raw, pos)
    base = pos + 4
    (
        ref_id,
        rpos,
        l_read_name,
        mapq,
        _bin,
        n_cigar,
        flag,
        l_seq,
        _nref,
        _npos,
        _tlen,
    ) = struct.unpack_from("<iiBBHHHiiii", raw, base)
    p = base + 32
    read_name = raw[p : p + l_read_name - 1].decode()
    p += l_read_name
    cigar = ""
    for _ in range(n_cigar):
        (op,) = struct.unpack_from("<I", raw, p)
        cigar += f"{op >> 4}{_CIGAR_OPS[op & 0xF]}"
        p += 4
    seq = "".join(
        _SEQ16[(raw[p + i // 2] >> (4 if i % 2 == 0 else 0)) & 0xF]
        for i in range(l_seq)
    )
    rec = {
        "read_name": read_name,
        "ref_id": ref_id,
        "pos": rpos,
        "mapq": mapq,
        "flag": flag,
        "cigar": cigar,
        "seq": seq,
    }
    return rec, base + block_size


def read_bam(
    spark: SparkSession, path: str, split_size: int | None = None
) -> DataFrame:
    """Read BGZF-compressed binary BAM files into the ``alignments``
    schema — column-identical to ``io.read_sam`` (readName, start
    [1-based, per SAM text semantics], referenceName [resolved through
    the file's own reference dictionary], length, bases, cigar,
    readUnmapped, duplicateRead), so the two sources interchange.

    ``split_size=None`` (default): ``binaryFile`` scan, one task per
    file — the right grain for alignment stores that shard into many
    files, and portable to any Hadoop filesystem. ``split_size=N``:
    SUB-FILE parallelism (r7, closing VERDICT #7) — byte ranges of ~N
    resync to BGZF member boundaries and records re-chain inside the
    decompressed stream (:func:`_read_bam_split`), so a single 500 GB
    BAM becomes size/N tasks instead of one. Row-identical to the
    default path for any split_size (tests/test_bam_split.py).

    Plan (default): ``binaryFile`` (driver sees paths only) -> one
    Arrow-batched mapInPandas decoding whole files. An unmapped record
    (ref_id == -1) gets a null referenceName, matching the text
    reader's permissive-null convention."""
    if split_size is not None:
        return _read_bam_split(spark, path, split_size)
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [
            T.StructField("readName", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("referenceName", T.StringType()),
            T.StructField("length", T.IntegerType()),
            T.StructField("bases", T.StringType()),
            T.StructField("cigar", T.StringType()),
            T.StructField("readUnmapped", T.BooleanType()),
            T.StructField("duplicateRead", T.BooleanType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                raw = bgzf_decompress(bytes(content))
                _text, refs, pos = _parse_header(raw)
                yield _decode_columns(raw, _record_offsets(raw, pos), refs)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bam")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(gen, schema)


def write_bam(
    df: DataFrame,
    path: str,
    header_text: str = "@HD\tVN:1.6\tSO:unsorted\n",
    block_size: int = 60000,
) -> None:
    """Distributed BINARY BAM sink — closes the one reference feature
    SURVEY §2.2 had scoped out (HDFSWriter.java:247-315 writes BAM
    per-partition through the HDFS client; this is the same shape over
    the alignments schema): each partition serializes its rows through
    :func:`encode_bam` (BAM record layout + BGZF container) into one
    ``part-NNNNN.bam`` shard under ``path``.

    The reference dictionary is derived from the data (distinct
    referenceName with l_ref = max aligned end) in one small aggregate
    and collected — control-plane only, bounded by the number of
    references (a genome's contig list), never row data; it becomes
    both the BAM header dictionary and the name->ref_id index shipped
    to executors in the task closure.

    Scale: one aggregate shuffle keyed on referenceName, then a single
    embarrassingly-parallel pass — no shuffle, no driver row traffic;
    shard count = partition count (repartition upstream to size
    shards). Local-mode assumption shared with scratch_dir: the
    executor-side ``open()`` targets a filesystem all tasks share; on
    a real cluster this handle is the distributed-FS output stream
    (exactly the reference's HDFS FSDataOutputStream), the only line
    that changes. Quality bytes are written as missing (0xFF) per
    encode_bam — the SAM text sink owns quality-bearing output."""
    import os

    from pyspark import TaskContext
    from pyspark.sql import functions as F

    refs = sorted(
        # l_ref aggregates to NULL when a reference's rows all have
        # null start/bases — keep the reference in the dictionary with
        # the spec-minimum length 1 rather than TypeError-ing on the
        # driver (ADVICE r6).
        (r["referenceName"], int(r["l_ref"]) if r["l_ref"] is not None else 1)
        for r in df.filter(F.col("referenceName").isNotNull())
        .groupBy("referenceName")
        .agg(
            F.max(F.col("start") - 1 + F.length("bases")).alias("l_ref")
        )
        .collect()
    )
    ref_index = {name: i for i, (name, _) in enumerate(refs)}
    os.makedirs(path, exist_ok=True)

    def _write_partition(rows) -> None:
        recs = []
        for r in rows:
            # permissive-null convention, sink side: the SAM reader
            # nulls malformed fields rather than erroring; the binary
            # sink maps them to the spec's missing markers ("*" name,
            # zero-length seq, empty CIGAR) instead of crashing an
            # executor mid-shard on one bad row.
            recs.append(
                {
                    "read_name": r["readName"] or "*",
                    "ref_id": ref_index.get(r["referenceName"], -1),
                    "pos": (int(r["start"]) - 1) if r["start"] is not None else -1,
                    "flag": (0x4 if r["readUnmapped"] else 0)
                    | (0x400 if r["duplicateRead"] else 0),
                    "cigar": r["cigar"] or "",
                    "seq": r["bases"] or "",
                }
            )
        if not recs:
            return
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        blob = encode_bam(header_text, refs, recs, block_size)
        # temp-file + atomic rename: a failed/retried/speculative task
        # must never leave a truncated shard, and the LAST completed
        # attempt wins the final name (rename is atomic within a POSIX
        # dir; on a real cluster this is the FileOutputCommitter's
        # _temporary/attempt dance — same contract) (ADVICE r6).
        final = os.path.join(path, f"part-{pid:05d}.bam")
        tmp = os.path.join(
            path, f".part-{pid:05d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, final)

    df.select(
        "readName",
        "start",
        "referenceName",
        "bases",
        "cigar",
        "readUnmapped",
        "duplicateRead",
    ).foreachPartition(_write_partition)


# ---------------------------------------------------------------------------
# Sub-file (BGZF-member) splitting — the 100 TB path for few giant BAMs
# (VERDICT r6 #7). Mirrors hadoop-bam's design (the reference consumes
# it via DecompressInterleave.java / SQLQueryBAM.java:60-66): BGZF
# members are independently inflatable, so byte ranges resync to the
# next member by magic+BSIZE-chain validation, and record boundaries
# inside the decompressed stream are re-found with a validated
# record-chain guesser (BAMSplitGuesser's published approach).
# ---------------------------------------------------------------------------


def _member_at(data: bytes, off: int) -> tuple[int, int] | None:
    """If ``data[off:]`` starts a plausible BGZF member, return its
    (bsize, isize-position-offset) — i.e. (compressed length, bsize-4
    where the ISIZE trailer sits); else None. Validates the gzip FEXTRA
    walk to the spec's BC subfield rather than trusting magic alone."""
    if data[off : off + 4] != b"\x1f\x8b\x08\x04":
        return None
    if off + 12 > len(data):
        return None
    (xlen,) = struct.unpack_from("<H", data, off + 10)
    p, end = off + 12, off + 12 + xlen
    if end > len(data):
        return None
    while p + 4 <= end:
        si1, si2, slen = data[p], data[p + 1], struct.unpack_from("<H", data, p + 2)[0]
        if si1 == 0x42 and si2 == 0x43 and slen == 2:
            if p + 6 > end:
                return None
            (bsize_m1,) = struct.unpack_from("<H", data, p + 4)
            return bsize_m1 + 1, bsize_m1 + 1 - 4
        p += 4 + slen
    return None


#: largest possible BGZF member header: 12 fixed bytes + 0xFFFF of
#: FEXTRA. bgzip/htsjdk always write 18 (xlen=6, BC only), but the
#: spec permits extra subfields — readers below honor the full walk.
_HEAD_MAX = 12 + 0xFFFF


def _member_truncated(data: bytes, off: int) -> bool:
    """True iff ``data[off:]`` is a gzip-FEXTRA magic candidate whose
    header extends past the end of ``data`` — i.e. more bytes could
    turn :func:`_member_at`'s None into a hit. Distinguishes "invalid"
    from "unverifiable here" so buffer-boundary scans re-read instead
    of skipping a member whose FEXTRA straddles the window edge."""
    n = len(data)
    if data[off : off + 4] != b"\x1f\x8b\x08\x04"[: max(n - off, 0)]:
        return False
    if off + 12 > n:
        return True
    (xlen,) = struct.unpack_from("<H", data, off + 10)
    return off + 12 + xlen > n


def _read_member_head(fh, pos: int) -> tuple[int, int] | None:
    """Read one member header at ``pos`` honoring the FEXTRA walk: 12
    fixed bytes, then XLEN subfield bytes — so spec-legal members whose
    extra field carries subfields beyond BC (xlen > 6) parse the same
    as bgzip's fixed 18-byte headers. Returns (bsize, isize_off) or
    None."""
    fh.seek(pos)
    head = fh.read(12)
    if len(head) < 12 or head[:4] != b"\x1f\x8b\x08\x04":
        return None
    (xlen,) = struct.unpack_from("<H", head, 10)
    return _member_at(head + fh.read(xlen), 0)


def scan_bgzf_ranges(args):
    """Range task for the member-index pass: (path, start, end,
    file_size) -> list of (offset, bsize, isize) for every member
    STARTING in [start, end). Resyncs by scanning for the gzip magic
    and validating a two-link BSIZE chain (next chained position must
    itself be a valid member header or end-of-file), then walks the
    chain reading only headers and the 4-byte ISIZE trailer."""
    path, start, end, file_size = args
    out = []
    with open(path, "rb") as fh:
        # resync: find the first true member start at-or-after `start`.
        # The tail pad covers a maximal FEXTRA header, so any candidate
        # inside the window validates without truncation; a candidate
        # truncated in the pad region restarts the read at its own
        # offset instead of being skipped.
        window = 1 << 16
        pos = None
        scan_from = start
        while scan_from < end and pos is None:
            fh.seek(scan_from)
            buf = fh.read(window + _HEAD_MAX)
            i = 0
            resume_at = None
            while True:
                i = buf.find(b"\x1f\x8b\x08\x04", i)
                if i < 0 or scan_from + i >= end:
                    break
                m = _member_at(buf, i)
                if m is not None:
                    nxt = scan_from + i + m[0]
                    if nxt == file_size:
                        pos = scan_from + i
                        break
                    if _read_member_head(fh, nxt) is not None:
                        pos = scan_from + i
                        break
                elif _member_truncated(buf, i) and i > 0:
                    resume_at = scan_from + i
                    break
                i += 1
            if pos is None:
                scan_from = (
                    resume_at if resume_at is not None else scan_from + window
                )
        # chain member headers from the resync point
        while pos is not None and pos < end and pos < file_size:
            m = _read_member_head(fh, pos)
            if m is None:
                raise ValueError(f"BGZF chain broken at {path}:{pos}")
            bsize, isize_off = m
            fh.seek(pos + isize_off)
            (isize,) = struct.unpack("<I", fh.read(4))
            out.append((pos, bsize, isize))
            pos += bsize
    return out


#: record-header sanity bounds for the split guesser (SAM spec v1)
_MAX_BLOCK = 1 << 24
_MAX_NAME = 255


def _plausible_record(raw, pos: int, n_ref: int, limit: int) -> bool:
    """Could ``pos`` be the start of a BAM record? Field-range checks
    on the fixed 36-byte prologue (block_size, ref_id, pos,
    l_read_name, n_cigar, l_seq consistency, null-terminated name,
    valid cigar op codes) — each check multiplies the false-positive
    odds down; the caller chains three records for certainty."""
    if pos + 36 > limit:
        return False
    (block_size,) = struct.unpack_from("<i", raw, pos)
    if not (32 <= block_size < _MAX_BLOCK):
        return False
    base = pos + 4
    ref_id, rpos, l_read_name, _mapq, _bin, n_cigar, _flag, l_seq, nref2, npos, _tlen = (
        struct.unpack_from("<iiBBHHHiiii", raw, base)
    )
    if not (-1 <= ref_id < n_ref) or not (-1 <= nref2 < n_ref):
        return False
    if not (-1 <= rpos < (1 << 31)) or not (-1 <= npos < (1 << 31)):
        return False
    if not (1 <= l_read_name <= _MAX_NAME) or l_seq < 0 or n_cigar > 4096:
        return False
    fixed = 32 + l_read_name + 4 * n_cigar + (l_seq + 1) // 2 + l_seq
    if block_size < fixed:
        return False
    if base + 32 + l_read_name > limit:
        return False
    name = raw[base + 32 : base + 32 + l_read_name]
    if name[-1] != 0 or 0 in name[:-1]:
        return False
    p = base + 32 + l_read_name
    for _ in range(min(n_cigar, (limit - p) // 4)):
        (op,) = struct.unpack_from("<I", raw, p)
        if (op & 0xF) > 8:
            return False
        p += 4
    return True


def _find_record_start(raw, lo: int, n_ref: int, limit: int, links: int = 3) -> int:
    """First byte offset >= lo that starts a validated record chain of
    ``links`` records (or fewer if the buffer ends first). Returns -1
    if no start exists below ``limit``."""
    for cand in range(lo, limit):
        p, ok = cand, 0
        while ok < links and p + 4 <= limit:
            if not _plausible_record(raw, p, n_ref, limit):
                break
            (bs,) = struct.unpack_from("<i", raw, p)
            p += 4 + bs
            ok += 1
        if ok and (ok == links or p >= limit):
            return cand
    return -1


def read_bam_header(path: str) -> tuple[int, list[tuple[str, int]]]:
    """Driver-side header probe: inflate members from the file start
    until the BAM header (text + reference dictionary) is complete;
    returns (first_record_decompressed_offset, refs). Control-plane:
    reads a handful of 64 KB members, bounded by header size, never
    row data — the same budget class as write_bam's refs collect."""
    buf = bytearray()
    with open(path, "rb") as fh:
        pos = 0

        def more() -> bool:
            nonlocal pos
            m = _read_member_head(fh, pos)
            if m is None:
                return False
            fh.seek(pos)
            member = fh.read(m[0])
            buf.extend(gzip.decompress(member))
            pos += m[0]
            return True

        while len(buf) < 12:
            if not more():
                raise ValueError(f"truncated BAM header: {path}")
        if buf[:4] != b"BAM\x01":
            raise ValueError("not a BAM stream (bad magic)")
        (l_text,) = struct.unpack_from("<i", buf, 4)
        need = 8 + l_text + 4
        while len(buf) < need:
            if not more():
                raise ValueError(f"truncated BAM header: {path}")
        (n_ref,) = struct.unpack_from("<i", buf, 8 + l_text)
        p = 8 + l_text + 4
        refs: list[tuple[str, int]] = []
        for _ in range(n_ref):
            while len(buf) < p + 8:
                if not more():
                    raise ValueError(f"truncated BAM refs: {path}")
            (l_name,) = struct.unpack_from("<i", buf, p)
            while len(buf) < p + 8 + l_name:
                if not more():
                    raise ValueError(f"truncated BAM refs: {path}")
            name = bytes(buf[p + 4 : p + 4 + l_name - 1]).decode()
            (l_ref,) = struct.unpack_from("<i", buf, p + 4 + l_name)
            refs.append((name, l_ref))
            p += 8 + l_name
    return p, refs


def _read_bam_split(spark: SparkSession, path: str, split_size: int) -> DataFrame:
    """Sub-file-parallel BAM scan (see read_bam). Three stages:

    1. control plane — list files (paths + sizes only) and probe each
       header for (first_record_offset, refs);
    2. member-index pass — byte ranges of ~split_size scanned IN
       PARALLEL for BGZF member (offset, bsize, isize) triples;
    3. chunk assembly (a per-file prefix sum over member isizes, in
       Spark) groups members into ~split_size decompressed chunks at
       member boundaries, and the decode pass gives every chunk one
       task: inflate from the chunk's first member, find the first
       record starting at-or-after the chunk's decompressed offset
       (exactly known for the file-head chunk, record-chain-guessed
       otherwise), decode records whose START lies inside the chunk —
       chaining further members past the chunk end to finish the last
       record. Records partition exactly across chunks: no overlap,
       no loss, any split_size.

    Executor tasks open files with plain ``open()`` (the scratch_dir /
    write_bam local-mode assumption); a cluster swaps in the
    distributed-FS client at those two call sites."""
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    import glob as _glob
    import os

    paths = sorted(
        p
        for p in _glob.glob(os.path.join(path, "*.bam"))
        if os.path.isfile(p)
    ) if os.path.isdir(path) else [path]
    meta = {p: read_bam_header(p) for p in paths}  # control-plane probe

    ranges = []
    for p in paths:
        size = os.path.getsize(p)
        for start in range(0, size, split_size):
            ranges.append((p, start, min(start + split_size, size), size))
    range_df = spark.createDataFrame(
        ranges, "path string, start long, end long, file_size long"
    ).repartition(max(len(ranges), 1))

    member_schema = (
        "path string, offset long, bsize long, isize long"
    )

    def scan(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                for off, bs, isz in scan_bgzf_ranges(
                    (r.path, r.start, r.end, r.file_size)
                ):
                    rows.append((r.path, off, bs, isz))
            yield pd.DataFrame(
                rows, columns=["path", "offset", "bsize", "isize"]
            )

    members = range_df.mapInPandas(scan, member_schema)

    from pyspark.sql import Window as W

    w = W.partitionBy("path").orderBy("offset")
    chunked = (
        members.withColumn(
            "dstart",
            F.coalesce(
                F.sum("isize").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("chunk", F.expr(f"dstart div {split_size}"))
        .groupBy("path", "chunk")
        .agg(
            F.min("offset").alias("first_offset"),
            F.min("dstart").alias("chunk_dstart"),
        )
    )
    # a chunk's decode span ends where the NEXT chunk begins
    w2 = W.partitionBy("path").orderBy("chunk")
    chunks = chunked.withColumn(
        "chunk_dend",
        F.coalesce(F.lead("chunk_dstart").over(w2), F.lit(1 << 62)),
    )
    # pin ONE TASK PER CHUNK: chunk rows are tiny, decode work is not —
    # left to AQE, the coalescer would see a few KB of chunk rows and
    # collapse the decode stage to one partition (the small-rows/
    # heavy-row pitfall). The count is control-plane (the persisted
    # chunk list), not row data.
    chunks = chunks.persist()
    n_chunks = max(chunks.count(), 1)
    chunks = chunks.repartition(n_chunks, F.col("path"), F.col("chunk"))

    schema = T.StructType(
        [
            T.StructField("readName", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("referenceName", T.StringType()),
            T.StructField("length", T.IntegerType()),
            T.StructField("bases", T.StringType()),
            T.StructField("cigar", T.StringType()),
            T.StructField("readUnmapped", T.BooleanType()),
            T.StructField("duplicateRead", T.BooleanType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            parts = []
            for r in pdf.itertuples():
                hdr_end, refs = meta[r.path]
                n_ref = len(refs)
                with open(r.path, "rb") as fh:
                    buf = bytearray()
                    fpos = r.first_offset
                    base_d = int(r.chunk_dstart)  # decomp offset of buf[0]
                    fsize = os.path.getsize(r.path)

                    def more() -> bool:
                        nonlocal fpos
                        if fpos >= fsize:
                            return False
                        m = _read_member_head(fh, fpos)
                        if m is None:
                            return False
                        fh.seek(fpos)
                        buf.extend(gzip.decompress(fh.read(m[0])))
                        fpos += m[0]
                        return True

                    while not buf and more():
                        pass
                    dend = int(r.chunk_dend)
                    if base_d < hdr_end:
                        # file-head chunk: first record offset is known
                        # exactly from the header probe — no guessing
                        rec_start = hdr_end - base_d
                        while len(buf) < rec_start and more():
                            pass
                    else:
                        # fill the chunk's own span (plus whatever the
                        # validation chain needs beyond it), then guess
                        while len(buf) < dend - base_d and more():
                            pass
                        rec_start = _find_record_start(
                            bytes(buf), 0, n_ref, len(buf)
                        )
                        if rec_start < 0 or base_d + rec_start >= dend:
                            continue  # no record STARTS in this chunk
                    # sequential walk collects offsets (one int32 read
                    # per record, growing the buffer as needed); the
                    # per-byte field decode runs vectorized afterwards
                    rec_offsets: list[int] = []
                    while base_d + rec_start < dend:
                        while rec_start + 4 > len(buf) and more():
                            pass
                        if rec_start + 4 > len(buf):
                            break  # clean end of record stream
                        (bs,) = struct.unpack_from("<i", buf, rec_start)
                        while rec_start + 4 + bs > len(buf):
                            if not more():
                                raise ValueError(
                                    f"truncated BAM record at {r.path}"
                                )
                        rec_offsets.append(rec_start)
                        rec_start += 4 + bs
                    parts.append(_decode_columns(buf, rec_offsets, refs))
            if parts:
                yield pd.concat(parts, ignore_index=True)
            else:
                yield _decode_columns(b"", [], [])

    return chunks.mapInPandas(decode, schema)
