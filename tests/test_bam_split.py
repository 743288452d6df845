"""Sub-file BGZF splitting for bam.read_bam (r7, VERDICT #7): a
multi-member single-file fixture must decode with >1 partition and be
ROW-IDENTICAL to the unsplit read at every split size — including
split sizes that cut mid-member, mid-record, and mid-header."""

from __future__ import annotations

import os

import pytest

from virapipe_spark import bam


def _mk_records(n: int):
    return [
        {
            "read_name": f"r{i:04d}",
            "ref_id": i % 3,
            "pos": 10 * i,
            "flag": 0x4 if i % 7 == 0 else 0,
            "cigar": "" if i % 7 == 0 else f"{20 + i % 30}M",
            "seq": "ACGT" * (5 + i % 11),
        }
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def bam_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("bamsplit")
    refs = [("chr1", 100000), ("chr2", 100000), ("chr3", 100000)]
    # block_size=512 -> many BGZF members, records span member
    # boundaries constantly
    blob = bam.encode_bam(
        "@HD\tVN:1.6\tSO:unsorted\n", refs, _mk_records(400), block_size=512
    )
    p = str(d / "big.bam")
    with open(p, "wb") as fh:
        fh.write(blob)
    return str(d)


class TestMemberScan:
    def test_full_range_finds_every_member(self, bam_file):
        p = os.path.join(bam_file, "big.bam")
        size = os.path.getsize(p)
        members = bam.scan_bgzf_ranges((p, 0, size, size))
        # contiguous chain covering the whole file
        assert members[0][0] == 0
        for (o1, b1, _), (o2, _, _) in zip(members, members[1:]):
            assert o1 + b1 == o2
        assert members[-1][0] + members[-1][1] == size
        # the EOF marker member inflates to zero bytes
        assert members[-1][2] == 0

    def test_partial_ranges_partition_the_members(self, bam_file):
        p = os.path.join(bam_file, "big.bam")
        size = os.path.getsize(p)
        whole = bam.scan_bgzf_ranges((p, 0, size, size))
        # any 3-way byte split yields the same member set, each member
        # claimed by exactly the range containing its first byte
        cut1, cut2 = size // 3, 2 * size // 3
        parts = (
            bam.scan_bgzf_ranges((p, 0, cut1, size))
            + bam.scan_bgzf_ranges((p, cut1, cut2, size))
            + bam.scan_bgzf_ranges((p, cut2, size, size))
        )
        assert parts == whole

    def test_resync_rejects_false_magic(self, bam_file, tmp_path):
        # plant a bare gzip-magic inside a member payload: the chain
        # validation must not lock onto it
        p = os.path.join(bam_file, "big.bam")
        data = open(p, "rb").read()
        size = len(data)
        whole = bam.scan_bgzf_ranges((p, 0, size, size))
        # start the scan INSIDE the first member: resync must land on
        # the second member, not a payload coincidence
        start = whole[1][0] - 5
        got = bam.scan_bgzf_ranges((p, start, size, size))
        assert got == whole[1:]


class TestRecordGuesser:
    def test_finds_true_start_mid_stream(self, bam_file):
        p = os.path.join(bam_file, "big.bam")
        raw = bam.bgzf_decompress(open(p, "rb").read())
        _text, refs, _ = bam.decode_bam(open(p, "rb").read())
        # true record offsets
        import struct

        (l_text,) = struct.unpack_from("<i", raw, 4)
        pos = 8 + l_text
        (n_ref,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        for _ in range(n_ref):
            (l_name,) = struct.unpack_from("<i", raw, pos)
            pos += 8 + l_name
        starts = []
        while pos + 4 <= len(raw):
            starts.append(pos)
            (bs,) = struct.unpack_from("<i", raw, pos)
            pos += 4 + bs
        # from any probe point, the guesser lands on the NEXT true start
        for probe in (starts[10] - 3, starts[10], starts[10] + 1, starts[50] + 17):
            nxt = min(s for s in starts if s >= probe)
            got = bam._find_record_start(raw, probe, n_ref, len(raw))
            assert got == nxt, (probe, got, nxt)


class TestSplitRead:
    def _rows(self, df):
        return sorted(map(tuple, df.collect()))

    def test_row_identical_across_split_sizes(self, spark, bam_file):
        base = self._rows(bam.read_bam(spark, bam_file))
        assert len(base) == 400
        for split in (700, 2048, 10_000, 1 << 26):
            got = self._rows(bam.read_bam(spark, bam_file, split_size=split))
            assert got == base, f"split_size={split}"

    def test_multiple_partitions_for_single_file(self, spark, bam_file):
        df = bam.read_bam(spark, bam_file, split_size=700)
        assert df.rdd.getNumPartitions() > 1
        # and the chunks genuinely carry disjoint record subsets
        per_part = df.rdd.mapPartitions(
            lambda it: [sum(1 for _ in it)]
        ).collect()
        assert sum(per_part) == 400
        assert sum(1 for c in per_part if c > 0) > 1

    def test_header_only_first_chunk(self, spark, bam_file, tmp_path):
        # a header longer than the first chunks: records start several
        # chunks in, header-span chunks must emit nothing and the
        # record chunks everything
        refs = [(f"chr{i}", 1000 + i) for i in range(200)]  # big dictionary
        blob = bam.encode_bam(
            "@HD\tVN:1.6\n" + "@CO\t" + "x" * 3000 + "\n",
            refs,
            [
                {
                    "read_name": f"q{i}",
                    "ref_id": i % 200,
                    "pos": i,
                    "flag": 0,
                    "cigar": "8M",
                    "seq": "ACGTACGT",
                }
                for i in range(50)
            ],
            block_size=256,
        )
        d = tmp_path / "hdr"
        d.mkdir()
        (d / "h.bam").write_bytes(blob)
        base = self._rows(bam.read_bam(spark, str(d)))
        got = self._rows(bam.read_bam(spark, str(d), split_size=512))
        assert got == base and len(got) == 50


def _rewrap_wide_fextra(blob: bytes, pad: int = 40) -> bytes:
    """Re-emit every BGZF member with an extra FEXTRA subfield BEFORE
    the BC subfield (xlen 6 -> 10 + pad). Spec-legal (SAM v1 permits
    additional subfields); bgzip/htsjdk never write it, which is
    exactly why the readers' FEXTRA walk needs its own fixture."""
    import struct

    out = bytearray()
    pos = 0
    while pos < len(blob):
        m = bam._member_at(blob, pos)
        assert m is not None, pos
        bsize, _ = m
        member = blob[pos : pos + bsize]
        (xlen,) = struct.unpack_from("<H", member, 10)
        assert xlen == 6  # writer emits BC-only members
        body = member[18:]  # deflate payload + crc/isize trailer
        new_bsize = bsize + 4 + pad
        extra = (
            b"XY"
            + struct.pack("<H", pad)
            + b"\x00" * pad
            + b"BC"
            + struct.pack("<HH", 2, new_bsize - 1)
        )
        out += (
            member[:10] + struct.pack("<H", len(extra)) + extra + body
        )
        pos += bsize
    return bytes(out)


class TestWideFextra:
    """BGZF members whose FEXTRA carries subfields beyond BC (xlen>6):
    every reader surface must honor the subfield walk instead of
    assuming bgzip's fixed 18-byte header."""

    @pytest.fixture(scope="class")
    def wide_dir(self, tmp_path_factory, bam_file):
        orig = open(os.path.join(bam_file, "big.bam"), "rb").read()
        d = tmp_path_factory.mktemp("bamwide")
        (d / "wide.bam").write_bytes(_rewrap_wide_fextra(orig))
        return str(d)

    def test_rewrap_preserves_payload(self, bam_file, wide_dir):
        orig = open(os.path.join(bam_file, "big.bam"), "rb").read()
        wide = open(os.path.join(wide_dir, "wide.bam"), "rb").read()
        assert wide != orig
        assert bam.bgzf_decompress(wide) == bam.bgzf_decompress(orig)

    def test_header_probe(self, bam_file, wide_dir):
        _, refs_orig = bam.read_bam_header(
            os.path.join(bam_file, "big.bam")
        )
        _, refs_wide = bam.read_bam_header(
            os.path.join(wide_dir, "wide.bam")
        )
        assert refs_wide == refs_orig

    def test_member_index_chains_contiguously(self, wide_dir):
        p = os.path.join(wide_dir, "wide.bam")
        size = os.path.getsize(p)
        members = bam.scan_bgzf_ranges((p, 0, size, size))
        assert members[0][0] == 0
        for (o1, b1, _), (o2, _, _) in zip(members, members[1:]):
            assert o1 + b1 == o2
        assert members[-1][0] + members[-1][1] == size

    def test_split_read_row_identical(self, spark, bam_file, wide_dir):
        base = sorted(map(tuple, bam.read_bam(spark, bam_file).collect()))
        for split in (700, 10_000, 1 << 26):
            got = sorted(
                map(
                    tuple,
                    bam.read_bam(spark, wide_dir, split_size=split).collect(),
                )
            )
            assert got == base, f"split_size={split}"


class TestMemberTruncated:
    def test_full_header_is_not_truncated(self, bam_file):
        blob = open(os.path.join(bam_file, "big.bam"), "rb").read()
        assert bam._member_at(blob, 0) is not None
        assert not bam._member_truncated(blob, 0)

    def test_cut_inside_fextra(self, bam_file):
        blob = open(os.path.join(bam_file, "big.bam"), "rb").read()
        assert bam._member_truncated(blob[:15], 0)
        assert bam._member_truncated(blob[:11], 0)

    def test_non_magic_is_not_truncated(self):
        assert not bam._member_truncated(b"ACGTACGTACGT", 0)
        assert not bam._member_truncated(b"\x1f\x8b\x09\x04" + b"\x00" * 20, 0)

    def test_resync_rereads_header_straddling_the_window_pad(
        self, bam_file, tmp_path
    ):
        """A member whose wide header starts inside the scan buffer but
        extends past its end must be re-read at its own offset, not
        skipped (the resume_at path in scan_bgzf_ranges)."""
        orig = open(os.path.join(bam_file, "big.bam"), "rb").read()
        wide = _rewrap_wide_fextra(orig, pad=40)
        window, head_max = 1 << 16, bam._HEAD_MAX
        # garbage prefix places the first member 33 bytes before the
        # first scan buffer's end: its 62-byte header is truncated there
        lead = window + head_max - 33
        blob = b"A" * lead + wide
        p = tmp_path / "straddle.bam"
        p.write_bytes(blob)
        size = len(blob)
        members = bam.scan_bgzf_ranges((str(p), 0, size, size))
        assert members[0][0] == lead
        assert members[-1][0] + members[-1][1] == size
