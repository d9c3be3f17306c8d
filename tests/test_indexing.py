"""Indexed region IO: BAI/TBI-driven fetches must equal whole-file
decoding while touching only region-proportional numbers of BGZF
blocks (parity target: htslib indexed fetch used by the reference at
``mchap/io/bam.py:128`` and tabix loci at ``mchap/io/loci.py``)."""

import shutil
import struct
import zlib

import numpy as np
import pytest

from mchap_tpu.io import indexing
from mchap_tpu.io.bamlite import AlignmentFile
from mchap_tpu.io.vcflite import VariantFile

from tests.golden import data_path

REGIONS = [
    ("CHR1", 5, 25),
    ("CHR1", 30, 50),
    ("CHR2", 10, 30),
    ("CHR3", 20, 40),
    ("CHR1", 0, 1),
    ("CHR1", 48, 49),
    ("CHR2", 0, 200),
]


def read_key(read):
    return (read.qname, read.flag, read.pos, read.reference_name)


# ---------------------------------------------------------------- fixtures


@pytest.mark.parametrize(
    "bam", ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.deep.bam"]
)
@pytest.mark.parametrize("region", REGIONS)
def test_indexed_fetch_matches_full_decode(tmp_path, bam, region):
    try:
        data_path(bam)
    except Exception:
        pytest.skip("fixture missing")
    contig, start, stop = region
    indexed = AlignmentFile(data_path(bam))
    assert indexed._load_region_index() is not None, "fixture .bai not found"
    got = [read_key(r) for r in indexed.fetch(contig, start, stop)]
    # same file with the index hidden: whole-decode path
    plain = tmp_path / "noindex.bam"
    shutil.copy(data_path(bam), plain)
    expected = [read_key(r) for r in AlignmentFile(plain).fetch(contig, start, stop)]
    assert got == expected


def _vcf_records(f, contig, start, stop):
    return [
        (r.chrom, r.pos, r.ref, r.alts, tuple(sorted(r.info)))
        for r in f.fetch(contig, start, stop)
    ]


@pytest.mark.parametrize("region", REGIONS)
def test_tabix_fetch_matches_scan(tmp_path, region):
    contig, start, stop = region
    path = data_path("simple.vcf.gz")
    indexed = VariantFile(path)
    assert indexed._load_tabix() is not None, "fixture .tbi not found"
    got = _vcf_records(indexed, contig, start, stop)
    plain = tmp_path / "noindex.vcf.gz"
    shutil.copy(path, plain)
    expected = _vcf_records(VariantFile(plain), contig, start, stop)
    assert got == expected


def test_unindexed_fetch_is_cached_not_rescanned(tmp_path):
    plain = tmp_path / "noindex.vcf.gz"
    shutil.copy(data_path("simple.vcf.gz"), plain)
    f = VariantFile(plain)
    first = _vcf_records(f, "CHR1", 5, 25)
    assert f._records_by_contig is not None
    # cache reused: delete the file, fetch still answers
    plain.unlink()
    assert _vcf_records(f, "CHR1", 5, 25) == first


# ------------------------------------------------- synthetic multi-block BAM


def bgzf_block(data):
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = c.compress(data) + c.flush()
    bsize = len(comp) + 25  # total block length - 1
    return (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff\x06\x00BC\x02\x00"
        + struct.pack("<H", bsize)
        + comp
        + struct.pack("<II", zlib.crc32(data), len(data))
    )


def bam_record(qname, ref_id, pos, length):
    name = qname.encode() + b"\x00"
    cigar = struct.pack("<I", (length << 4) | 0)  # <length>M
    nib = {"A": 1, "C": 2, "G": 4, "T": 8}
    seq = ("ACGT" * length)[:length]
    packed = bytearray()
    for i in range(0, length, 2):
        hi = nib[seq[i]]
        lo = nib[seq[i + 1]] if i + 1 < length else 0
        packed.append((hi << 4) | lo)
    quals = bytes([30]) * length
    body = (
        struct.pack(
            "<iiBBHHHiiii",
            ref_id,
            pos,
            len(name),
            60,
            indexing.reg2bin(pos, pos + length),
            1,
            0,
            length,
            -1,
            -1,
            0,
        )
        + name
        + cigar
        + bytes(packed)
        + quals
    )
    return struct.pack("<i", len(body)) + body


def write_synthetic_bam(path, n_reads=20_000, spacing=50, read_len=100, per_block=300):
    # per_block * record size must stay under 64KiB: BGZF caps the
    # uncompressed block size so uoffset fits in a virtual offset's
    # 16 low bits
    """A coordinate-sorted one-contig BAM in many BGZF blocks, plus a
    hand-built .bai; returns the read positions."""
    header_text = b"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:CHRX\tLN:2000000\n"
    header = (
        b"BAM\x01"
        + struct.pack("<i", len(header_text))
        + header_text
        + struct.pack("<i", 1)
        + struct.pack("<i", 5)
        + b"CHRX\x00"
        + struct.pack("<i", 2_000_000)
    )
    blocks = [bgzf_block(header)]
    coffset = len(blocks[0])
    voffsets = []  # virtual offset of each record
    positions = []
    pending = b""
    n_in_block = 0
    bins = {}
    linear = {}  # 16kb window -> min voffset of overlapping records
    for i in range(n_reads):
        pos = i * spacing
        positions.append(pos)
        rec = bam_record(f"r{i:06d}", 0, pos, read_len)
        assert len(pending) < 0x10000, "uoffset must fit in 16 bits"
        vbeg = (coffset << 16) | len(pending)
        voffsets.append(vbeg)
        pending += rec
        n_in_block += 1
        b = indexing.reg2bin(pos, pos + read_len)
        vend = (coffset << 16) | len(pending)
        bins.setdefault(b, []).append((vbeg, vend))
        for w in range(pos >> 14, (pos + read_len - 1 >> 14) + 1):
            linear.setdefault(w, vbeg)
        if n_in_block == per_block:
            block = bgzf_block(pending)
            blocks.append(block)
            coffset += len(block)
            pending = b""
            n_in_block = 0
    if pending:
        blocks.append(bgzf_block(pending))
    blocks.append(indexing._BGZF_EOF)
    with open(path, "wb") as f:
        f.writelines(blocks)

    # chunk ends must use the *next* block's coffset once a block is
    # flushed; rebuild chunks per bin by merging adjacent record ranges
    def merge(chunks):
        merged = [list(chunks[0])]
        for vbeg, vend in chunks[1:]:
            if vbeg <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], vend)
            else:
                merged.append([vbeg, vend])
        return merged

    out = bytearray(b"BAI\x01" + struct.pack("<i", 1))
    out += struct.pack("<i", len(bins))
    for b in sorted(bins):
        chunks = merge(sorted(bins[b]))
        out += struct.pack("<Ii", b, len(chunks))
        for vbeg, vend in chunks:
            out += struct.pack("<QQ", vbeg, vend)
    n_intv = max(linear) + 1 if linear else 0
    out += struct.pack("<i", n_intv)
    prev = 0
    for w in range(n_intv):
        prev = linear.get(w, prev)
        out += struct.pack("<Q", prev)
    with open(str(path) + ".bai", "wb") as f:
        f.write(bytes(out))
    return np.asarray(positions)


def test_synthetic_indexed_fetch_is_region_proportional(tmp_path):
    bam = tmp_path / "synthetic.bam"
    positions = write_synthetic_bam(bam)
    af = AlignmentFile(bam)
    assert af._load_region_index() is not None

    start, stop = 1_000_000, 1_000_300
    got = sorted(r.pos for r in af.fetch("CHRX", start, stop))
    expected = sorted(
        int(p) for p in positions if p + 100 > start and p < stop
    )
    assert got == expected and len(got) > 0

    # region-proportional: a 300bp window out of 1Mb must touch only a
    # handful of the ~67 blocks
    n_total_blocks = 69
    # the window itself needs 1-2 blocks; coarse-bin (boundary-read)
    # chunks after the window add a few more — same cost htslib pays
    assert af._bgzf.n_block_decodes <= 10, af._bgzf.n_block_decodes

    # a second, overlapping window re-uses cached blocks
    before = af._bgzf.n_block_decodes
    _ = list(af.fetch("CHRX", start + 100, stop + 100))
    assert af._bgzf.n_block_decodes - before <= 1

    # sweeping many loci stays region-proportional end to end
    before = af._bgzf.n_block_decodes
    for locus_start in range(0, 950_000, 50_000):
        _ = list(af.fetch("CHRX", locus_start, locus_start + 200))
    assert af._bgzf.n_block_decodes - before <= n_total_blocks

    # and the indexed answers equal the whole-decode path
    plain = tmp_path / "noindex.bam"
    shutil.copy(bam, plain)
    full = AlignmentFile(plain)
    for locus_start in (0, 123_456, 777_000, 999_900):
        lo, hi = locus_start, locus_start + 321
        assert [read_key(r) for r in af.fetch("CHRX", lo, hi)] == [
            read_key(r) for r in full.fetch("CHRX", lo, hi)
        ]


# ------------------------------------------------------------- unit pieces


def test_reg2bin_contains_reg2bins():
    rng = np.random.RandomState(0)
    for _ in range(200):
        beg = int(rng.randint(0, 1 << 28))
        end = beg + int(rng.randint(1, 10_000))
        assert indexing.reg2bin(beg, end) in indexing.reg2bins(beg, end)


def test_reg2bins_level_offsets():
    # whole-genome region hits bin 0 plus every level's first bins
    bins = indexing.reg2bins(0, 1)
    assert bins == [0, 1, 9, 73, 585, 4681]


def test_is_bgzf_discriminates(tmp_path):
    import gzip as _gzip

    plain = tmp_path / "plain.vcf.gz"
    with _gzip.open(plain, "wt") as f:
        f.write("##fileformat=VCFv4.3\n")
    assert not indexing.is_bgzf(plain)
    assert indexing.is_bgzf(data_path("simple.vcf.gz"))
    assert indexing.is_bgzf(data_path("simple.sample1.bam"))


@pytest.mark.parametrize(
    "cram", ["simple.sample1.broken.cram", "simple.sample2.broken.cram"]
)
@pytest.mark.parametrize("region", REGIONS)
def test_cram_region_fetch_matches_full_decode(cram, region):
    """CRAM region fetches decode only overlapping containers (the
    coordinate filter a .crai provides, read from container headers) and
    must equal the whole-file decode."""
    contig, start, stop = region
    ref = data_path("simple.fasta")
    region_af = AlignmentFile(data_path(cram), reference_filename=ref)
    assert region_af._records_by_contig is None  # header-only open
    got = [read_key(r) for r in region_af.fetch(contig, start, stop)]
    full = AlignmentFile(data_path(cram), reference_filename=ref)
    full._load_cram()  # whole-file decode path
    expected = [read_key(r) for r in full.fetch(contig, start, stop)]
    assert got == expected


def write_synthetic_csi(bai_path, csi_path):
    """Convert a (synthetic) BAI to an equivalent CSI (same binning at
    min_shift=14/depth=5, per-bin loffset=0 = no filtering)."""
    import gzip as _gzip

    idx = indexing.read_bai(bai_path)
    out = bytearray(b"CSI\x01")
    out += struct.pack("<iii", 14, 5, 0)  # min_shift, depth, l_aux
    out += struct.pack("<i", len(idx.refs))
    for bins, _linear in idx.refs:
        out += struct.pack("<i", len(bins))
        for b in sorted(bins):
            chunks = bins[b]
            out += struct.pack("<IQi", b, 0, len(chunks))
            for vbeg, vend in chunks:
                out += struct.pack("<QQ", vbeg, vend)
    with _gzip.open(csi_path, "wb") as f:
        f.write(bytes(out))


def test_csi_fetch_matches_bai(tmp_path):
    bam = tmp_path / "synthetic.bam"
    positions = write_synthetic_bam(bam, n_reads=3000)
    write_synthetic_csi(str(bam) + ".bai", str(bam) + ".csi")
    (tmp_path / "synthetic.bam.bai").unlink()  # force the CSI path
    af = AlignmentFile(bam)
    assert isinstance(af._load_region_index(), indexing.RegionIndex)
    for lo, hi in ((40_000, 40_321), (0, 120), (149_000, 150_000)):
        got = sorted(r.pos for r in af.fetch("CHRX", lo, hi))
        expected = sorted(int(p) for p in positions if p + 100 > lo and p < hi)
        assert got == expected, (lo, hi)
