"""IO-layer tests against the bundled MCHap fixture files.

The fixture data (BAM+SAM pairs, VCF, BED, FASTA) lets us check the
standalone readers against known content and against each other
(BAM and SAM encodings of the same reads must extract identically).
"""

import numpy as np
import pytest

from mchap_tpu.io.bam import (
    encode_read_alleles,
    encode_read_distributions,
    extract_read_variants,
    extract_sample_ids,
)
from mchap_tpu.io.bamlite import AlignmentFile
from mchap_tpu.io.bed import read_bed4
from mchap_tpu.io.fastalite import FastaFile
from mchap_tpu.io.loci import Locus, LocusPrior, SNP
from mchap_tpu.io.vcflite import VariantFile


def test_read_bed4(fixture_data_dir):
    loci = list(read_bed4(str(fixture_data_dir / "simple.bed")))
    assert len(loci) == 4
    assert loci[0].contig == "CHR1" and loci[0].start == 5 and loci[0].stop == 25
    assert loci[0].name == "CHR1_05_25"
    # gzipped variant parses identically
    gz = list(read_bed4(str(fixture_data_dir / "simple.bed.gz")))
    assert gz == loci
    # region filtering
    sel = list(read_bed4(str(fixture_data_dir / "simple.bed.gz"), region="CHR1:0-28"))
    assert [x.name for x in sel] == ["CHR1_05_25"]
    sel = list(read_bed4(str(fixture_data_dir / "simple.bed.gz"), region="CHR2"))
    assert [x.name for x in sel] == ["CHR2_10_30"]


def test_fasta_fetch(fixture_data_dir):
    with FastaFile(str(fixture_data_dir / "simple.fasta")) as f:
        assert f.references == ["CHR1", "CHR2", "CHR3"]
        assert f.lengths == [60, 60, 60]
        assert f.fetch("CHR1", 0, 10) == "A" * 10
        assert len(f.fetch("CHR2", 5, 25)) == 20


def test_vcf_parse(fixture_data_dir):
    with VariantFile(str(fixture_data_dir / "simple.vcf.gz")) as f:
        assert f.samples == ["SAMPLE1", "SAMPLE2", "SAMPLE3"]
        records = list(f.fetch())
    assert len(records) == 8
    first = records[0]
    assert (first.chrom, first.pos, first.ref, first.alts) == ("CHR1", 2, "A", ("T",))
    assert first.info["NS"] == 3
    assert first.info["AC"] == (1,)
    # multi-allelic
    assert records[3].alts == ("C", "T")
    # region fetch
    with VariantFile(str(fixture_data_dir / "simple.vcf.gz")) as f:
        sel = list(f.fetch("CHR1", 5, 25))
    assert [r.pos for r in sel] == [7, 16, 23]


def test_locus_pipeline(fixture_data_dir):
    locus = Locus(
        contig="CHR1", start=5, stop=25, name="CHR1_05_25", sequence=None, variants=None
    )
    locus = locus.set_sequence(str(fixture_data_dir / "simple.fasta"))
    assert locus.sequence == "A" * 20
    locus = locus.set_variants(str(fixture_data_dir / "simple.vcf.gz"))
    assert locus.positions == [6, 15, 22]  # 0-based SNV starts
    assert locus.alleles == [("A", "C"), ("A", "G"), ("A", "C", "T")]
    assert locus.count_alleles() == [2, 2, 3]
    # haplotype formatting round-trip
    haps = np.array([[0, 0, 0], [1, 1, 2]], dtype=np.int8)
    strings = locus.format_haplotypes(haps)
    assert strings[0] == "A" * 20
    assert strings[1][6 - 5] == "C" and strings[1][15 - 5] == "G" and strings[1][22 - 5] == "T"


def test_duplicate_snp_merge(fixture_data_dir):
    locus = Locus(
        contig="CHR2", start=10, stop=30, name="CHR2_10_30", sequence=None, variants=None
    )
    locus = locus.set_sequence(str(fixture_data_dir / "simple.fasta"))
    locus = locus.set_variants(str(fixture_data_dir / "simple.vcf.gz"))
    # CHR2:20 appears twice (A->C and A->G,T) and must merge to A,C,G,T
    assert locus.positions == [14, 19]
    assert locus.alleles[1] == ("A", "C", "G", "T")


def test_extract_sample_ids(fixture_data_dir):
    paths = [
        str(fixture_data_dir / "simple.sample1.bam"),
        str(fixture_data_dir / "simple.sample2.bam"),
    ]
    got = extract_sample_ids(paths)
    assert got == {"SAMPLE1": paths[0], "SAMPLE2": paths[1]}


def _encoded_locus(fixture_data_dir, name="CHR1_05_25", contig="CHR1", start=5, stop=25):
    locus = Locus(
        contig=contig, start=start, stop=stop, name=name, sequence=None, variants=None
    )
    locus = locus.set_sequence(str(fixture_data_dir / "simple.fasta"))
    return locus.set_variants(str(fixture_data_dir / "simple.vcf.gz"))


def test_extract_read_variants_bam(fixture_data_dir):
    locus = _encoded_locus(fixture_data_dir)
    bam = AlignmentFile(str(fixture_data_dir / "simple.sample1.bam"))
    data = extract_read_variants(locus, bam)
    assert set(data) == {"SAMPLE1"}
    chars, quals = data["SAMPLE1"]
    assert chars.shape == quals.shape
    assert chars.shape[1] == 3
    assert chars.shape[0] > 0
    assert set(np.unique(chars)) <= {"A", "C", "G", "T", "N", "-"}


def test_bam_sam_equivalence(fixture_data_dir):
    """The same reads in BAM and SAM encodings must extract identically."""
    for sample in (1, 2, 3):
        locus = _encoded_locus(fixture_data_dir)
        bam = AlignmentFile(str(fixture_data_dir / f"simple.sample{sample}.bam"))
        sam = AlignmentFile(str(fixture_data_dir / f"simple.sample{sample}.sam"))
        got_bam = extract_read_variants(locus, bam)
        got_sam = extract_read_variants(locus, sam)
        assert set(got_bam) == set(got_sam)
        for key in got_bam:
            np.testing.assert_array_equal(got_bam[key][0], got_sam[key][0])
            np.testing.assert_array_equal(got_bam[key][1], got_sam[key][1])


def test_cram_decodes_identically_to_bam(fixture_data_dir):
    """The native CRAM 3.0 decoder must reproduce the matching BAM's
    records exactly (qname/flag/pos/mapq/cigar/seq/quals and the RG/MD
    tags used downstream); reference parity: pysam/htslib decode both
    to the same records (reference test_application_*:identical
    bam/cram golden rows)."""
    for sample in (1, 2, 3):
        bam = AlignmentFile(str(fixture_data_dir / f"simple.sample{sample}.bam"))
        cram = AlignmentFile(
            str(fixture_data_dir / f"simple.sample{sample}.broken.cram"),
            reference_filename=str(fixture_data_dir / "simple.fasta"),
        )
        assert [rg["ID"] for rg in bam.header["RG"]] == [
            rg["ID"] for rg in cram.header["RG"]
        ]
        reads_b = sorted(bam.fetch(), key=lambda r: (r.qname, r.flag, r.pos))
        reads_c = sorted(cram.fetch(), key=lambda r: (r.qname, r.flag, r.pos))
        assert len(reads_b) == len(reads_c) > 0
        for b, c in zip(reads_b, reads_c):
            assert (b.qname, b.flag, b.reference_name, b.pos) == (
                c.qname, c.flag, c.reference_name, c.pos
            )
            assert b.mapping_quality == c.mapping_quality
            assert b.cigar == c.cigar
            assert b.seq == c.seq
            assert list(b.quals) == list(c.quals)
            assert b.get_tag("RG") == c.get_tag("RG")
            assert b.get_tag("MD") == c.get_tag("MD")


def test_encode_reads_roundtrip(fixture_data_dir):
    locus = _encoded_locus(fixture_data_dir)
    bam = AlignmentFile(str(fixture_data_dir / "simple.sample1.bam"))
    chars, quals = extract_read_variants(locus, bam)["SAMPLE1"]
    calls = encode_read_alleles(locus, chars)
    assert calls.shape == chars.shape
    # reference allele A encodes as 0 everywhere it was called A
    assert np.all((calls == 0) == (chars == "A"))
    dists = encode_read_distributions(locus, calls, quals, error_rate=0.0024)
    assert dists.shape == calls.shape + (3,)  # max 3 alleles at this locus
    # gap rows are nan at allowed-allele columns; disallowed columns are
    # zeroed AFTER the nan fill (reference transcode.py:72-75 order)
    n_alleles = np.array(locus.count_alleles())
    allowed = np.arange(dists.shape[-1])[None, :] < n_alleles[:, None]  # [pos, A]
    gap_rows = dists[calls < 0]
    gap_allowed = np.broadcast_to(allowed[None], dists.shape)[calls < 0]
    assert np.all(np.isnan(gap_rows[gap_allowed]))
    assert np.all(gap_rows[~gap_allowed] == 0)
    # called rows: called allele has the highest probability
    called = calls >= 0
    if called.any():
        sub = dists[called]
        assert np.all(np.nanargmax(sub, axis=-1) == calls[called])


def test_locus_prior_from_variant_record(fixture_data_dir):
    with VariantFile(str(fixture_data_dir / "mock.input.frequencies.vcf")) as f:
        records = list(f.fetch())
    assert len(records) > 0
    locus = LocusPrior.from_variant_record(records[0])
    assert isinstance(locus, LocusPrior)
    haps = locus.encode_haplotypes()
    assert haps.shape[0] == 1 + len(locus.alts)
    assert haps.shape[1] == len(locus.positions)
    # first haplotype is the reference: all zeros
    assert np.all(haps[0] == 0)
    assert locus.frequencies.sum() == pytest.approx(1.0)


def test_locus_prior_frequency_tag(fixture_data_dir):
    with VariantFile(str(fixture_data_dir / "mock.input.frequencies.vcf")) as f:
        records = list(f.fetch())
    rec = records[0]
    if "AFP" in rec.info:
        locus = LocusPrior.from_variant_record(rec, frequency_tag="AFP")
        assert locus.frequencies.sum() == pytest.approx(1.0)


def test_snp_dataclass_ordering():
    a = SNP("CHR1", 5, 6, ".", ("A", "T"))
    b = SNP("CHR1", 9, 10, ".", ("A", "C"))
    assert a < b


def test_native_decoder_matches_python(fixture_data_dir, monkeypatch):
    """The C++ BGZF/BAM decoder must produce identical records to the
    pure-Python decoder."""
    import mchap_tpu.native as native

    lib = native.load_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    path = str(fixture_data_dir / "simple.sample1.deep.bam")

    fast = AlignmentFile(path)
    assert fast._load_records_native()

    slow = AlignmentFile(path)
    monkeypatch.setattr(native, "load_library", lambda: None)
    slow._load_records()

    assert set(fast._records_by_contig) == set(slow._records_by_contig)
    for contig in fast._records_by_contig:
        a = fast._records_by_contig[contig]
        b = slow._records_by_contig[contig]
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert x.qname == y.qname
            assert x.flag == y.flag
            assert x.pos == y.pos
            assert x.mapping_quality == y.mapping_quality
            assert x.cigar == y.cigar
            assert x.seq == y.seq
            np.testing.assert_array_equal(x.quals, y.quals)
            assert x.tags == y.tags
