"""Direct unit tests of the VCF emission layer (mchap_tpu/io/vcf.py).

The formatting rules (precision-3 rounding, '.0' trimming, nan -> '.',
GT '/'-joining with '.' for null alleles) are the byte-level output
contract shared with the reference (mchap/io/vcf/util.py, records.py);
previously they were proven only transitively through the golden VCFs.
These tests pin the edge cases directly.
"""

import numpy as np
import pytest

from mchap_tpu.io import vcf
from mchap_tpu.io.util import qual_of_prob


# ---------------------------------------------------------------------------
# vcfstr
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "obj,expect",
    [
        # scalars
        (None, "."),
        (np.nan, "."),
        ("", "."),
        ("PASS", "PASS"),
        (7, "7"),
        (0, "0"),
        (-3, "-3"),
        (1.0, "1"),
        (0.5, "0.5"),
        (0.12349, "0.123"),
        (0.12351, "0.124"),
        (-0.0004, "0"),  # rounds to -0.0; int(-0.0) == -0.0 -> "0"
        (float(np.float32(0.25)), "0.25"),
        # python containers
        ((1, 2, 3), "1,2,3"),
        ([1, 2, 3], "1,2,3"),
        ([], "."),
        ((), "."),
        ([1, None, 3], "1,.,3"),
        ([1.3, 0.7, 1.0], "1.3,0.7,1"),
        (["a", "", "b"], "a,.,b"),
        # numpy arrays
        (np.array(5), "5"),
        (np.array(2.5), "2.5"),
        (np.array([1, 2, 3]), "1,2,3"),
        (np.array([], dtype=float), "."),
        (np.array([0.0321, np.nan, 1.0, 0.0]), "0.032,.,1,0"),
        (np.array([1.0, 2.0]), "1,2"),
        (np.array([np.nan, np.nan]), ".,."),
        (np.array([0.1234567, 10.0]), "0.123,10"),
        (np.array(["x", "y"]), "x,y"),
        # trailing-'.0' trimming applies to the LAST element too
        (np.array([2.5, 3.0]), "2.5,3"),
        (np.array([3.0, 2.5]), "3,2.5"),
    ],
)
def test_vcfstr(obj, expect):
    assert vcf.vcfstr(obj) == expect


def test_vcfstr_precision_override():
    assert vcf.vcfstr(0.123456, precision=5) == "0.12346"


def test_vcfstr_numpy_scalar_parity():
    """Reference scalar branch is ``isinstance(obj, float)``: np.float64
    (a float subclass) takes the int-trim path, np.float32 does not and
    renders via str() (reference io/vcf/util.py:32-41)."""
    import numpy as np

    assert vcf.vcfstr(np.float64(1.0)) == "1"
    assert vcf.vcfstr(np.float32(1.0)) == "1.0"
    assert vcf.vcfstr(np.array([0.123456]), precision=1) == "0.1"


def test_vcfstr_nested_iterables():
    # lists of arrays stringify elementwise and comma-join
    assert vcf.vcfstr([np.array([1, 2]), np.array([3])]) == "1,2,3"


# ---------------------------------------------------------------------------
# INFO / sample-field / record assembly
# ---------------------------------------------------------------------------


def test_format_info_field_values_and_flags():
    s = vcf.format_info_field(
        AN=8, AC=np.array([2, 1]), REFMASKED=True, NS=3, AF=np.array([0.5, 0.25])
    )
    assert s == "AN=8;AC=2,1;REFMASKED;NS=3;AF=0.5,0.25"


def test_format_info_field_false_flag_omitted():
    s = vcf.format_info_field(AN=8, REFMASKED=False)
    assert s == "AN=8"


def test_format_info_field_nan_value():
    assert vcf.format_info_field(DP=np.nan) == "DP=."


def test_format_sample_field_gt_special_case():
    s = vcf.format_sample_field(
        GT=[np.array([0, 0, 1, 2]), np.array([0, -1, -1, -1])],
        GQ=[60, np.nan],
        DP=[12, 0],
    )
    field, s1, s2 = s.split("\t")
    assert field == "GT:GQ:DP"
    assert s1 == "0/0/1/2:60:12"
    assert s2 == "0/././.:.:0"


def test_format_sample_field_null_alleles():
    s = vcf.format_sample_field(GT=[np.array([0, -1])], GQ=[np.nan])
    field, s1 = s.split("\t")
    assert field == "GT:GQ"
    assert s1 == "0/.:."


def test_format_sample_field_requires_equal_lengths():
    with pytest.raises(AssertionError):
        vcf.format_sample_field(GT=[np.array([0, 0])], GQ=[1, 2])


def test_format_record_line():
    line = vcf.format_record(
        chrom="chr1",
        pos=100,
        id="locus1",
        ref="ACGT",
        alt=["ACGA", "TCGT"],
        qual=None,
        filter="PASS",
        info="AN=4",
        format="GT\t0/1",
    )
    assert line == "chr1\t100\tlocus1\tACGT\tACGA,TCGT\t.\tPASS\tAN=4\tGT\t0/1"


def test_format_record_missing_id_and_alt():
    line = vcf.format_record(
        chrom="c",
        pos=1,
        id=None,
        ref="A",
        alt=[],
        qual=None,
        filter="PASS",
        info="",
        format="GT\t0/0",
    )
    assert line.split("\t")[2] == "."
    assert line.split("\t")[4] == "."
    assert line.split("\t")[7] == "."


# ---------------------------------------------------------------------------
# headers
# ---------------------------------------------------------------------------


def test_meta_headers():
    assert str(vcf.fileformat("v4.3")) == "##fileformat=VCFv4.3"
    assert str(vcf.randomseed(11)) == "##randomseed=11"
    assert str(vcf.reference("/x/y.fa")) == "##reference=file:/x/y.fa"
    assert str(vcf.phasing("None")) == "##phasing=None"
    assert (
        str(vcf.commandline(["mchap", "assemble", "--ploidy", "4"]))
        == '##commandline="mchap assemble --ploidy 4"'
    )
    assert str(vcf.commandline("raw string")) == "##commandline=raw string"


def test_filedate_format():
    s = str(vcf.filedate("20260820"))
    assert s == "##fileDate=20260820"
    auto = str(vcf.filedate())
    assert auto.startswith("##fileDate=")
    assert len(auto) == len("##fileDate=YYYYMMDD")


def test_contig_header():
    assert str(vcf.ContigHeader("chr1", 248956422)) == (
        "##contig=<ID=chr1,length=248956422>"
    )
    assert str(vcf.ContigHeader("chrUn", None)) == "##contig=<ID=chrUn,length=.>"


def test_filter_headers():
    assert str(vcf.PASS) == '##FILTER=<ID=PASS,Description="All filters passed">'
    assert str(vcf.NOA) == (
        '##FILTER=<ID=NOA,Description="No observed alleles at locus">'
    )
    assert str(vcf.AF0) == (
        '##FILTER=<ID=AF0,Description="All alleles have prior allele '
        'frequency of zero">'
    )


def test_columns_line():
    s = vcf.columns(["s1", "s2"])
    assert s == (
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2"
    )


def test_info_and_format_field_strings():
    # spot-check the header definition rendering against the VCF spec form
    an = vcf.InfoField("AN", "1", "Integer", "Total number of alleles in called genotypes")
    assert str(an) == (
        '##INFO=<ID=AN,Number=1,Type=Integer,'
        'Description="Total number of alleles in called genotypes">'
    )
    gt = vcf.FormatField("GT", "1", "String", "Genotype")
    assert str(gt) == '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">'


# ---------------------------------------------------------------------------
# summary helpers
# ---------------------------------------------------------------------------


def test_haplotype_depth():
    assert vcf.haplotype_depth([]) is None
    assert vcf.haplotype_depth([10, 20, 31]) == 20  # int(mean)


def test_quality_phred_caps():
    assert vcf.quality(None) is None
    assert vcf.quality(1.0) == 60  # max qual cap (reference io/util.py:56-88)
    assert vcf.quality(0.0) == 0
    assert vcf.quality(0.9) == qual_of_prob(0.9)


def test_probabilities_rounding_recursive():
    out = vcf.probabilities([[0.12345, 1], 0.999999], 3)
    assert out[0][0] == pytest.approx(0.123)
    assert out[0][1] == 1
    assert out[1] == pytest.approx(1.0)
