"""Argument-parsing edge cases (port of the reference regime,
``mchap/tests/test_application_arguments.py``, widened to the other
literal-or-TSV parsers the reference exercises only via CLI goldens:
sample value maps, pedigree tables, tempering ladders, report fields).
"""

import pathlib

import pytest

from mchap_tpu.application.arguments import (
    parse_pedigree_arguments,
    parse_report_fields,
    parse_sample_pools,
    parse_sample_temperatures,
    parse_sample_value_map,
)
from mchap_tpu.io import vcf as VCF

DATA = pathlib.Path("/root/reference/mchap/tests/test_io/data")


def data_path(name):
    return str(DATA / name)


# ---------------------------------------------------------------------------
# parse_sample_pools (reference test_application_arguments.py:13-76)
# ---------------------------------------------------------------------------


def test_parse_sample_pools__none():
    samples = ["SAMPLE1", "SAMPLE2", "SAMPLE3"]
    sample_bams = {"SAMPLE1": "BAM1", "SAMPLE2": "BAM2", "SAMPLE3": "BAM3"}
    pools, pool_bams = parse_sample_pools(
        samples, sample_bams, sample_pool_argument=None
    )
    assert pools == samples
    assert pool_bams == {
        "SAMPLE1": [("SAMPLE1", "BAM1")],
        "SAMPLE2": [("SAMPLE2", "BAM2")],
        "SAMPLE3": [("SAMPLE3", "BAM3")],
    }


def test_parse_sample_pools__single():
    samples = ["SAMPLE1", "SAMPLE2", "SAMPLE3"]
    sample_bams = {"SAMPLE1": "BAM1", "SAMPLE2": "BAM2", "SAMPLE3": "BAM3"}
    pools, pool_bams = parse_sample_pools(
        samples, sample_bams, sample_pool_argument="POOL"
    )
    assert pools == ["POOL"]
    assert pool_bams == {
        "POOL": [("SAMPLE1", "BAM1"), ("SAMPLE2", "BAM2"), ("SAMPLE3", "BAM3")]
    }


def test_parse_sample_pools__file():
    samples = ["SAMPLE1", "SAMPLE2", "SAMPLE3"]
    sample_bams = {"SAMPLE1": "BAM1", "SAMPLE2": "BAM2", "SAMPLE3": "BAM3"}
    pools, pool_bams = parse_sample_pools(
        samples, sample_bams, sample_pool_argument=data_path("simple.pools")
    )
    assert pools == ["POOL1", "POOL2", "POOL3", "POOL13", "POOL123"]
    assert pool_bams == {
        "POOL1": [("SAMPLE1", "BAM1")],
        "POOL2": [("SAMPLE2", "BAM2")],
        "POOL3": [("SAMPLE3", "BAM3")],
        "POOL13": [("SAMPLE1", "BAM1"), ("SAMPLE3", "BAM3")],
        "POOL123": [
            ("SAMPLE1", "BAM1"),
            ("SAMPLE2", "BAM2"),
            ("SAMPLE3", "BAM3"),
        ],
    }


def test_parse_sample_pools__raise_on_missing_sample():
    samples = ["SAMPLE1", "SAMPLE2", "SAMPLE3", "SAMPLE4"]
    sample_bams = {"SAMPLE1": "BAM1", "SAMPLE2": "BAM2", "SAMPLE3": "BAM3"}
    with pytest.raises(
        ValueError,
        match="The following samples have not been assigned to a pool: {'SAMPLE4'}",
    ):
        parse_sample_pools(
            samples, sample_bams, sample_pool_argument=data_path("simple.pools")
        )


def test_parse_sample_pools__raise_on_unknown_sample():
    samples = ["SAMPLE1", "SAMPLE2"]
    sample_bams = {"SAMPLE1": "BAM1", "SAMPLE2": "BAM2", "SAMPLE3": "BAM3"}
    with pytest.raises(
        ValueError,
        match="The following names in the sample-pool file do not match a known sample : {'SAMPLE3'}",
    ):
        parse_sample_pools(
            samples, sample_bams, sample_pool_argument=data_path("simple.pools")
        )


# ---------------------------------------------------------------------------
# parse_sample_value_map (reference arguments.py:957-988 semantics)
# ---------------------------------------------------------------------------


def test_parse_sample_value_map__int_literal():
    got = parse_sample_value_map("4", ["S1", "S2"], type=int)
    assert got == {"S1": 4, "S2": 4}


def test_parse_sample_value_map__float_literal():
    got = parse_sample_value_map("0.01", ["S1", "S2"], type=float)
    assert got == {"S1": 0.01, "S2": 0.01}


def test_parse_sample_value_map__file(tmp_path):
    p = tmp_path / "ploidy.txt"
    p.write_text("S1\t2\nS2\t4\n")
    got = parse_sample_value_map(str(p), ["S1", "S2"], type=int)
    assert got == {"S1": 2, "S2": 4}


def test_parse_sample_value_map__missing_sample_raises(tmp_path):
    p = tmp_path / "ploidy.txt"
    p.write_text("S1\t2\n")
    with pytest.raises(ValueError, match="Sample 'S2' not found"):
        parse_sample_value_map(str(p), ["S1", "S2"], type=int)


# ---------------------------------------------------------------------------
# parse_sample_temperatures (reference arguments.py:1122-1166)
# ---------------------------------------------------------------------------


def test_parse_sample_temperatures__literal_sorted_and_capped():
    got = parse_sample_temperatures(["0.5", "0.25"], ["S1", "S2"])
    # sorted ascending, 1.0 appended when absent
    assert got == {"S1": [0.25, 0.5, 1.0], "S2": [0.25, 0.5, 1.0]}


def test_parse_sample_temperatures__literal_with_one():
    got = parse_sample_temperatures(["1.0", "0.5"], ["S1"])
    assert got == {"S1": [0.5, 1.0]}


def test_parse_sample_temperatures__file(tmp_path):
    p = tmp_path / "temps.txt"
    p.write_text("S1\t0.5\t0.25\n")
    got = parse_sample_temperatures([str(p)], ["S1", "S2"])
    # per-sample ladder from file; samples absent from the file get [1.0]
    assert got == {"S1": [0.25, 0.5, 1.0], "S2": [1.0]}


def test_parse_sample_temperatures__invalid_bounds():
    with pytest.raises(AssertionError):
        parse_sample_temperatures(["0.0", "0.5"], ["S1"])
    with pytest.raises(AssertionError):
        parse_sample_temperatures(["0.5", "1.5"], ["S1"])


# ---------------------------------------------------------------------------
# parse_pedigree_arguments (reference arguments.py:991-1119)
# ---------------------------------------------------------------------------


def _write_pedigree(tmp_path):
    p = tmp_path / "ped.txt"
    p.write_text("S1\t.\t.\nS2\t.\t.\nS3\tS1\tS2\n")
    return str(p)


def test_parse_pedigree_arguments__defaults(tmp_path):
    ped = _write_pedigree(tmp_path)
    got = parse_pedigree_arguments(
        samples=["S1", "S2", "S3"],
        sample_bams={"S1": "B1", "S2": "B2", "S3": "B3"},
        ploidy_argument="4",
        sample_parents_argument=ped,
        gamete_ploidy_argument=None,
        gamete_ibd_argument="0.0",
        gamete_error_argument="0.01",
    )
    assert got["sample_parents"] == {
        "S1": (None, None),
        "S2": (None, None),
        "S3": ("S1", "S2"),
    }
    # even ploidy halves into the default gamete tau
    assert got["gamete_ploidy"] == {s: (2, 2) for s in ["S1", "S2", "S3"]}
    assert got["gamete_ibd"] == {s: (0.0, 0.0) for s in ["S1", "S2", "S3"]}
    assert got["gamete_error"] == {s: (0.01, 0.01) for s in ["S1", "S2", "S3"]}


def test_parse_pedigree_arguments__adds_unsampled_parent(tmp_path):
    p = tmp_path / "ped.txt"
    # P0 has a pedigree ROW but no bam: it joins the cohort as a dummy
    # sample (reference arguments.py:1038-1048 — only row samples are
    # added, never names appearing solely in the parent columns)
    p.write_text("P0\t.\t.\nS1\tP0\t.\n")
    got = parse_pedigree_arguments(
        samples=["S1"],
        sample_bams={"S1": "B1"},
        ploidy_argument="2",
        sample_parents_argument=str(p),
        gamete_ploidy_argument="1",
        gamete_ibd_argument="0.0",
        gamete_error_argument="0.01",
    )
    assert got["samples"] == ["S1", "P0"]
    assert got["sample_bams"]["P0"] == []
    assert got["sample_parents"]["S1"] == ("P0", None)


def test_parse_pedigree_arguments__odd_ploidy_requires_tau(tmp_path):
    ped = _write_pedigree(tmp_path)
    with pytest.raises(ValueError, match="odd ploidy"):
        parse_pedigree_arguments(
            samples=["S1", "S2", "S3"],
            sample_bams={"S1": "B1", "S2": "B2", "S3": "B3"},
            ploidy_argument="3",
            sample_parents_argument=ped,
            gamete_ploidy_argument=None,
            gamete_ibd_argument="0.0",
            gamete_error_argument="0.01",
        )


def test_parse_pedigree_arguments__tau_file(tmp_path):
    ped = _write_pedigree(tmp_path)
    tau = tmp_path / "tau.txt"
    tau.write_text("S1\t2\t2\nS2\t2\t2\nS3\t1\t3\n")
    got = parse_pedigree_arguments(
        samples=["S1", "S2", "S3"],
        sample_bams={"S1": "B1", "S2": "B2", "S3": "B3"},
        ploidy_argument="4",
        sample_parents_argument=ped,
        gamete_ploidy_argument=str(tau),
        gamete_ibd_argument="0.0",
        gamete_error_argument="0.01",
    )
    assert got["gamete_ploidy"]["S3"] == (1, 3)


# ---------------------------------------------------------------------------
# parse_report_fields (reference arguments.py:1169-1185)
# ---------------------------------------------------------------------------


def test_parse_report_fields__none():
    info, fmt = parse_report_fields(None)
    assert [f.id for f in info] == [f.id for f in VCF.INFO_DEFAULT_FIELDS]
    assert [f.id for f in fmt] == [f.id for f in VCF.FORMAT_DEFAULT_FIELDS]


def test_parse_report_fields__bare_and_prefixed():
    info, fmt = parse_report_fields(["AFP", "FORMAT/GP"])
    info_ids = {f.id for f in info}
    fmt_ids = {f.id for f in fmt}
    # AFP exists in both INFO and FORMAT optional sets; the bare name
    # selects both, the prefixed name only its namespace
    assert "AFP" in info_ids
    assert "GP" in fmt_ids
    assert "GP" not in info_ids


def test_parse_report_fields__unknown_name_ignored():
    info, fmt = parse_report_fields(["NOT_A_FIELD"])
    assert [f.id for f in info] == [f.id for f in VCF.INFO_DEFAULT_FIELDS]
    assert [f.id for f in fmt] == [f.id for f in VCF.FORMAT_DEFAULT_FIELDS]
