"""Application test for ``mchap call-pedigree`` (decision-level golden
comparison; PEDERR compared with stochastic tolerance)."""

import numpy as np
import pytest

from tests.golden import data_path, run_stdout_lines


@pytest.mark.parametrize(
    "cli_extra,output_vcf,dtype_env",
    [
        ([], "simple.output.mixed_depth.call-pedigree.p132.vcf", None),
        (
            ["--gamete-error", "0.5"],
            "simple.output.mixed_depth.call-pedigree.p132.gamerror0.5.vcf",
            None,
        ),
        # cross-locus batched device path (fit_pedigree_multi)
        (
            ["--locus-batch", "4"],
            "simple.output.mixed_depth.call-pedigree.p132.vcf",
            None,
        ),
        # the f32 fast path (the production dtype on accelerators, where
        # f64 is software-emulated) must reproduce the f64 golden
        # DECISIONS even on CPU, where auto would pick f64
        ([], "simple.output.mixed_depth.call-pedigree.p132.vcf", "f32"),
        (
            ["--locus-batch", "4"],
            "simple.output.mixed_depth.call-pedigree.p132.vcf",
            "f32",
        ),
    ],
)
def test_call_pedigree_decisions_match_golden(
    cli_extra, output_vcf, dtype_env, monkeypatch
):
    if dtype_env is not None:
        monkeypatch.setenv("MCHAP_PEDIGREE_DTYPE", dtype_env)
    from mchap_tpu.application.call_pedigree import program

    command = (
        ["mchap", "call-pedigree", "--bam"]
        + [
            data_path(b)
            for b in (
                "simple.sample1.bam",
                "simple.sample2.deep.bam",
                "simple.sample3.bam",
            )
        ]
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("simple.output.mixed_depth.assemble.vcf"),
            "--sample-parents", data_path("simple.pedigree.132.txt"),
            "--mcmc-seed", "11",
            "--mcmc-steps", "500",
            "--mcmc-burn", "100",
        ]
        + cli_extra
    )
    with pytest.warns(UserWarning, match="EXPERIMENTAL"):
        prog = program.cli(command)
    lines = run_stdout_lines(prog)
    with open(data_path(output_vcf)) as f:
        golden = f.readlines()

    records = [ln.rstrip("\n").split("\t") for ln in lines if not ln.startswith("#")]
    golden_records = [
        ln.rstrip("\n").split("\t") for ln in golden if not ln.startswith("#")
    ]
    assert len(records) == len(golden_records)
    for rec, want in zip(records, golden_records):
        assert rec[:5] == want[:5]
        assert rec[6] == want[6]
        assert rec[8] == want[8]
        fmt_keys = rec[8].split(":")
        for cell, want_cell in zip(rec[9:], want[9:]):
            got_vals = dict(zip(fmt_keys, cell.split(":")))
            want_vals = dict(zip(fmt_keys, want_cell.split(":")))
            assert got_vals["GT"] == want_vals["GT"]
            for key in ("DP", "RCOUNT", "RCALLS", "MEC"):
                assert got_vals[key] == want_vals[key], key
            # PEDERR is a posterior rate: compare within tolerance
            g, w = got_vals["PEDERR"], want_vals["PEDERR"]
            if g == "." or w == ".":
                assert g == w
            else:
                assert abs(float(g) - float(w)) < 0.15
