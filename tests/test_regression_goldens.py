"""Byte-equality regression gates for this implementation's own output.

The reference's stochastic goldens can't be matched bit-for-bit (numba
RNG); these goldens are OUR deterministic outputs at --mcmc-seed 11
(regenerated with scripts in the files' headers), giving future changes
a byte-level regression oracle for the full sampler + VCF pipeline —
the same role the reference's checked-in goldens play for it
(SURVEY.md §4.3).
"""

import pathlib

import pytest

from tests.golden import data_path, run_stdout_lines

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden_outputs"


def _strip(lines):
    return [
        ln
        for ln in lines
        if not ln.startswith("##fileDate") and not ln.startswith("##commandline")
    ]


def test_call_regression_golden():
    from mchap_tpu.application.call import program

    command = (
        ["mchap", "call", "--bam"]
        + [
            data_path(b)
            for b in ("simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam")
        ]
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("simple.output.assemble.vcf"),
            "--mcmc-seed", "11", "--mcmc-steps", "500", "--mcmc-burn", "100",
        ]
    )
    lines = _strip(run_stdout_lines(program.cli(command)))
    golden = _strip((GOLDEN_DIR / "simple.call.seed11.vcf").read_text().splitlines(keepends=True))
    assert lines == golden


def test_assemble_regression_golden():
    from mchap_tpu.application.assemble import program

    command = (
        ["mchap", "assemble", "--bam"]
        + [
            data_path(b)
            for b in ("simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam")
        ]
        + [
            "--ploidy", "4",
            "--targets", data_path("simple.bed"),
            "--variants", data_path("simple.vcf.gz"),
            "--reference", data_path("simple.fasta"),
            "--mcmc-seed", "11", "--mcmc-steps", "500", "--mcmc-burn", "100",
        ]
    )
    lines = _strip(run_stdout_lines(program.cli(command)))
    golden = _strip((GOLDEN_DIR / "simple.assemble.seed11.vcf").read_text().splitlines(keepends=True))
    assert lines == golden
