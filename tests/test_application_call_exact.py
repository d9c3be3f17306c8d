"""Golden-file tests for ``mchap call-exact`` (deterministic: exact
byte equality with the reference's checked-in outputs).

Same parametrization as reference test_application_call_exact.py,
including the CRAM inputs (decoded by the native cramreader).
"""

import pytest

from mchap_tpu.application.call_exact import program
from tests.golden import assert_vcf_equal, data_path, run_stdout_lines


@pytest.mark.parametrize(
    "input_vcf,bams,cli_extra,output_vcf",
    [
        (
            "simple.output.assemble.vcf",
            ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"],
            [],
            "simple.output.call-exact.vcf",
        ),
        (
            "simple.output.assemble.vcf",
            [
                "simple.sample1.broken.cram",
                "simple.sample2.broken.cram",
                "simple.sample3.broken.cram",
            ],
            ["--reference", data_path("simple.fasta")],
            "simple.output.call-exact.vcf",  # identical results from bam/cram
        ),
        (
            "simple.output.mixed_depth.assemble.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            ["--report", "SNVDP"],
            "simple.output.mixed_depth.call-exact.vcf",
        ),
        (
            "simple.output.mixed_depth.assemble.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            ["--report", "AFP"],
            "simple.output.mixed_depth.call-exact.frequencies.vcf",
        ),
        (
            "simple.output.mixed_depth.assemble.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            ["--report", "ACP"],
            "simple.output.mixed_depth.call-exact.counts.vcf",
        ),
        (
            "simple.output.mixed_depth.assemble.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            ["--report", "AOP", "AOPSUM"],
            "simple.output.mixed_depth.call-exact.occurrence.vcf",
        ),
        (
            "mock.input.frequencies.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            [
                "--use-dirmul-prior", "0.0", "AFP",
                "--filter-input-haplotypes", "AFP>=0.1",
                "--report", "AFPRIOR", "AFP",
            ],
            "simple.output.mixed_depth.call-exact.frequencies.skiprare.vcf",
        ),
        (
            "mock.input.frequencies.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            [
                "--use-dirmul-prior", "0.0", "AFP",
                "--filter-input-haplotypes", "AFP>=0.1",
                "--report", "AFP", "GP",
            ],
            "simple.output.mixed_depth.call-exact.frequencies.posteriors.skiprare.vcf",
        ),
        (
            "mock.input.frequencies.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            [
                "--use-dirmul-prior", "0.0", "AFP",
                "--report", "AFPRIOR", "AFP",
            ],
            "simple.output.mixed_depth.call-exact.frequencies.prior.vcf",
        ),
        (
            "simple.output.mixed_depth.assemble.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            ["--report", "GL", "--base-error-rate", "0.0", "--use-base-phred-scores"],
            "simple.output.mixed_depth.call-exact.likelihoods.vcf",
        ),
        (
            "simple.output.mixed_depth.assemble.vcf",
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            ["--report", "GP"],
            "simple.output.mixed_depth.call-exact.posteriors.vcf",
        ),
        (
            "simple.output.assemble.vcf",
            [
                "simple.sample1.deep.bam",
                "simple.sample2.deep.bam",
                "simple.sample3.deep.bam",
            ],
            [
                "--ploidy", data_path("simple.pools-ploidy"),
                "--sample-pool", data_path("simple.pools"),
            ],
            "simple.output.deep.call-exact.pools.vcf",
        ),
    ],
)
def test_call_exact_golden(input_vcf, bams, cli_extra, output_vcf):
    command = (
        ["mchap", "call-exact", "--bam"]
        + [data_path(b) for b in bams]
        + ["--ploidy", "4", "--haplotypes", data_path(input_vcf)]
        + cli_extra
    )
    prog = program.cli(command)
    lines = run_stdout_lines(prog)
    assert_vcf_equal(lines, output_vcf)
