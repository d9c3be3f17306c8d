"""Golden-file tests for ``mchap find-snvs`` (deterministic).

Same parametrization as reference test_application_find_snvs.py minus
the CRAM inputs.
"""

import contextlib
import io

import pytest

from mchap_tpu.application.find_snvs import main
from tests.golden import assert_vcf_equal, data_path


@pytest.mark.parametrize(
    "bams, extra, output_vcf",
    [
        (
            ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"],
            [],
            "simple.output.basis.vcf",
        ),
        (
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            [],
            "simple.output.basis.mixed_depth.vcf",
        ),
        (
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            ["--ind-maf", "0", "--ind-mad", "0", "--maf", "0.1"],
            "simple.output.basis.mixed_depth.maf0.1.vcf",
        ),
        (
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            ["--ind-maf", "0", "--ind-mad", "0", "--mad", "10"],
            "simple.output.basis.mixed_depth.mad10.vcf",
        ),
        (
            ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"],
            ["--ind-maf", "0.3"],
            "simple.output.basis.minaf0.3.vcf",
        ),
        (
            ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"],
            ["--ind-mad", "2"],
            "simple.output.basis.minad2.vcf",
        ),
        (
            ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"],
            ["--ind-maf", "0.0", "--ind-mad", "0"],
            "simple.output.basis.minaf0.minad0.vcf",
        ),
    ],
)
def test_find_snvs_golden(bams, extra, output_vcf):
    command = (
        [
            "mchap", "find-snvs",
            "--targets", data_path("simple.bed"),
            "--reference", data_path("simple.fasta"),
            "--bam",
        ]
        + [data_path(b) for b in bams]
        + extra
    )
    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        main(command)
    lines = buffer.getvalue().splitlines(keepends=True)
    assert_vcf_equal(lines, output_vcf, skip_exact_lines=("##reference",))
