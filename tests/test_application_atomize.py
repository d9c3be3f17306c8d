"""Golden-file tests for ``mchap atomize`` (deterministic)."""

import contextlib
import io

import pytest

from mchap_tpu.application.atomize import main
from tests.golden import assert_vcf_equal, data_path


@pytest.mark.parametrize(
    "input_vcf, output_vcf",
    [
        (
            "simple.output.mixed_depth.assemble.vcf",
            "simple.output.mixed_depth.assemble.atomize.vcf",
        ),
        (
            "simple.output.mixed_depth.assemble.counts.vcf",
            "simple.output.mixed_depth.assemble.counts.atomize.vcf",
        ),
        (
            "simple.output.mixed_depth.assemble.frequencies.vcf",
            "simple.output.mixed_depth.assemble.frequencies.atomize.vcf",
        ),
    ],
)
def test_atomize_golden(input_vcf, output_vcf):
    command = ["mchap", "atomize", data_path(input_vcf)]
    buffer = io.StringIO()
    with pytest.warns(UserWarning, match="EXPERIMENTAL"):
        with contextlib.redirect_stdout(buffer):
            main(command)
    lines = buffer.getvalue().splitlines(keepends=True)
    assert_vcf_equal(lines, output_vcf)
