"""Byte-equality regression gates for this implementation's own output.

The reference's stochastic goldens can't be matched bit-for-bit (numba
RNG); these goldens are OUR deterministic outputs at --mcmc-seed 11
(regenerated with scripts/gen_goldens.py), giving future changes a
byte-level regression oracle for the full sampler + VCF pipeline across
the option surface — pools, optional report fields, dirmul prior, prior
frequencies, temperature ladder, pedigree — the same role the
reference's ~60-golden matrix plays for it (SURVEY.md §4.3; reference
``mchap/tests/test_application_assemble.py:358-436``).
"""

import pathlib

import pytest

from tests.golden import run_stdout_lines
from tests.golden_configs import CONFIGS, build_program

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden_outputs"


def _strip(lines):
    return [
        ln
        for ln in lines
        if not ln.startswith("##fileDate") and not ln.startswith("##commandline")
    ]


@pytest.mark.parametrize("golden_name", sorted(CONFIGS))
def test_regression_golden(golden_name):
    lines = _strip(run_stdout_lines(build_program(CONFIGS[golden_name])))
    golden = _strip(
        (GOLDEN_DIR / golden_name).read_text().splitlines(keepends=True)
    )
    assert lines == golden
