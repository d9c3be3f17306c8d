"""Cross-locus batching of the exact caller.

The batched path (ops/exact.exact_posterior_stats_multi +
application.call_exact._call_locus_block) must reproduce the per-locus
exact results bit-for-bit at the VCF level: panel padding occupies a
provably zero-mass suffix of the VCF genotype table, so each problem's
sliced posterior is its own exact posterior (VERDICT r2 item #6;
reference semantics mchap/calling/exact.py:156-249).
"""

import numpy as np
import pytest

from mchap_tpu.ops import exact
from mchap_tpu.testing import simulate_reads


def _random_problems(with_prior):
    rng = np.random.default_rng(11)
    problems = []
    for i in range(5):
        n_pos = 2 + (i % 3)
        n_haps = 2 + (i % 4)  # heterogeneous panel sizes 2..5
        haps = np.zeros((n_haps, n_pos), np.int8)
        for h in range(1, n_haps):
            haps[h] = rng.integers(0, 2, n_pos)
        truth = haps[rng.integers(0, n_haps, 4)]
        reads = simulate_reads(
            truth, n_alleles=2, n_reads=6 + 2 * (i % 3), errors=False, seed=i
        )
        p = dict(reads=reads, counts=np.ones(len(reads)), haplotypes=haps)
        if with_prior:
            p["inbreeding"] = 0.05 + 0.05 * i
            freqs = rng.uniform(0.2, 1.0, n_haps)
            p["frequencies"] = freqs / freqs.sum()
        problems.append(p)
    return problems


@pytest.mark.parametrize("with_prior", [False, True])
def test_exact_stats_multi_matches_per_problem(with_prior):
    problems = _random_problems(with_prior)
    batched = exact.exact_posterior_stats_multi(problems, ploidy=4)
    for p, got in zip(problems, batched):
        prior = (
            (p["inbreeding"], p["frequencies"]) if with_prior else None
        )
        alleles, _, mode_prob, support_prob, freqs, occur = (
            exact.posterior_mode(
                p["reads"],
                4,
                p["haplotypes"],
                read_counts=p["counts"],
                prior=prior,
                return_support_prob=True,
                return_posterior_frequencies=True,
                return_posterior_occurrence=True,
            )
        )
        np.testing.assert_array_equal(got["alleles"], alleles)
        np.testing.assert_allclose(got["mode_prob"], mode_prob, rtol=1e-10)
        np.testing.assert_allclose(
            got["support_prob"], support_prob, rtol=1e-10
        )
        np.testing.assert_allclose(got["freqs"], freqs, rtol=1e-10)
        np.testing.assert_allclose(got["occur"], occur, rtol=1e-10)


def test_exact_stats_multi_uniform_frequencies_default():
    """inbreeding without frequencies == the reference's
    frequencies=None (uniform 1/H) parametrisation, which panel padding
    must not distort."""
    problems = _random_problems(False)
    for p in problems:
        p["inbreeding"] = 0.1
    batched = exact.exact_posterior_stats_multi(problems, ploidy=4)
    for p, got in zip(problems, batched):
        alleles, _, mode_prob = exact.posterior_mode(
            p["reads"],
            4,
            p["haplotypes"],
            read_counts=p["counts"],
            prior=(0.1, None),
        )
        np.testing.assert_array_equal(got["alleles"], alleles)
        np.testing.assert_allclose(got["mode_prob"], mode_prob, rtol=1e-10)


def test_exact_stats_multi_zero_reads_problem():
    problems = _random_problems(False)
    problems[2]["reads"] = problems[2]["reads"][:0]
    problems[2]["counts"] = problems[2]["counts"][:0]
    batched = exact.exact_posterior_stats_multi(problems, ploidy=4)
    p = problems[2]
    alleles, _, mode_prob = exact.posterior_mode(
        p["reads"], 4, p["haplotypes"], read_counts=p["counts"]
    )
    np.testing.assert_array_equal(batched[2]["alleles"], alleles)
    np.testing.assert_allclose(batched[2]["mode_prob"], mode_prob, rtol=1e-10)


@pytest.mark.parametrize(
    "input_vcf,cli_extra,output_vcf",
    [
        (
            "simple.output.assemble.vcf",
            [],
            "simple.output.call-exact.vcf",
        ),
        (
            "simple.output.mixed_depth.assemble.vcf",
            ["--report", "AFP"],
            "simple.output.mixed_depth.call-exact.frequencies.vcf",
        ),
        (
            "mock.input.frequencies.vcf",
            [
                "--use-dirmul-prior", "0.0", "AFP",
                "--filter-input-haplotypes", "AFP>=0.1",
                "--report", "AFPRIOR", "AFP",
            ],
            "simple.output.mixed_depth.call-exact.frequencies.skiprare.vcf",
        ),
        (
            # dense GP fields take the per-locus path inside the block
            "simple.output.mixed_depth.assemble.vcf",
            ["--report", "GP"],
            "simple.output.mixed_depth.call-exact.posteriors.vcf",
        ),
    ],
)
def test_call_exact_block_golden(
    monkeypatch, input_vcf, cli_extra, output_vcf
):
    """Block mode (MCHAP_LOCUS_BATCH=3) reproduces the reference golden
    VCFs byte-for-byte, including the NOA/AF0 and pooled-sample loci."""
    from mchap_tpu.application.call_exact import program
    from tests.golden import assert_vcf_equal, data_path, run_stdout_lines

    bams = (
        ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"]
        if "mixed_depth" in output_vcf or "skiprare" in output_vcf
        else ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"]
    )
    command = (
        ["mchap", "call-exact", "--bam"]
        + [data_path(b) for b in bams]
        + ["--ploidy", "4", "--haplotypes", data_path(input_vcf)]
        + cli_extra
    )
    monkeypatch.setenv("MCHAP_LOCUS_BATCH", "3")
    prog = program.cli(command)
    lines = run_stdout_lines(prog)
    assert_vcf_equal(lines, output_vcf)
