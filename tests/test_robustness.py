"""Robustness gates: higher ploidy, MH-vs-Gibbs stationary equivalence,
the --region flag, and mixed allele counts."""

import numpy as np
import pytest

from mchap_tpu.models.assemble import DenovoMCMC
from mchap_tpu.models.calling import CallingMCMC
from mchap_tpu.ops import exact
from mchap_tpu.testing import metropolis_hastings_transitions, simulate_reads


def test_hexaploid_calling_matches_exact():
    panel = np.array(
        [[0, 0, 0], [0, 1, 1], [1, 1, 0], [1, 1, 1]], dtype=np.int8
    )
    truth = panel[[0, 0, 1, 1, 2, 3]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=10, qual=(16, 24), seed=4)
    trace = (
        CallingMCMC(ploidy=6, haplotypes=panel, steps=3000, chains=2, random_seed=3)
        .fit(reads)
        .burn(500)
    )
    got = trace.posterior().as_array(len(panel))
    llks = exact.genotype_likelihoods(reads, 6, panel)
    want = np.asarray(exact.genotype_posteriors(llks, 6, len(panel)))
    np.testing.assert_allclose(got, want, atol=0.06)


def test_hexaploid_denovo_runs():
    haps = np.array([[0, 0], [0, 1], [1, 1]], dtype=np.int8)
    truth = haps[[0, 0, 1, 1, 2, 2]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=60, errors=False, seed=5)
    trace = (
        DenovoMCMC(ploidy=6, n_alleles=[2, 2], steps=600, chains=2, random_seed=7)
        .fit(reads)
        .burn(100)
    )
    mode, prob = trace.posterior().mode()
    np.testing.assert_array_equal(mode, np.array(sorted(truth.tolist())))
    assert prob > 0.8


def test_triallelic_position_calling():
    panel = np.array([[0, 0], [1, 2], [2, 1]], dtype=np.int8)
    truth = panel[[0, 0, 1, 2]]
    reads = simulate_reads(truth, n_alleles=3, n_reads=50, errors=False, seed=6)
    trace = (
        CallingMCMC(ploidy=4, haplotypes=panel, steps=1000, chains=2, random_seed=2)
        .fit(reads)
        .burn(200)
    )
    mode, prob = trace.posterior().mode()
    np.testing.assert_array_equal(mode, [0, 0, 1, 2])
    assert prob > 0.9


def test_mh_transition_matrix_stationary_equals_gibbs_conditional():
    """The MH oracle's 1000-step transition matrix must converge to the
    normalized joint — the distribution the Gibbs conditional samples
    directly (reference test_calling_mcmc.py:18-105 regime)."""
    rng = np.random.default_rng(0)
    n_states = 5
    llks = rng.normal(size=n_states)
    priors = np.full(n_states, 1 / n_states)
    transitions = np.ones((n_states, n_states)) - np.eye(n_states)
    mh = metropolis_hastings_transitions(transitions, llks, priors)
    assert np.allclose(mh.sum(axis=-1), 1.0)
    stationary = np.linalg.matrix_power(mh, 1000)[0]
    want = np.exp(llks) * priors
    want /= want.sum()
    np.testing.assert_allclose(stationary, want, atol=1e-6)


def test_assemble_region_flag(fixture_data_dir):
    """--region yields the same record as the matching --targets row."""
    from mchap_tpu.application.assemble import program
    from tests.golden import run_stdout_lines

    base = [
        "mchap", "assemble", "--bam",
        str(fixture_data_dir / "simple.sample1.bam"),
        "--ploidy", "4",
        "--variants", str(fixture_data_dir / "simple.vcf.gz"),
        "--reference", str(fixture_data_dir / "simple.fasta"),
        "--mcmc-seed", "11", "--mcmc-steps", "300", "--mcmc-burn", "50",
    ]
    with_region = program.cli(
        base + ["--region", "CHR1:5-25", "--region-id", "CHR1_05_25"]
    )
    lines = [
        ln for ln in run_stdout_lines(with_region) if not ln.startswith("#")
    ]
    assert len(lines) == 1
    fields = lines[0].split("\t")
    assert fields[0] == "CHR1" and fields[1] == "6" and fields[2] == "CHR1_05_25"
    assert fields[6] == "PASS"
