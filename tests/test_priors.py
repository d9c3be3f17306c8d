"""Prior math tests vs scipy's Dirichlet-multinomial and direct formulas."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from mchap_tpu.numerics.dosage import allelic_dosage
from mchap_tpu.ops import priors


def dm_logpmf(counts, alphas):
    """scipy oracle for the Dirichlet-multinomial pmf over category counts."""
    n = int(np.sum(counts))
    return stats.dirichlet_multinomial.logpmf(np.asarray(counts), alphas, n)


def full_dosage(genotype, n_alleles):
    """Category counts [n_alleles] of an allele-index genotype."""
    return np.bincount(np.asarray(genotype), minlength=n_alleles)


def test_flat_dosage_prior():
    # flat prior = permutations / u_haps^ploidy
    genotype = jnp.array([0, 0, 1, 2])
    dose = allelic_dosage(genotype)
    got = float(priors.log_genotype_prior_dosage(dose, np.log(16.0), inbreeding=0.0))
    want = math.log(12 / 16**4)
    assert got == pytest.approx(want, rel=1e-10)


@pytest.mark.parametrize("inbreeding", [0.1, 0.25, 0.5])
@pytest.mark.parametrize("genotype", [[0, 0, 0, 0], [0, 0, 1, 2], [0, 1, 2, 3]])
def test_dirmul_dosage_prior_vs_scipy(inbreeding, genotype):
    u_haps = 16
    genotype = jnp.array(genotype)
    dose = allelic_dosage(genotype)
    got = float(
        priors.log_genotype_prior_dosage(dose, np.log(float(u_haps)), inbreeding=inbreeding)
    )
    alpha = (1 / u_haps) * (1 - inbreeding) / inbreeding
    counts = full_dosage(genotype, u_haps)
    want = dm_logpmf(counts, np.full(u_haps, alpha))
    assert got == pytest.approx(want, rel=1e-8)


@pytest.mark.parametrize("inbreeding", [0.0, 0.1, 0.5])
def test_calling_prior_matches_dosage_prior_flat_freqs(inbreeding):
    # with no frequencies the calling-side prior equals the assemble-side prior
    n_alleles = 8
    genotype = jnp.array([0, 2, 2, 5])
    got = float(
        priors.log_genotype_prior(genotype, n_alleles, inbreeding=inbreeding)
    )
    dose = allelic_dosage(genotype)
    want = float(
        priors.log_genotype_prior_dosage(dose, np.log(float(n_alleles)), inbreeding=inbreeding)
    )
    assert got == pytest.approx(want, rel=1e-10)


@pytest.mark.parametrize("inbreeding", [0.1, 0.4])
def test_calling_prior_with_frequencies_vs_scipy(inbreeding):
    n_alleles = 4
    freqs = np.array([0.4, 0.3, 0.2, 0.1])
    genotype = jnp.array([0, 1, 1, 3])
    got = float(
        priors.log_genotype_prior(
            genotype, n_alleles, inbreeding=inbreeding, frequencies=freqs
        )
    )
    alphas = freqs * (1 - inbreeding) / inbreeding
    want = dm_logpmf(full_dosage(genotype, n_alleles), alphas)
    assert got == pytest.approx(want, rel=1e-8)


def test_calling_prior_frequencies_no_inbreeding():
    freqs = np.array([0.5, 0.25, 0.25])
    genotype = jnp.array([0, 0, 1, 2])
    got = float(priors.log_genotype_prior(genotype, 3, inbreeding=0.0, frequencies=freqs))
    want = math.log(12 * 0.5 * 0.5 * 0.25 * 0.25)
    assert got == pytest.approx(want, rel=1e-10)


def test_allele_flat_prior():
    genotype = jnp.array([0, 1, 1, 2])
    got = float(priors.log_genotype_allele_flat_prior(genotype, jnp.asarray(1)))
    assert got == pytest.approx(math.log(2))


def test_conditional_allele_prior_normalises():
    """Gibbs conditional prior sums to 1 over the variable allele options."""
    n_alleles = 5
    base = np.array([0, 3, 3, 2])
    for inbreeding, freqs in [(0.0, None), (0.2, None), (0.2, np.full(5, 0.2)), (0.3, np.array([0.4, 0.2, 0.2, 0.1, 0.1]))]:
        total = 0.0
        for a in range(n_alleles):
            g = base.copy()
            g[1] = a
            total += math.exp(
                float(
                    priors.log_genotype_allele_prior(
                        jnp.asarray(g), jnp.asarray(1), n_alleles,
                        inbreeding=inbreeding, frequencies=freqs,
                    )
                )
            )
        assert total == pytest.approx(1.0, rel=1e-8)


def test_conditional_allele_prior_consistent_with_joint():
    """P(a | rest) proportional to P(genotype) over options of one slot."""
    n_alleles = 4
    inbreeding = 0.3
    freqs = np.array([0.4, 0.3, 0.2, 0.1])
    base = np.array([2, 0, 1, 1])
    conds = []
    joints = []
    for a in range(n_alleles):
        g = base.copy()
        g[0] = a
        conds.append(
            float(
                priors.log_genotype_allele_prior(
                    jnp.asarray(g), jnp.asarray(0), n_alleles,
                    inbreeding=inbreeding, frequencies=freqs,
                )
            )
        )
        # joint prior of unordered genotype divided by number of equivalent
        # orderings that fix the other slots = pmf of counts; conditional is
        # proportional to the joint over counts
        alphas = freqs * (1 - inbreeding) / inbreeding
        joints.append(dm_logpmf(full_dosage(g, n_alleles), alphas))
    conds = np.exp(np.array(conds))
    joints = np.exp(np.array(joints))
    # joint over counts has multinomial coefficient; conditional removes the
    # orderings of constant slots — ratios over 'a' must match after
    # normalisation by the per-option count multiplicities
    base_counts = np.bincount(base[1:], minlength=n_alleles)
    mult = base_counts + 1  # count of the variable allele in each option
    # P(slot=a | rest) ∝ P(ordered draws) = pmf(counts) / multinomial_coeff,
    # and the coefficient for option a divides by (base_count_a + 1)!, so
    # conditional ∝ pmf × (base_count_a + 1).
    np.testing.assert_allclose(
        conds / conds.sum(), (joints * mult) / (joints * mult).sum(), rtol=1e-8
    )
