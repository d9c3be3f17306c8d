"""Exact-enumeration caller tests vs a brute-force oracle.

Mirrors the regime of reference test_calling/test_calling_exact.py:
posterior normalisation, mode recovery at high depth, allele frequencies.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.numerics.combinadics import enumerate_genotypes
from mchap_tpu.ops import exact, priors
from mchap_tpu.testing import simulate_reads
from tests.test_likelihood import oracle_log_likelihood, random_reads


def oracle_genotype_likelihoods(reads, ploidy, haplotypes, read_counts=None):
    table = enumerate_genotypes(len(haplotypes), ploidy)
    return np.array(
        [oracle_log_likelihood(reads, haplotypes[g], read_counts) for g in table]
    )


@pytest.mark.parametrize("seed", range(5))
def test_genotype_likelihoods_fuzz(seed):
    rng = np.random.default_rng(seed)
    ploidy = int(rng.integers(1, 5))
    n_base = int(rng.integers(1, 8))
    n_nucl = int(rng.integers(2, 4))
    n_haps = int(rng.integers(2, 6))
    n_reads = int(rng.integers(1, 15))
    reads = random_reads(rng, n_reads, n_base, n_nucl)
    haplotypes = rng.integers(0, n_nucl, size=(n_haps, n_base)).astype(np.int8)
    counts = rng.integers(1, 4, size=n_reads)

    got = np.asarray(exact.genotype_likelihoods(reads, ploidy, haplotypes, counts))
    want = oracle_genotype_likelihoods(reads, ploidy, haplotypes, counts)
    np.testing.assert_allclose(got, want, rtol=1e-8)


@pytest.mark.parametrize("prior", [None, (0.0, None), (0.2, None), (0.2, np.array([0.5, 0.3, 0.2]))])
def test_genotype_posteriors_normalise(prior):
    rng = np.random.default_rng(3)
    reads = random_reads(rng, 10, 4, 2)
    haplotypes = np.array([[0, 0, 0, 0], [0, 1, 0, 1], [1, 1, 1, 1]], dtype=np.int8)
    llks = exact.genotype_likelihoods(reads, 4, haplotypes)
    post = np.asarray(exact.genotype_posteriors(llks, 4, 3, prior=prior))
    assert post.sum() == pytest.approx(1.0, rel=1e-8)
    # prior shifts the posterior but keeps it a distribution
    if prior is not None and prior[0] > 0:
        flat = np.asarray(exact.genotype_posteriors(llks, 4, 3, prior=None))
        assert not np.allclose(post, flat)


def test_posterior_mode_recovers_truth_high_depth():
    haplotypes = np.array(
        [[0, 0, 0, 0], [0, 1, 1, 0], [1, 1, 1, 1], [1, 0, 0, 1]], dtype=np.int8
    )
    truth = np.array([0, 0, 2, 2])
    reads = simulate_reads(
        haplotypes[truth], n_alleles=2, n_reads=40, errors=False, seed=11
    )
    alleles, llk, prob = exact.posterior_mode(reads, 4, haplotypes)
    np.testing.assert_array_equal(np.asarray(alleles), truth)
    assert prob > 0.9
    assert np.isfinite(llk)


def test_posterior_mode_statistics():
    haplotypes = np.array([[0, 0], [0, 1], [1, 1]], dtype=np.int8)
    truth = np.array([0, 0, 1, 2])
    reads = simulate_reads(haplotypes[truth], n_alleles=2, n_reads=60, errors=False, seed=5)
    alleles, llk, prob, support, freqs, occur = exact.posterior_mode(
        reads,
        4,
        haplotypes,
        return_support_prob=True,
        return_posterior_frequencies=True,
        return_posterior_occurrence=True,
    )
    assert support >= prob
    assert freqs.shape == (3,)
    assert occur.shape == (3,)
    assert freqs.sum() == pytest.approx(1.0, rel=1e-6)
    assert np.all(occur <= 1.0 + 1e-9)
    # every allele of the mode occurs with high probability
    for a in np.unique(np.asarray(alleles)):
        assert occur[a] > 0.5


def test_posterior_allele_frequencies_oracle():
    rng = np.random.default_rng(8)
    reads = random_reads(rng, 12, 3, 2)
    haplotypes = np.array([[0, 0, 0], [0, 1, 1], [1, 1, 1]], dtype=np.int8)
    ploidy = 4
    llks = exact.genotype_likelihoods(reads, ploidy, haplotypes)
    post = np.asarray(exact.genotype_posteriors(llks, ploidy, 3))
    freqs, counts, occur = exact.posterior_allele_frequencies(jnp.asarray(post), ploidy, 3)
    table = enumerate_genotypes(3, ploidy)
    want_counts = np.zeros(3)
    want_occur = np.zeros(3)
    for g, p in zip(table, post):
        for a in np.unique(g):
            want_occur[a] += p
        for a in g:
            want_counts[a] += p
    np.testing.assert_allclose(np.asarray(counts), want_counts, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(occur), want_occur, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(freqs), want_counts / ploidy, rtol=1e-8)


def test_mode_genotype_support():
    """Support prob = sum over all dosage alternatives of the mode's alleles."""
    rng = np.random.default_rng(9)
    reads = random_reads(rng, 10, 3, 2)
    haplotypes = np.array([[0, 0, 0], [0, 1, 1], [1, 1, 1]], dtype=np.int8)
    ploidy = 4
    llks = exact.genotype_likelihoods(reads, ploidy, haplotypes)
    post = np.asarray(exact.genotype_posteriors(llks, ploidy, 3))
    alleles, mode_prob, support_prob, idx = exact.mode_genotype(
        jnp.asarray(post), ploidy, 3
    )
    table = enumerate_genotypes(3, ploidy)
    support = set(np.unique(np.asarray(alleles)))
    want = sum(p for g, p in zip(table, post) if set(np.unique(g)) == support)
    assert float(support_prob) == pytest.approx(want, rel=1e-8)
    genotypes, probs = exact.alternate_dosage_posteriors(np.asarray(alleles), post)
    assert probs.sum() == pytest.approx(want, rel=1e-8)
    assert np.any(np.all(genotypes == np.asarray(alleles), axis=-1))
