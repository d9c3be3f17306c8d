"""Likelihood kernel tests vs an independent brute-force oracle.

Mirrors the fuzz regime of reference test_assemble/test_likelihood.py:
random shapes, probabilistic reads with gaps, exact hand-computable cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.ops import likelihood


def oracle_log_likelihood(reads, genotype, read_counts=None):
    """Straightforward triple-loop oracle (independent of the device code)."""
    ploidy, n_base = genotype.shape
    llk = 0.0
    for r in range(len(reads)):
        read_prob = 0.0
        for h in range(ploidy):
            prod = 1.0
            for j in range(n_base):
                val = reads[r, j, genotype[h, j]]
                if not np.isnan(val):
                    prod *= val
            read_prob += prod / ploidy
        term = np.log(read_prob)
        if read_counts is not None:
            term *= read_counts[r]
        llk += term
    return llk


def random_reads(rng, n_reads, n_base, n_nucl, gap_rate=0.2):
    alleles = rng.integers(0, n_nucl, size=(n_reads, n_base))
    p = rng.uniform(0.6, 0.999, size=(n_reads, n_base))
    onehot = alleles[..., None] == np.arange(n_nucl)
    reads = np.where(onehot, p[..., None], ((1 - p) / (n_nucl - 1))[..., None])
    gaps = rng.random((n_reads, n_base)) < gap_rate
    reads[gaps] = np.nan
    return reads


def test_log_likelihood_exact_small():
    # one read, one haplotype pair, hand-computable
    reads = np.array([[[0.9, 0.1], [0.8, 0.2]]])
    genotype = np.array([[0, 0], [1, 1]], dtype=np.int8)
    want = np.log((0.9 * 0.8 + 0.1 * 0.2) / 2)
    got = float(likelihood.log_likelihood(reads, jnp.asarray(genotype)))
    assert got == pytest.approx(want, rel=1e-10)


def test_log_likelihood_gaps_ignored():
    reads = np.array([[[0.9, 0.1], [np.nan, np.nan]]])
    genotype = np.array([[0, 0], [1, 1]], dtype=np.int8)
    want = np.log((0.9 + 0.1) / 2)
    got = float(likelihood.log_likelihood(reads, jnp.asarray(genotype)))
    assert got == pytest.approx(want, rel=1e-10)


@pytest.mark.parametrize("seed", range(8))
def test_log_likelihood_fuzz(seed):
    rng = np.random.default_rng(seed)
    ploidy = int(rng.integers(1, 5))
    n_base = int(rng.integers(1, 12))
    n_nucl = int(rng.integers(2, 5))
    n_reads = int(rng.integers(1, 20))
    reads = random_reads(rng, n_reads, n_base, n_nucl)
    genotype = rng.integers(0, n_nucl, size=(ploidy, n_base)).astype(np.int8)
    counts = rng.integers(1, 5, size=n_reads)

    want = oracle_log_likelihood(reads, genotype, counts)
    got = float(likelihood.log_likelihood(reads, jnp.asarray(genotype), jnp.asarray(counts)))
    assert got == pytest.approx(want, rel=1e-8)

    want = oracle_log_likelihood(reads, genotype)
    got = float(likelihood.log_likelihood(reads, jnp.asarray(genotype)))
    assert got == pytest.approx(want, rel=1e-8)


@pytest.mark.parametrize("seed", range(4))
def test_read_hap_matrix_path_matches_direct(seed):
    """Gather-from-precomputed-matrix path equals direct evaluation."""
    rng = np.random.default_rng(seed + 100)
    n_base, n_nucl, n_reads, n_haps, ploidy = 6, 3, 10, 5, 4
    reads = random_reads(rng, n_reads, n_base, n_nucl)
    panel = rng.integers(0, n_nucl, size=(n_haps, n_base)).astype(np.int8)
    genotype_alleles = rng.integers(0, n_haps, size=ploidy)

    log_reads = likelihood.prepare_reads(reads)
    read_hap = likelihood.read_hap_loglik(log_reads, jnp.asarray(panel))
    got = float(
        likelihood.log_likelihood_from_read_hap(read_hap, jnp.asarray(genotype_alleles))
    )
    want = oracle_log_likelihood(reads, panel[genotype_alleles])
    assert got == pytest.approx(want, rel=1e-8)


def test_batched_evaluation():
    """Leading batch axes vectorize across genotypes."""
    rng = np.random.default_rng(7)
    reads = random_reads(rng, 8, 5, 2)
    panel = rng.integers(0, 2, size=(4, 5)).astype(np.int8)
    log_reads = likelihood.prepare_reads(reads)
    read_hap = likelihood.read_hap_loglik(log_reads, jnp.asarray(panel))
    genotypes = jnp.asarray(rng.integers(0, 4, size=(10, 3)))
    got = np.asarray(
        likelihood.log_likelihood_from_read_hap(
            jnp.broadcast_to(read_hap, (10,) + read_hap.shape), genotypes
        )
    )
    for i in range(10):
        want = oracle_log_likelihood(reads, panel[np.asarray(genotypes[i])])
        assert got[i] == pytest.approx(want, rel=1e-8)
