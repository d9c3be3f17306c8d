"""Unit tests for the numerics core (combinadics, dosage, logprob).

Oracles are independent brute-force computations (math.comb, itertools),
mirroring the regimes of reference test_jitutils.py.
"""

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.numerics import combinadics, dosage, logprob


# ---------------------------------------------------------------------------
# combinadics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [0, 1, 2, 3, 4, 6, 8])
def test_comb_matches_math(k):
    ns = np.arange(0, 60)
    got = np.asarray(combinadics.comb(ns, k))
    want = np.array([math.comb(int(n), k) for n in ns])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [1, 2, 4])
def test_comb_with_replacement(k):
    ns = np.arange(0, 40)
    got = np.asarray(combinadics.comb_with_replacement(ns, k))
    want = np.array([math.comb(int(n) + k - 1, k) if (n, k) != (0, 0) else 0 for n in ns])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_alleles,ploidy", [(2, 2), (3, 2), (4, 4), (8, 4), (5, 6), (16, 2)])
def test_enumerate_genotypes_is_vcf_order(n_alleles, ploidy):
    table = combinadics.enumerate_genotypes(n_alleles, ploidy)
    assert table.shape == (combinadics.count_unique_genotypes(n_alleles, ploidy), ploidy)
    # each row ascending
    assert np.all(np.diff(table, axis=-1) >= 0)
    # row g has combinadic index g
    idx = np.asarray(combinadics.genotype_alleles_as_index(table))
    np.testing.assert_array_equal(idx, np.arange(len(table)))
    # rows unique & exhaustive
    assert len({tuple(r) for r in table}) == len(table)


@pytest.mark.parametrize("ploidy", [1, 2, 3, 4, 6])
def test_index_alleles_roundtrip(ploidy):
    table = combinadics.enumerate_genotypes(5, ploidy)
    for g in range(len(table)):
        alleles = combinadics.index_as_genotype_alleles_np(g, ploidy)
        np.testing.assert_array_equal(alleles, table[g])


def test_index_as_genotype_alleles_negative():
    np.testing.assert_array_equal(
        combinadics.index_as_genotype_alleles_np(-1, 4), np.full(4, -1)
    )


def test_counting_functions():
    assert combinadics.count_unique_haplotypes([2, 2, 3]) == 12
    assert combinadics.count_unique_genotypes(16, 4) == math.comb(19, 4)
    assert combinadics.count_unique_genotype_permutations(4, 3) == 64
    assert combinadics.count_genotype_permutations([2, 1, 1, 0]) == 12
    assert combinadics.count_haplotype_universial_occurance(4, 2) == math.factorial(
        5
    ) // (math.factorial(1) * math.factorial(4))


# ---------------------------------------------------------------------------
# dosage
# ---------------------------------------------------------------------------


def test_allelic_dosage():
    got = np.asarray(dosage.allelic_dosage(jnp.array([0, 0, 1, 2])))
    np.testing.assert_array_equal(got, [2, 0, 1, 1])
    got = np.asarray(dosage.allelic_dosage(jnp.array([5, 5, 5, 5])))
    np.testing.assert_array_equal(got, [4, 0, 0, 0])
    # batched
    got = np.asarray(dosage.allelic_dosage(jnp.array([[0, 1], [1, 1]])))
    np.testing.assert_array_equal(got, [[1, 1], [2, 0]])


def test_count_allele():
    assert int(dosage.count_allele(jnp.array([0, 1, 1, 2]), 1)) == 2
    assert int(dosage.count_allele(jnp.array([0, 1, 1, 2]), 3)) == 0


def test_ln_equivalent_permutations():
    for dose, want in [([4, 0, 0, 0], 1), ([2, 2, 0, 0], 6), ([1, 1, 1, 1], 24), ([2, 1, 1, 0], 12)]:
        got = float(dosage.ln_equivalent_permutations(jnp.array(dose)))
        assert got == pytest.approx(math.log(want))


def test_haplotype_dosage():
    genotype = jnp.array([[0, 1], [0, 1], [1, 1], [0, 1]])
    got = np.asarray(dosage.haplotype_dosage(genotype))
    np.testing.assert_array_equal(got, [3, 0, 1, 0])


# ---------------------------------------------------------------------------
# logprob
# ---------------------------------------------------------------------------


def test_normalise_log_probs():
    llks = jnp.log(jnp.array([0.1, 0.2, 0.4]))
    got = np.asarray(logprob.normalise_log_probs(llks))
    np.testing.assert_allclose(got, [1 / 7, 2 / 7, 4 / 7], rtol=1e-12)


def test_normalise_log_probs_with_inf():
    llks = jnp.array([-jnp.inf, 0.0, -jnp.inf])
    got = np.asarray(logprob.normalise_log_probs(llks))
    np.testing.assert_allclose(got, [0.0, 1.0, 0.0])


def test_random_choice_distribution():
    key = jax.random.PRNGKey(0)
    probs = jnp.array([0.2, 0.5, 0.3])
    draws = jax.vmap(lambda k: logprob.random_choice(k, probs))(
        jax.random.split(key, 4000)
    )
    freqs = np.bincount(np.asarray(draws), minlength=3) / 4000
    np.testing.assert_allclose(freqs, np.asarray(probs), atol=0.03)


def test_random_choice_never_selects_zero_prob():
    key = jax.random.PRNGKey(1)
    probs = jnp.array([0.0, 1.0, 0.0])
    draws = jax.vmap(lambda k: logprob.random_choice(k, probs))(
        jax.random.split(key, 500)
    )
    assert np.all(np.asarray(draws) == 1)


def test_natural_log_to_log10():
    assert float(logprob.natural_log_to_log10(jnp.log(100.0))) == pytest.approx(2.0)
