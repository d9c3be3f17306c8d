"""Exact genotype enumeration caller (the ``call-exact`` compute core).

TPU-first re-design of ``mchap/calling/exact.py``: the reference streams
genotypes one at a time through ``increment_genotype`` with a scalar
accumulator (exact.py:17-61); here the full VCF-ordered genotype table is
a batch axis and the whole posterior is computed with two matmuls:

1. ``read_hap_loglik``: log P(read | haplotype) for the panel — one MXU
   matmul over the log-read tensor (see ops/likelihood.py).
2. genotype likelihoods for ALL genotypes at once:
   P(read | genotype) = (1/ploidy) * sum_k dosage[g, k] * P(read | hap k),
   i.e. a single [R, K] x [K, G] matmul against the dosage matrix —
   no per-genotype gather loops at all.

This module is also the exact oracle that gates every MCMC sampler test
(same role as the reference's use of exact.py in
tests/test_calling/test_calling_mcmc.py:122+).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mchap_tpu.numerics.combinadics import count_unique_genotypes, enumerate_genotypes
from mchap_tpu.ops.likelihood import prepare_reads, read_hap_loglik
from mchap_tpu.ops.priors import log_genotype_prior


def genotype_dosage_table(n_alleles: int, ploidy: int) -> np.ndarray:
    """Dense [G, K] dosage matrix of the VCF-ordered genotype table."""
    table = enumerate_genotypes(n_alleles, ploidy)  # [G, ploidy]
    dosage = np.zeros((table.shape[0], n_alleles), np.int32)
    rows = np.repeat(np.arange(table.shape[0]), ploidy)
    np.add.at(dosage, (rows, table.ravel()), 1)
    return dosage


def genotype_likelihoods_from_read_hap(read_hap, ploidy, read_counts=None):
    """llk of every VCF-ordered genotype from the [.., R, K] read-hap matrix.

    Semantics of reference ``_genotype_likelihoods`` (calling/exact.py:252-263)
    but evaluated as one dosage matmul.
    """
    n_alleles = read_hap.shape[-1]
    dosage = jnp.asarray(
        genotype_dosage_table(n_alleles, ploidy), read_hap.dtype
    )  # [G, K]
    # scale per read for stability: P(read|g) = exp(m_r) * dot(E_r, d_g) / p
    m = jnp.max(read_hap, axis=-1)  # [.., R]
    m = jnp.maximum(m, -1e300 if read_hap.dtype == jnp.float64 else -1e30)
    e = jnp.exp(read_hap - m[..., None])  # [.., R, K]
    probs = jnp.einsum(
        "...rk,gk->...rg", e, dosage, preferred_element_type=read_hap.dtype
    )
    read_log = jnp.log(probs) + m[..., None] - jnp.log(jnp.asarray(ploidy, read_hap.dtype))
    if read_counts is not None:
        read_log = read_log * jnp.asarray(read_counts, read_hap.dtype)[..., None]
    return jnp.sum(read_log, axis=-2)  # [.., G]


def genotype_likelihoods(reads, ploidy, haplotypes, read_counts=None, dtype=jnp.float64):
    """llk of every possible genotype; reference calling/exact.py:266-292."""
    log_reads = prepare_reads(reads, dtype)
    read_hap = read_hap_loglik(log_reads, jnp.asarray(haplotypes))
    return genotype_likelihoods_from_read_hap(read_hap, ploidy, read_counts)


def genotype_posteriors(log_likelihoods, ploidy, n_alleles, prior=None):
    """Posterior over all genotypes; reference calling/exact.py:295-329.

    ``prior``: optional (inbreeding, frequencies-or-None) tuple as in the
    reference.
    """
    llks = jnp.asarray(log_likelihoods)
    if prior is not None:
        table = jnp.asarray(enumerate_genotypes(n_alleles, ploidy))
        lpriors = log_genotype_prior(
            table, n_alleles, inbreeding=prior[0], frequencies=prior[1]
        )
        llks = llks + lpriors.astype(llks.dtype)
    return jnp.exp(llks - jax.scipy.special.logsumexp(llks, axis=-1)[..., None])


def posterior_allele_frequencies(posteriors, ploidy, n_alleles):
    """Posterior mean allele freqs / counts / occurrence probabilities.

    Reference calling/exact.py:332-369.  Returns (freqs, counts, occur).
    """
    p = jnp.asarray(posteriors)
    dosage = jnp.asarray(genotype_dosage_table(n_alleles, ploidy), p.dtype)  # [G, K]
    counts = jnp.einsum("...g,gk->...k", p, dosage)
    occur = jnp.einsum("...g,gk->...k", p, (dosage > 0).astype(p.dtype))
    return counts / ploidy, counts, occur


def mode_genotype(posteriors, ploidy, n_alleles):
    """Posterior-mode genotype alleles + its probability + support probability.

    Support probability = summed posterior of all genotypes containing
    exactly the mode's allele set at any dosage (reference
    ``_genotype_support_log_joint``, calling/exact.py:64-105, and
    ``alternate_dosage_posteriors``, :372-407).

    Returns (alleles int[..., ploidy], mode_prob, support_prob, mode_index).
    """
    p = jnp.asarray(posteriors)
    table = jnp.asarray(enumerate_genotypes(n_alleles, ploidy))  # [G, ploidy]
    occupancy = jnp.asarray(
        genotype_dosage_table(n_alleles, ploidy) > 0
    )  # [G, K]
    idx = jnp.argmax(p, axis=-1)
    alleles = table[idx]
    mode_prob = jnp.take_along_axis(p, idx[..., None], axis=-1)[..., 0]
    mode_occ = occupancy[idx]  # [..., K]
    same_support = jnp.all(
        occupancy == mode_occ[..., None, :], axis=-1
    )  # [..., G]
    support_prob = jnp.sum(jnp.where(same_support, p, 0.0), axis=-1)
    return alleles, mode_prob, support_prob, idx


def alternate_dosage_posteriors(genotype_alleles, probabilities):
    """Host-side: probabilities of all dosage-alternatives of a genotype.

    Reference calling/exact.py:372-407.  Returns (genotypes [N, ploidy],
    probs [N]) ordered by genotype index.
    """
    genotype_alleles = np.asarray(genotype_alleles)
    probabilities = np.asarray(probabilities)
    ploidy = len(genotype_alleles)
    support = np.unique(genotype_alleles)
    n_alleles_panel = int(round((_n_from_g(len(probabilities), ploidy))))
    table = enumerate_genotypes(n_alleles_panel, ploidy)
    occupancy = genotype_dosage_table(n_alleles_panel, ploidy) > 0
    target = np.zeros(n_alleles_panel, bool)
    target[support] = True
    mask = np.all(occupancy == target, axis=-1)
    indices = np.flatnonzero(mask)
    return table[indices], probabilities[indices]


def _n_from_g(n_genotypes: int, ploidy: int) -> int:
    """Invert G = C(n + ploidy - 1, ploidy) for the panel size n."""
    n = 1
    while count_unique_genotypes(n, ploidy) < n_genotypes:
        n += 1
    if count_unique_genotypes(n, ploidy) != n_genotypes:
        raise ValueError("invalid number of genotypes for ploidy")
    return n


def posterior_mode(
    reads,
    ploidy,
    haplotypes,
    read_counts=None,
    prior=None,
    return_support_prob=False,
    return_posterior_frequencies=False,
    return_posterior_occurrence=False,
    dtype=jnp.float64,
):
    """Mode genotype + statistics; API of reference calling/exact.py:156-249.

    Unlike the reference's low-memory streaming scan, the full posterior is
    materialized on device (one [R, G] matmul); G stays modest for the
    panel sizes where exact calling is tractable at all.
    """
    llks = genotype_likelihoods(reads, ploidy, haplotypes, read_counts, dtype=dtype)
    n_alleles = len(haplotypes)
    post = genotype_posteriors(llks, ploidy, n_alleles, prior=prior)
    alleles, mode_prob, support_prob, idx = mode_genotype(post, ploidy, n_alleles)
    mode_llk = llks[..., idx]
    result = [np.asarray(alleles), float(mode_llk), float(mode_prob)]
    if return_support_prob:
        result.append(float(support_prob))
    if return_posterior_frequencies or return_posterior_occurrence:
        freqs, _, occur = posterior_allele_frequencies(post, ploidy, n_alleles)
        if return_posterior_frequencies:
            result.append(np.asarray(freqs))
        if return_posterior_occurrence:
            result.append(np.asarray(occur))
    return tuple(result)
