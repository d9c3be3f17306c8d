"""Genotype priors (flat and Dirichlet-multinomial), batched JAX.

Re-implements the prior math of the reference:
- assemble-side dosage priors: ``mchap/assemble/prior.py:15-112``
- calling-side allele priors with optional frequencies:
  ``mchap/calling/prior.py:10-179``

All functions are jit/vmap safe: fixed shapes, lgamma-based, no
data-dependent control flow.  The ``inbreeding == 0`` branch is selected
with ``jnp.where`` so a single compiled program covers both
parametrizations.
"""

import jax
import jax.numpy as jnp

from mchap_tpu.numerics.dosage import allelic_dosage, count_allele, ln_equivalent_permutations

_lgamma = jax.lax.lgamma


def calculate_alphas(inbreeding, frequencies):
    """Dirichlet-multinomial dispersion alphas; calling/prior.py:10-27."""
    return frequencies * ((1.0 - inbreeding) / inbreeding)


def log_genotype_null_prior(dosage, log_unique_haplotypes):
    """Flat prior: permutations / u_haps^ploidy; assemble/prior.py:15-36."""
    d = jnp.asarray(dosage, jnp.float64)
    ploidy = jnp.sum(d, axis=-1)
    return ln_equivalent_permutations(dosage) - ploidy * log_unique_haplotypes


def log_dirichlet_multinomial_pmf(dosage, log_dispersion, log_unique_haplotypes):
    """Equal-alpha Dirichlet-multinomial pmf; assemble/prior.py:39-78."""
    d = jnp.asarray(dosage, jnp.float64)
    ploidy = jnp.sum(d, axis=-1)
    dispersion = jnp.exp(log_dispersion)
    sum_dispersion = jnp.exp(log_dispersion + log_unique_haplotypes)
    left = _lgamma(ploidy + 1.0) + _lgamma(sum_dispersion) - _lgamma(ploidy + sum_dispersion)
    # per-dose terms; dose == 0 contributes exactly 0
    num = _lgamma(d + dispersion)
    denom = _lgamma(d + 1.0) + _lgamma(jnp.full_like(d, dispersion))
    prod = jnp.sum(jnp.where(d > 0, num - denom, 0.0), axis=-1)
    return left + prod


def log_genotype_prior_dosage(dosage, log_unique_haplotypes, inbreeding=0.0):
    """Assemble-model genotype prior over a haplotype dosage.

    Reference ``assemble/prior.py:81-112``; flat when inbreeding == 0 else
    Dirichlet-multinomial with alpha = (1/u_haps) * (1-F)/F.
    """
    inbreeding = jnp.asarray(inbreeding, jnp.float64)
    flat = log_genotype_null_prior(dosage, log_unique_haplotypes)
    safe_f = jnp.where(inbreeding > 0, inbreeding, 0.5)
    log_dispersion = jnp.log((1.0 - safe_f) / safe_f) - log_unique_haplotypes
    dirmul = log_dirichlet_multinomial_pmf(dosage, log_dispersion, log_unique_haplotypes)
    return jnp.where(inbreeding == 0.0, flat, dirmul)


def log_genotype_prior(genotype, unique_haplotypes, inbreeding=0.0, frequencies=None):
    """Calling-model genotype prior over allele-index genotypes.

    Reference ``calling/prior.py:116-179``.  ``genotype``: int[..., ploidy]
    indices into a haplotype panel of ``unique_haplotypes`` alleles;
    ``frequencies``: optional float[unique_haplotypes] prior frequencies.
    """
    g = jnp.asarray(genotype)
    ploidy = g.shape[-1]
    inbreeding = jnp.asarray(inbreeding, jnp.float64)
    dosage = allelic_dosage(g)
    ln_perms = ln_equivalent_permutations(dosage)

    # --- non-inbred branch ---
    if frequencies is None:
        flat = ln_perms - ploidy * jnp.log(jnp.asarray(unique_haplotypes, jnp.float64))
    else:
        freqs = jnp.asarray(frequencies, jnp.float64)
        flat = ln_perms + jnp.log(jnp.prod(freqs[g], axis=-1))

    # --- Dirichlet-multinomial branch ---
    safe_f = jnp.where(inbreeding > 0, inbreeding, 0.5)
    if frequencies is None:
        alpha_const = calculate_alphas(safe_f, 1.0 / unique_haplotypes)
        sum_alphas = alpha_const * unique_haplotypes
        alphas_g = jnp.full(g.shape, alpha_const)
    else:
        alphas = calculate_alphas(safe_f, jnp.asarray(frequencies, jnp.float64))
        sum_alphas = jnp.sum(alphas, axis=-1)
        alphas_g = alphas[g]
    d = jnp.asarray(dosage, jnp.float64)
    left = _lgamma(ploidy + 1.0) + _lgamma(sum_alphas) - _lgamma(ploidy + sum_alphas)
    num = _lgamma(d + alphas_g)
    denom = _lgamma(d + 1.0) + _lgamma(alphas_g)
    prod = jnp.sum(jnp.where(d > 0, num - denom, 0.0), axis=-1)
    dirmul = left + prod

    return jnp.where(inbreeding == 0.0, flat, dirmul)


def log_genotype_allele_flat_prior(genotype, variable_allele):
    """Gibbs conditional flat prior: log(count of the variable allele).

    Reference ``calling/prior.py:30-52``.  ``variable_allele`` is the slot
    index (may be traced).
    """
    g = jnp.asarray(genotype)
    a = jnp.take_along_axis(g, jnp.asarray(variable_allele)[..., None], axis=-1)
    n = jnp.sum(g == a, axis=-1)
    return jnp.log(n.astype(jnp.float64))


def log_genotype_allele_prior(
    genotype, variable_allele, unique_haplotypes, inbreeding=0.0, frequencies=None
):
    """Gibbs conditional prior of one allele slot given the rest.

    Reference ``calling/prior.py:55-113``.
    """
    g = jnp.asarray(genotype)
    ploidy = g.shape[-1]
    inbreeding = jnp.asarray(inbreeding, jnp.float64)
    a = jnp.take_along_axis(g, jnp.asarray(variable_allele)[..., None], axis=-1)[..., 0]

    # --- non-inbred branch ---
    if frequencies is None:
        flat = jnp.full(
            g.shape[:-1], jnp.log(1.0 / unique_haplotypes), jnp.float64
        )
    else:
        freqs = jnp.asarray(frequencies, jnp.float64)
        flat = jnp.log(freqs[a])

    # --- Dirichlet-multinomial branch ---
    constant_sum = ploidy - 1
    constant_ibs = count_allele(g, a) - 1
    safe_f = jnp.where(inbreeding > 0, inbreeding, 0.5)
    if frequencies is None:
        alpha = calculate_alphas(safe_f, 1.0 / unique_haplotypes)
        sum_alpha = constant_sum + alpha * unique_haplotypes
        variable_alpha = alpha + constant_ibs
    else:
        alphas = calculate_alphas(safe_f, jnp.asarray(frequencies, jnp.float64))
        sum_alpha = constant_sum + jnp.sum(alphas, axis=-1)
        variable_alpha = alphas[a] + constant_ibs
    left = _lgamma(sum_alpha) - _lgamma(1.0 + sum_alpha)
    right = _lgamma(1.0 + variable_alpha) - _lgamma(variable_alpha)
    dirmul = left + right

    return jnp.where(inbreeding == 0.0, flat, dirmul)
