"""Dosage bookkeeping over allele-index genotypes (JAX, batched).

Vectorized equivalents of reference ``mchap/calling/utils.py`` and the
dosage helpers in ``mchap/jitutils.py:149-171,350-422``.  All functions
accept leading batch dimensions and are jit/vmap safe (fixed shapes,
no data-dependent control flow).
"""

import jax
import jax.numpy as jnp


def allelic_dosage(genotype_alleles):
    """Dosage of each allele slot, credited to the first occurrence.

    ``dosage[i] = count of genotype[i] in genotype`` if slot ``i`` is the
    first slot holding that allele, else 0.  Reference:
    ``calling/utils.py:7-35``.  Final axis is the ploidy.
    """
    g = jnp.asarray(genotype_alleles)
    eq = g[..., :, None] == g[..., None, :]  # [..., p, p]
    ploidy = g.shape[-1]
    tri = jnp.tril(jnp.ones((ploidy, ploidy), bool), k=-1)
    first = ~jnp.any(eq & tri, axis=-1)  # slot is first occurrence
    counts = jnp.sum(eq, axis=-1)
    return jnp.where(first, counts, 0).astype(g.dtype)


def count_allele(genotype_alleles, allele):
    """Count occurrences of ``allele`` in a genotype; calling/utils.py:38-57."""
    g = jnp.asarray(genotype_alleles)
    return jnp.sum(g == jnp.asarray(allele)[..., None], axis=-1)


def ln_equivalent_permutations(dosage):
    """Log multinomial coefficient ploidy! / prod(dosage_i!).

    Reference: ``jitutils.py:149-171``.  Zero entries contribute
    lgamma(1) = 0.
    """
    d = jnp.asarray(dosage, jnp.float64)
    ploidy = jnp.sum(d, axis=-1)
    return jax.lax.lgamma(ploidy + 1) - jnp.sum(jax.lax.lgamma(d + 1), axis=-1)


def haplotype_dosage(genotype):
    """Dosage of each haplotype row in a genotype of haplotype vectors.

    ``genotype``: int[..., ploidy, n_pos].  Matches reference
    ``get_haplotype_dosage`` (jitutils.py:378-422): dosage credited to the
    first of each group of equal rows, 0 for duplicates.
    """
    g = jnp.asarray(genotype)
    eq = jnp.all(g[..., :, None, :] == g[..., None, :, :], axis=-1)  # [..., p, p]
    ploidy = g.shape[-2]
    tri = jnp.tril(jnp.ones((ploidy, ploidy), bool), k=-1)
    first = ~jnp.any(eq & tri, axis=-1)
    counts = jnp.sum(eq, axis=-1)
    return jnp.where(first, counts, 0).astype(jnp.int32)
