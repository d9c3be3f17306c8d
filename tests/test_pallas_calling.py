"""Tests for the VMEM-resident pallas Gibbs kernel.

The CPU interpreter's on-core PRNG is a no-op (all-zero bits), which by
design degenerates the kernel's Gumbel-max draw to a deterministic
greedy argmax — so on CPU we verify the deterministic machinery (MAP
convergence, dosage decode, sorting, allele-pad masking).  The
stochastic path is validated against exact enumeration on real TPU
hardware (see bench/driver runs; the same check lives in
scripts run on-device because pltpu.prng_random_bits has no CPU
lowering).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.ops import exact
from mchap_tpu.ops.likelihood import prepare_reads, read_hap_loglik
from mchap_tpu.ops.pallas_calling import pallas_calling_sampler
from mchap_tpu.testing import simulate_reads

HAPS = np.array(
    [[0, 0, 0, 0], [0, 0, 1, 1], [1, 1, 0, 0], [1, 1, 1, 1]], dtype=np.int8
)


def _chain_last(rh, n_chains):
    return jnp.asarray(np.repeat(np.asarray(rh)[:, :, None], n_chains, axis=2),
                       jnp.float32)


def test_interpret_mode_greedy_finds_map():
    """With the interpreter's zeroed PRNG the kernel is greedy argmax and
    must land on (and stay at) the exact MAP genotype."""
    truth = HAPS[[0, 0, 1, 3]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=40, errors=False, seed=2)
    rh = read_hap_loglik(prepare_reads(reads, jnp.float32), jnp.asarray(HAPS))
    rh_b = _chain_last(rh, 128)
    counts = jnp.ones((rh.shape[0], 128), jnp.float32)
    g, llk = pallas_calling_sampler(
        jnp.int32(3), rh_b, counts, n_steps=8, ploidy=4, interpret=True
    )
    g = np.asarray(g)
    # rows sorted, all lanes identical (deterministic), stable after a few
    # sweeps, and equal to the exact MAP genotype
    assert (np.diff(g, axis=1) >= 0).all()
    assert (g[-1] == g[-1][:, :1]).all()
    llks = exact.genotype_likelihoods(reads, 4, HAPS)
    post = np.asarray(exact.genotype_posteriors(llks, 4, len(HAPS)))
    from mchap_tpu.numerics.combinadics import index_as_genotype_alleles_np

    map_genotype = index_as_genotype_alleles_np(int(np.argmax(post)), 4)
    np.testing.assert_array_equal(g[-1][:, 0], map_genotype)
    assert np.allclose(llk[-1], llk[-1][0])


def test_interpret_mode_allele_padding_masked():
    """Padded alleles (panel padded to a multiple of 8) are never chosen."""
    panel = HAPS[:3]  # 3 alleles -> padded to 8 internally
    truth = panel[[0, 1, 1, 2]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=30, errors=False, seed=5)
    rh = read_hap_loglik(prepare_reads(reads, jnp.float32), jnp.asarray(panel))
    rh_b = _chain_last(rh, 128)
    counts = jnp.ones((rh.shape[0], 128), jnp.float32)
    g, _ = pallas_calling_sampler(
        jnp.int32(1), rh_b, counts, n_steps=6, ploidy=4, interpret=True
    )
    assert int(np.asarray(g).max()) < 3


def test_interpret_mode_per_lane_n_valid():
    """Cross-locus batching: each lane carries its own real-allele count;
    lanes restricted to a 2-allele sub-panel must never pick allele >= 2
    while full-panel lanes may."""
    truth = HAPS[[1, 1, 3, 3]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=30, errors=False, seed=7)
    rh = read_hap_loglik(prepare_reads(reads, jnp.float32), jnp.asarray(HAPS))
    rh_b = _chain_last(rh, 128)
    counts = jnp.ones((rh.shape[0], 128), jnp.float32)
    n_valid = np.full(128, 4, np.int32)
    n_valid[64:] = 2  # second half: only alleles {0, 1} are real
    g, _ = pallas_calling_sampler(
        jnp.int32(9), rh_b, counts, n_steps=6, ploidy=4,
        n_valid=jnp.asarray(n_valid), interpret=True
    )
    g = np.asarray(g)
    assert int(g[:, :, 64:].max()) < 2
    # full-panel lanes still reach the true MAP which uses allele 3
    assert int(g[-1, :, :64].max()) == 3
