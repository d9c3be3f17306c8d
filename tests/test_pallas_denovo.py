"""Tests for the VMEM-resident pallas de novo assembly kernels.

The CPU interpreter's on-core PRNG is a no-op (all-zero bits): every
uniform draw becomes ~1e-12, so MH sub-steps accept the first valid
option whenever the summed acceptance mass exceeds it — a deterministic
dynamic we can still bookkeeping-check exactly.  On CPU we therefore
verify the llk/rh/one-hot accounting invariants, trace packing/decode,
homozygote-fixed-site freezing, and the model-layer batching wrapper.
The stochastic path is validated against exact enumeration on real TPU
hardware (scripts/gate_pallas_denovo.py: posterior TV vs exact < 0.01).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mchap_tpu.models.assemble import _fit_denovo_batch_pallas
from mchap_tpu.ops.likelihood import prepare_reads
from mchap_tpu.ops.pallas_denovo import (
    pallas_denovo_sampler,
    pallas_mutation_sweep,
)
from mchap_tpu.testing import simulate_reads


def _llk_numpy(lr, genotype):
    """From-scratch llk of an integer genotype, numpy oracle."""
    R, NB, _ = lr.shape
    rh = lr[
        np.arange(R)[:, None, None], np.arange(NB)[None, :, None],
        genotype.T[None, :, :],
    ].sum(1)  # [R, P]
    m = rh.max(axis=1, keepdims=True)
    return float((np.log(np.exp(rh - m).mean(axis=1)) + m[:, 0]).sum())


def _problem(P=4, NB=8, A=4, R=16, C=128, seed=0):
    rng = np.random.default_rng(seed)
    lr = np.log(rng.dirichlet(np.ones(A), size=(R, NB)).astype(np.float32))
    lrc = np.broadcast_to(lr[:, :, :, None], (R, NB, A, C)).copy()
    cnt = np.ones((R, C), np.float32)
    g = rng.integers(0, A, size=(P, NB, 1)).astype(np.int32)
    gi = np.broadcast_to(g, (P, NB, C)).copy()
    nall = np.full((NB, C), A, np.int32)
    pb = np.full((1, C), 0.25, np.float32)
    return lr, lrc, cnt, gi, nall, pb


def test_full_sampler_bookkeeping_invariant():
    """The llk carried through mutation + structural sub-steps must equal
    a from-scratch recompute of the traced genotype at every step."""
    P, NB, A, R, C = 4, 8, 4, 16, 128
    lr, lrc, cnt, gi, nall, pb = _problem(P, NB, A, R, C)
    gt, llks = pallas_denovo_sampler(
        jnp.int32(3), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb), n_steps=4, ploidy=P,
        interpret=True,
    )
    gt = np.asarray(gt)
    llks = np.asarray(llks)
    assert gt.shape == (4, P, NB, C)
    assert (gt >= 0).all() and (gt < A).all()
    for step in range(4):
        want = _llk_numpy(lr, gt[step, :, :, 0])
        assert abs(llks[step, 0] - want) < 1e-2, (step, llks[step, 0], want)


def test_full_sampler_fixed_sites_frozen():
    """Positions with n_alleles == 1 must never change, including when
    the fixed allele is non-zero (the irreversible-leak regression)."""
    P, NB, A, R, C = 4, 8, 4, 16, 128
    lr, lrc, cnt, gi, nall, pb = _problem(P, NB, A, R, C)
    gi[:, 2, :] = 3  # fixed at a NON-zero allele
    gi[:, 5, :] = 1
    nall[2, :] = 1
    nall[5, :] = 1
    gt, _ = pallas_denovo_sampler(
        jnp.int32(5), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb), n_steps=6, ploidy=P,
        interpret=True,
    )
    gt = np.asarray(gt)
    assert (gt[:, :, 2, :] == 3).all()
    assert (gt[:, :, 5, :] == 1).all()


def test_mutation_sweep_kernel_bookkeeping():
    """The standalone mutation-sweep kernel keeps llk/rh consistent."""
    P, NB, A, R, C = 4, 8, 4, 16, 128
    lr, lrc, cnt, gi, nall, pb = _problem(P, NB, A, R, C)
    goh = np.zeros((P, NB, A, C), np.float32)
    for h in range(P):
        for j in range(NB):
            goh[h, j, gi[h, j, 0], :] = 1.0
    llk0 = _llk_numpy(lr, gi[:, :, 0])
    g2, rh2, llk2 = pallas_mutation_sweep(
        jnp.int32(7), nall[:, 0].copy(), jnp.asarray(lrc), jnp.asarray(cnt),
        jnp.asarray(goh), jnp.full((C,), llk0, np.float32),
        jnp.float32(1.0), interpret=True,
    )
    g2 = np.asarray(g2)
    assert np.allclose(g2.sum(axis=2), 1.0)
    decoded = np.argmax(g2[..., 0], axis=-1)  # [P, NB]
    want = _llk_numpy(lr, decoded)
    assert abs(np.asarray(llk2)[0] - want) < 1e-2


def test_model_layer_pallas_wrapper_shapes():
    """_fit_denovo_batch_pallas: per-sample lane replication, padding to
    128 lanes, and trace reshape back to [chains, steps, ploidy, nb]."""
    P, NB, A = 4, 3, 2
    rng = np.random.default_rng(0)
    n_samples, chains, steps = 3, 2, 4
    truth = rng.integers(0, A, size=(n_samples, P, NB)).astype(np.int8)
    reads = np.stack(
        [
            simulate_reads(t, n_alleles=A, n_reads=8, errors=False, seed=i)
            for i, t in enumerate(truth)
        ]
    )
    counts = np.ones((n_samples, reads.shape[1]))
    log_reads = np.asarray(prepare_reads(reads, dtype=jnp.float32))
    init = rng.integers(0, A, size=(n_samples, chains, P, NB)).astype(np.int32)
    nall = np.full((n_samples, NB), A, np.int32)
    break_dist = np.zeros((n_samples, NB))
    break_dist[:, 0] = 0.75
    break_dist[:, 1] = 0.25
    traces = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, P, steps, chains,
        seed=7, p_recomb=0.5, p_partial=0.5, p_full=1.0, interpret=True,
    )
    assert len(traces) == n_samples
    for i, tr in enumerate(traces):
        assert tr.genotypes.shape == (chains, steps, P, NB)
        assert tr.llks.shape == (chains, steps)
        # llk consistency vs the sample's own reads
        g_last = np.sort(tr.genotypes[0, -1], axis=0)
        want = _llk_numpy(log_reads[i], tr.genotypes[0, -1])
        assert abs(tr.llks[0, -1] - want) < 1e-2


def test_fit_denovo_batch_cpu_ignores_pallas_path():
    """On the CPU backend fit_denovo_batch must keep using the XLA
    sampler (the pallas fast path is TPU-only)."""
    assert jax.default_backend() == "cpu"
    from mchap_tpu.models.assemble import fit_denovo_batch

    truth = np.array([[0, 0], [0, 1], [1, 1], [0, 0]], np.int8)
    reads = simulate_reads(truth, n_alleles=2, n_reads=8, errors=False, seed=3)
    traces = fit_denovo_batch(
        4, [2, 2], [reads], [np.ones(len(reads))], steps=20, chains=2,
        random_seed=1,
    )
    assert traces[0].genotypes.shape == (2, 20, 4, 2)


def test_tempered_sampler_bookkeeping_invariant():
    """With a temperature ladder on the chunk axis, the returned COLD
    trace must keep the same llk == recompute invariant, and fixed
    sites stay frozen through the in-kernel neighbor swaps."""
    P, NB, A, R, C = 4, 8, 4, 16, 128
    lr, lrc, cnt, gi, nall, pb = _problem(P, NB, A, R, C)
    gi[:, 2, :] = 3
    nall[2, :] = 1
    gt, llks = pallas_denovo_sampler(
        jnp.int32(3), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb),
        jnp.asarray([0.4, 0.7, 1.0], jnp.float32),
        n_steps=4, ploidy=P, interpret=True,
    )
    gt = np.asarray(gt)
    llks = np.asarray(llks)
    assert gt.shape == (4, P, NB, C)
    assert (gt[:, :, 2, :] == 3).all()
    for step in range(4):
        want = _llk_numpy(lr, gt[step, :, :, 0])
        assert abs(llks[step, 0] - want) < 1e-2, (step, llks[step, 0], want)


def test_dirmul_sampler_bookkeeping_invariant():
    """The Dirichlet-multinomial prior changes acceptance ratios but the
    llk trace must still equal a from-scratch recompute (the prior never
    leaks into the likelihood accounting)."""
    P, NB, A, R, C = 4, 8, 4, 16, 128
    lr, lrc, cnt, gi, nall, pb = _problem(P, NB, A, R, C)
    gt, llks = pallas_denovo_sampler(
        jnp.int32(3), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb), None,
        jnp.full((C,), 0.05, jnp.float32),
        n_steps=4, ploidy=P, interpret=True,
    )
    gt = np.asarray(gt)
    llks = np.asarray(llks)
    assert (gt >= 0).all() and (gt < A).all()
    for step in range(4):
        want = _llk_numpy(lr, gt[step, :, :, 0])
        assert abs(llks[step, 0] - want) < 1e-2, (step, llks[step, 0], want)


def test_model_layer_burn_slices_on_device():
    """With burn > 0 the wrapper returns only the kept steps, marked
    pre_burned so a later .burn(mcmc_burn) is a no-op; the kept steps
    must equal the tail of an unburned identical run."""
    P, NB, A = 4, 3, 2
    rng = np.random.default_rng(0)
    n_samples, chains, steps, burn = 2, 2, 6, 4
    truth = rng.integers(0, A, size=(n_samples, P, NB)).astype(np.int8)
    reads = np.stack(
        [
            simulate_reads(t, n_alleles=A, n_reads=8, errors=False, seed=i)
            for i, t in enumerate(truth)
        ]
    )
    counts = np.ones((n_samples, reads.shape[1]))
    log_reads = np.asarray(prepare_reads(reads, dtype=jnp.float32))
    init = rng.integers(0, A, size=(n_samples, chains, P, NB)).astype(np.int32)
    nall = np.full((n_samples, NB), A, np.int32)
    break_dist = np.zeros((n_samples, NB))
    break_dist[:, 0] = 1.0
    kwargs = dict(
        seed=7, p_recomb=0.5, p_partial=0.5, p_full=1.0, interpret=True
    )
    full = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, P, steps, chains, **kwargs
    )
    pre = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, P, steps, chains,
        burn=burn, **kwargs
    )
    for tr_full, tr_pre in zip(full, pre):
        assert tr_pre.genotypes.shape == (chains, steps - burn, P, NB)
        assert tr_pre.pre_burned == burn
        want = tr_full.burn(burn)
        got = tr_pre.burn(burn)  # no-op: already sliced on device
        np.testing.assert_array_equal(got.genotypes, want.genotypes)
        np.testing.assert_array_equal(got.llks, want.llks)


def test_model_layer_het_compaction():
    """With most positions homozygote-fixed the wrapper compacts het
    positions into a narrow kernel and restores fixed columns + the
    fixed-column llk constant on the way out: shapes are full-width,
    fixed columns stay frozen at their fixed allele, het columns carry
    valid alleles, and llks equal a from-scratch full-width recompute."""
    P, NB, A = 4, 12, 2
    rng = np.random.default_rng(1)
    n_samples, chains, steps = 3, 2, 5
    truth = rng.integers(0, A, size=(n_samples, P, NB)).astype(np.int8)
    reads = np.stack(
        [
            simulate_reads(t, n_alleles=A, n_reads=8, errors=False, seed=i)
            for i, t in enumerate(truth)
        ]
    )
    counts = np.ones((n_samples, reads.shape[1]))
    log_reads = np.asarray(prepare_reads(reads, dtype=jnp.float32))
    init = rng.integers(0, A, size=(n_samples, chains, P, NB)).astype(np.int32)
    # per-sample fixed pattern: only 3-4 het positions survive, so the
    # kernel width compacts from 12 to 8
    nall = np.full((n_samples, NB), 1, np.int32)
    het_sets = [(0, 5, 11), (2, 3, 7, 10), (1, 6, 9)]
    fixed_alleles = rng.integers(0, A, size=(n_samples, NB)).astype(np.int32)
    for i, hs in enumerate(het_sets):
        nall[i, list(hs)] = A
        keep = np.zeros(NB, bool)
        keep[list(hs)] = True
        # fixed positions must enter with one consistent allele per lane
        init[i, :, :, ~keep] = fixed_alleles[i, ~keep][:, None, None]
    break_dist = np.zeros((n_samples, NB))
    break_dist[:, 1] = 1.0
    traces = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, P, steps, chains,
        seed=7, p_recomb=0.5, p_partial=0.5, p_full=1.0, interpret=True,
        mesh=None,  # interpret+shard_map composition is covered elsewhere
    )
    assert len(traces) == n_samples
    for i, tr in enumerate(traces):
        assert tr.genotypes.shape == (chains, steps, P, NB)
        hs = np.zeros(NB, bool)
        hs[list(het_sets[i])] = True
        # fixed columns frozen at their fixed allele through every step
        want_fixed = fixed_alleles[i, ~hs]
        np.testing.assert_array_equal(
            tr.genotypes[..., ~hs],
            np.broadcast_to(want_fixed, tr.genotypes[..., ~hs].shape),
        )
        assert tr.genotypes.min() >= 0 and tr.genotypes.max() < A
        # llk includes the fixed-column constant: full-width recompute
        want = _llk_numpy(log_reads[i], tr.genotypes[0, -1])
        assert abs(tr.llks[0, -1] - want) < 1e-2


def test_model_layer_compaction_matches_uncompacted_posterior():
    """A fixed pattern shared by every sample: the compacted run must
    visit the same het-column states as a manually pre-compacted run
    (same kernel width, same seeds), proving compaction only permutes
    the position axis."""
    P, NB, A = 2, 10, 2
    rng = np.random.default_rng(3)
    n_samples, chains, steps = 2, 2, 4
    het = np.zeros(NB, bool)
    het[[1, 4, 6, 8, 2, 9, 0, 3]] = True  # 8 het -> nb_eff == 8 < 10
    truth = rng.integers(0, A, size=(n_samples, P, NB)).astype(np.int8)
    reads = np.stack(
        [
            simulate_reads(t, n_alleles=A, n_reads=6, errors=False, seed=i)
            for i, t in enumerate(truth)
        ]
    )
    counts = np.ones((n_samples, reads.shape[1]))
    log_reads = np.asarray(prepare_reads(reads, dtype=jnp.float32))
    init = rng.integers(0, A, size=(n_samples, chains, P, NB)).astype(np.int32)
    fixed_allele = rng.integers(0, A, size=(n_samples, NB)).astype(np.int32)
    nall = np.where(het, A, 1).astype(np.int32)[None].repeat(n_samples, 0)
    for i in range(n_samples):
        init[i, :, :, ~het] = fixed_allele[i, ~het][:, None, None]
    break_dist = np.zeros((n_samples, NB))
    break_dist[:, 1] = 1.0
    kw = dict(seed=11, p_recomb=0.5, p_partial=0.5, p_full=1.0,
              interpret=True, mesh=None)
    auto = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, P, steps, chains, **kw
    )
    # manual pre-compaction to the same 8 het columns (original order)
    sel = np.flatnonzero(het)
    manual = _fit_denovo_batch_pallas(
        log_reads[:, :, sel], counts, init[..., sel],
        nall[:, sel], break_dist[:, :len(sel)], P, steps, chains, **kw
    )
    for i in range(n_samples):
        np.testing.assert_array_equal(
            auto[i].genotypes[..., het], manual[i].genotypes
        )
