"""Tests for the VMEM-resident pallas pedigree Gibbs kernel.

The CPU interpreter's on-core PRNG is a no-op (all-zero bits), which
degenerates the kernel's Gumbel-max draw to a deterministic greedy
argmax — so on CPU we verify the deterministic machinery: slot-score
EQUIVALENCE against a float64 host mirror built on the XLA trio pmf
(ops/pedigree_mcmc.trio_log_pmf), MAP convergence to simulated truth
through the trio coupling, padding/masking, and the model-path wiring.
The stochastic path is validated against exact enumeration on real TPU
hardware (scripts/gate_pallas_pedigree.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.ops import pedigree_mcmc as K
from mchap_tpu.ops.likelihood import prepare_reads, read_hap_loglik
from mchap_tpu.ops.pallas_pedigree import (
    UnsupportedPedigree,
    make_plan,
    pallas_pedigree_sampler,
)
from mchap_tpu.testing import simulate_reads


def _read_hap(reads_list, haplotypes, n_reads=None):
    """Stack per-sample read-hap log-prob matrices, padded."""
    R = n_reads or max(len(r) for r in reads_list)
    S, H = len(reads_list), len(haplotypes)
    rh = np.full((S, R, H), -1e30)
    counts = np.zeros((S, R))
    for i, r in enumerate(reads_list):
        m = np.asarray(
            read_hap_loglik(
                prepare_reads(np.asarray(r, float)), jnp.asarray(haplotypes)
            )
        )
        rh[i, : len(r)] = m
        counts[i, : len(r)] = 1.0
    return rh, counts


def _lanes(a, n=128):
    return np.repeat(np.asarray(a)[..., None], n, axis=-1)


def _run_kernel(rh, counts, freqs, initial, plan, n_steps, seed=3,
                n_valid=None, lanes=128):
    S, R, H = rh.shape
    nv = np.full(lanes, H if n_valid is None else n_valid, np.int32)
    trace = pallas_pedigree_sampler(
        jnp.int32(seed),
        jnp.asarray(_lanes(rh, lanes), jnp.float32),
        jnp.asarray(_lanes(counts, lanes), jnp.float32),
        jnp.asarray(_lanes(freqs, lanes), jnp.float32),
        jnp.asarray(nv),
        jnp.asarray(_lanes(initial, lanes), np.int32),
        plan=plan,
        n_steps=n_steps,
        interpret=True,
    )
    return np.asarray(trace)


def _mirror_greedy(genotypes, plan, rh, counts, freqs, ploidy, parents,
                   tau, err, n_steps, n_valid=None):
    """f64 host mirror of the kernel's greedy (zero-PRNG) sweep, built
    on the XLA trio pmf — same sample order (plan group order), same
    systematic slot order, same llk/prior/multiplicity scores."""
    g = np.array(genotypes)
    S, maxp = g.shape
    H = rh.shape[-1]
    nv = H if n_valid is None else n_valid
    order = [int(m) for _, members, _, _ in plan.groups for m in members]
    children = [[] for _ in range(S)]
    for i in range(S):
        for r in set(int(x) for x in parents[i] if x >= 0):
            children[r].append(i)
    tables, valid = K.composition_tables(maxp)
    log_freqs = np.log(np.maximum(freqs, 1e-300))

    def pad(vec):
        out = np.full(maxp, -1, np.int32)
        out[: len(vec)] = vec
        return out

    def trio(i, gg):
        p, q = int(parents[i, 0]), int(parents[i, 1])
        has_p, has_q = p >= 0, q >= 0
        return float(
            K.trio_log_pmf(
                jnp.asarray(gg[i]),
                jnp.asarray(gg[p] if has_p else np.full(maxp, -1)),
                jnp.asarray(gg[q] if has_q else np.full(maxp, -1)),
                jnp.asarray(int(ploidy[p]) if has_p else 0),
                jnp.asarray(int(ploidy[q]) if has_q else 0),
                jnp.asarray(int(tau[i, 0])),
                jnp.asarray(int(tau[i, 1])),
                jnp.asarray(0.0),
                jnp.asarray(0.0),
                jnp.asarray(float(err[i, 0]) if has_p else 1.0),
                jnp.asarray(float(err[i, 1]) if has_q else 1.0),
                jnp.asarray(log_freqs),
                jnp.asarray(tables),
                jnp.asarray(valid),
                jnp.asarray(K._COMB_LUT),
            )
        )

    def llk(i, gg):
        p = int(ploidy[i])
        sub = rh[i][:, gg[i, :p]]  # [R, p]
        per_read = np.log(np.sum(np.exp(sub - sub.max(1, keepdims=True)), 1))
        per_read = per_read + sub.max(1) - np.log(p)
        return float(counts[i] @ per_read)

    for _ in range(n_steps):
        for s in order:
            for k in range(int(ploidy[s])):
                scores = np.full(H, -np.inf)
                for h in range(nv):
                    g2 = g.copy()
                    g2[s, k] = h
                    lp = trio(s, g2) + sum(trio(c, g2) for c in children[s])
                    cnt = sum(
                        1
                        for j in range(int(ploidy[s]))
                        if j != k and g2[s, j] == h
                    )
                    scores[h] = llk(s, g2) + lp + np.log(cnt + 1.0)
                g[s, k] = int(np.argmax(scores))
    return g


HAPS2 = np.array([[0, 0], [0, 1], [1, 1]], dtype=np.int8)


def test_greedy_trio_finds_truth():
    """Deep reads: the greedy kernel recovers all three diploid-trio
    truth genotypes, coupling the progeny through the trio prior."""
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    ploidy = np.full(3, 2)
    tau = np.full((3, 2), 1)
    err = np.full((3, 2), 0.01)
    truths = [HAPS2[[0, 1]], HAPS2[[1, 2]], HAPS2[[0, 2]]]
    reads = [
        simulate_reads(t, n_alleles=2, n_reads=16, qual=(30, 30), seed=i)
        for i, t in enumerate(truths)
    ]
    rh, counts = _read_hap(reads, HAPS2)
    plan = make_plan(ploidy, parents, tau, np.zeros((3, 2)), err, True)
    trace = _run_kernel(
        rh, counts, np.full(3, 1 / 3), np.zeros((3, 2), np.int32), plan, 6
    )
    got = np.sort(trace[-1, :, :, 0], axis=-1)
    np.testing.assert_array_equal(got, [[0, 1], [1, 2], [0, 2]])
    # all lanes identical under the interpreter's zeroed PRNG
    assert (trace[..., :1] == trace).all()


def test_greedy_biparental_tetraploid_finds_truth():
    """2 founders + 5 tetraploid progeny (the bi-parental structure of
    the bundled example): founders update through their children's
    trios (the SMEM child fori), progeny through a multi-member group."""
    rng = np.random.default_rng(0)
    N_POS, N_HAPS, P = 6, 8, 4
    haps = np.zeros((N_HAPS, N_POS), np.int8)
    haps[1:] = rng.integers(0, 2, (N_HAPS - 1, N_POS))
    n = 7
    parents = np.full((n, 2), -1, int)
    parents[2:] = [0, 1]
    ploidy = np.full(n, P)
    tau = np.full((n, 2), 2)
    err = np.full((n, 2), 0.1)
    f0, f1 = rng.choice(N_HAPS, P), rng.choice(N_HAPS, P)
    truth = [f0, f1] + [
        np.concatenate(
            [rng.choice(f0, 2, replace=False), rng.choice(f1, 2, replace=False)]
        )
        for _ in range(n - 2)
    ]
    reads = [
        simulate_reads(haps[t], n_alleles=2, n_reads=32, qual=(30, 30),
                       seed=100 + i)
        for i, t in enumerate(truth)
    ]
    rh, counts = _read_hap(reads, haps)
    plan = make_plan(ploidy, parents, tau, np.zeros((n, 2)), err, True)
    # the progeny share one traced update program
    assert len(plan.groups) == 3
    trace = _run_kernel(
        rh, counts, np.full(N_HAPS, 1 / N_HAPS),
        np.zeros((n, P), np.int32), plan, 10,
    )
    got = np.sort(trace[-1, :, :, 0], axis=-1)
    np.testing.assert_array_equal(got, np.sort(np.stack(truth), axis=-1))


def test_greedy_sweep_matches_f64_mirror():
    """Slot-score equivalence: the kernel's greedy sweep (llk + trio
    blanket prior + multiplicity, f32 linear-domain) must pick the same
    alleles as a float64 host mirror built on the XLA trio pmf, from a
    non-trivial start, including founder updates through children."""
    rng = np.random.default_rng(7)
    N_POS, N_HAPS = 4, 5
    haps = np.zeros((N_HAPS, N_POS), np.int8)
    haps[1:] = rng.integers(0, 2, (N_HAPS - 1, N_POS))
    n = 4
    parents = np.array([[-1, -1], [-1, -1], [0, 1], [0, 1]])
    ploidy = np.full(n, 2)
    tau = np.full((n, 2), 1)
    err = np.full((n, 2), 0.05)
    truth = [[0, 1], [2, 3], [0, 2], [1, 3]]
    reads = [
        simulate_reads(haps[np.array(t)], n_alleles=2, n_reads=6,
                       qual=(14, 14), seed=i)
        for i, t in enumerate(truth)
    ]
    rh, counts = _read_hap(reads, haps)
    freqs = np.arange(1.0, N_HAPS + 1)
    freqs /= freqs.sum()
    init = rng.integers(0, N_HAPS, (n, 2)).astype(np.int32)
    plan = make_plan(ploidy, parents, tau, np.zeros((n, 2)), err,
                     swap_parental_alleles=False)
    trace = _run_kernel(rh, counts, freqs, init, plan, 2)
    want = _mirror_greedy(
        init, plan, rh, counts, freqs, ploidy, parents, tau, err, 2
    )
    np.testing.assert_array_equal(trace[-1, :, :, 0], want)


def test_panel_padding_masked():
    """Per-lane n_valid: candidates beyond the real panel never chosen
    even when the padded columns carry benign values."""
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    ploidy = np.full(3, 2)
    tau = np.full((3, 2), 1)
    err = np.full((3, 2), 0.01)
    reads = [
        simulate_reads(HAPS2[[0, 1]], n_alleles=2, n_reads=8,
                       qual=(20, 20), seed=i)
        for i in range(3)
    ]
    rh, counts = _read_hap(reads, HAPS2)
    rh = np.concatenate([rh, np.zeros((3, rh.shape[1], 5))], axis=-1)
    freqs = np.concatenate([np.full(3, 1 / 3), np.full(5, 1.0)])
    plan = make_plan(ploidy, parents, tau, np.zeros((3, 2)), err, True)
    trace = _run_kernel(
        rh, counts, freqs, np.zeros((3, 2), np.int32), plan, 4, n_valid=3
    )
    assert trace.max() < 3


def test_unsupported_configs_raise():
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    with pytest.raises(UnsupportedPedigree):
        make_plan(np.full(3, 2), parents, np.full((3, 2), 1),
                  np.full((3, 2), 0.1), np.full((3, 2), 0.01), True)
    with pytest.raises(UnsupportedPedigree):
        # tau sum != ploidy
        make_plan(np.full(3, 4), parents, np.full((3, 2), 1),
                  np.zeros((3, 2)), np.full((3, 2), 0.01), True)


def test_model_path_forced_pallas(monkeypatch):
    """PedigreeCallingMCMC.fit routes through the kernel when forced
    (interpret mode on CPU) and returns a well-formed trace, including
    the -1 padding roll for mixed ploidies."""
    from mchap_tpu.models.pedigree import PedigreeCallingMCMC

    monkeypatch.setenv("MCHAP_PEDIGREE_PALLAS", "1")
    # interpret-mode shard_map(pallas) compile grows super-linearly with
    # device count on XLA-CPU (CLAUDE.md); the sharded composition is
    # covered by __graft_entry__.dryrun_multichip on a 2-device sub-mesh
    monkeypatch.setenv("MCHAP_SHARD", "0")
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    ploidy = np.array([4, 2, 3])
    tau = np.array([[2, 2], [1, 1], [2, 1]])
    err = np.full((3, 2), 0.05)
    haps = np.array([[0, 0], [0, 1], [1, 1]], np.int8)
    truths = [haps[[0, 0, 1, 1]], haps[[1, 2]], haps[[0, 1, 2]]]
    reads = [
        simulate_reads(t, n_alleles=2, n_reads=12, qual=(20, 20), seed=i)
        for i, t in enumerate(truths)
    ]
    R = max(len(r) for r in reads)
    sample_reads = np.full((3, R, 2, 2), np.nan)
    sample_counts = np.zeros((3, R))
    for i, r in enumerate(reads):
        sample_reads[i, : len(r)] = r
        sample_counts[i, : len(r)] = 1
    model = PedigreeCallingMCMC(
        sample_ploidy=ploidy,
        sample_parents=parents,
        gamete_tau=tau,
        gamete_lambda=np.zeros((3, 2)),
        gamete_error=err,
        haplotypes=haps,
        steps=8,
        chains=2,
        random_seed=11,
    )
    from mchap_tpu.utils import fallback as _fb

    calls = []
    monkeypatch.setattr(_fb, "note_path", lambda s, p: calls.append((s, p)))
    trace = model.fit(sample_reads, sample_counts)
    assert ("pedigree", "pallas") in calls
    g = trace.genotypes
    assert g.shape == (2, 8, 3, 4)
    # mixed-ploidy padding rolled to the END (mcmc.py:807-813), real
    # alleles sorted ascending in the leading slots
    assert (g[:, :, 1, :2] >= 0).all() and (g[:, :, 1, 2:] == -1).all()
    assert (np.diff(g[:, :, 1, :2], axis=-1) >= 0).all()
    assert (g[:, :, 2, :3] >= 0).all() and (g[:, :, 2, 3:] == -1).all()
    assert (np.diff(g[:, :, 2, :3], axis=-1) >= 0).all()
    assert (np.diff(g[:, :, 0, :], axis=-1) >= 0).all()
    for i in range(3):
        ind = trace.individual(i)
        assert ind.genotypes.shape[-1] == ploidy[i]
