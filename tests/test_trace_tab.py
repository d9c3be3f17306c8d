"""Device-side trace tabulation vs the host full-trace path.

The tabulated trace must reproduce the full-trace posterior EXACTLY —
states, probabilities, ordering (including first-seen tie-breaks) —
because golden genotype decisions depend on it.
"""

import numpy as np
import pytest

from mchap_tpu.models.assemble import (
    GenotypeMultiTrace,
    TabulatedGenotypeTrace,
    _fit_denovo_batch_pallas,
)
from mchap_tpu.ops.trace_tab import (
    decode_tabulated_states,
    tabulate_packed_trace,
)


def _pack(genotypes, base):
    """[steps, P, NB, lanes] alleles -> [steps, NB, lanes] base-coded."""
    steps, ploidy, nb, lanes = genotypes.shape
    out = np.zeros((steps, nb, lanes), np.int32)
    for h in range(ploidy):
        out += genotypes[:, h].astype(np.int32) * base**h
    return out


def _random_trace(rng, steps, ploidy, nb, lanes, n_alleles, n_states=5):
    """A trace that revisits a small state pool (repeats + row shuffles)."""
    pool = rng.integers(0, n_alleles, size=(n_states, ploidy, nb), dtype=np.int8)
    pick = rng.integers(0, n_states, size=(steps, lanes))
    g = np.empty((steps, ploidy, nb, lanes), np.int8)
    for s in range(steps):
        for l in range(lanes):
            perm = rng.permutation(ploidy)  # kernel row order is arbitrary
            g[s, :, :, l] = pool[pick[s, l]][perm]
    return g


@pytest.mark.parametrize(
    "ploidy,nb,n_alleles,steps,lanes",
    [
        (2, 3, 2, 17, 4),
        (4, 5, 3, 40, 8),
        (4, 1, 4, 12, 2),
        (6, 2, 2, 25, 4),
        # real-data widths: multi-word bit-packed sort keys (the
        # one-operand-per-position sorts this replaced stall the TPU
        # compiler at these widths)
        (4, 23, 2, 30, 4),
        (4, 17, 4, 30, 4),
        (2, 33, 4, 20, 2),
    ],
)
def test_tabulate_matches_numpy_oracle(ploidy, nb, n_alleles, steps, lanes):
    rng = np.random.default_rng(ploidy * 100 + nb)
    base = 1
    while base < max(n_alleles, 2):
        base *= 2
    g = _random_trace(rng, steps, ploidy, nb, lanes, n_alleles)
    packed = _pack(g, base)
    llks = rng.normal(size=(steps, lanes))
    words, counts, first, n_unique, state_llks = tabulate_packed_trace(
        packed, llks, ploidy=ploidy, base=base, n_cap=steps, burn=0
    )
    words, counts, first, n_unique, state_llks = map(
        np.asarray, (words, counts, first, n_unique, state_llks)
    )
    # each state's llk rides from its first occurrence
    for l in range(lanes):
        live = counts[:, l] > 0
        np.testing.assert_allclose(
            state_llks[live, l], llks[first[live, l], l], rtol=1e-12
        )
    states = decode_tabulated_states(words, ploidy, base)
    for l in range(lanes):
        # oracle: canonicalise rows (lexicographic, position 0 primary),
        # then unique over steps with counts and first-occurrence index
        canon = np.stack(
            [
                gi[np.lexsort(tuple(gi.T[::-1]))]
                for gi in g[..., l].reshape(steps, ploidy, nb)
            ]
        )
        flat = canon.reshape(steps, ploidy * nb)
        oracle = {}
        for s in range(steps):
            key = flat[s].tobytes()
            if key in oracle:
                oracle[key][0] += 1
            else:
                oracle[key] = [1, s]
        assert n_unique[l] == len(oracle)
        got_mask = counts[:, l] > 0
        got_states = states[:, :, :, l][got_mask].reshape(-1, ploidy * nb)
        got_counts = counts[got_mask, l]
        got_first = first[got_mask, l]
        assert len(got_states) == len(oracle)
        # the device emits states in its own (packed-word) order; compare
        # the (state -> count, first) mapping order-independently
        for st, c, f in zip(got_states, got_counts, got_first):
            key = st.astype(flat.dtype).tobytes()
            assert key in oracle
            assert oracle[key] == [c, f]


def test_tabulate_overflow_reported():
    rng = np.random.default_rng(0)
    ploidy, nb, lanes, steps = 2, 4, 2, 30
    g = rng.integers(0, 2, size=(steps, ploidy, nb, lanes))
    packed = _pack(g, 2)
    _, counts, _, n_unique = tabulate_packed_trace(
        packed, ploidy=ploidy, base=2, n_cap=4, burn=0
    )
    n_unique = np.asarray(n_unique)
    # with 30 random steps over 2^8 possible states, >4 uniques is certain
    assert (n_unique > 4).any()
    assert np.asarray(counts).shape[0] == 4


def test_tabulate_burn_slices_device_side():
    rng = np.random.default_rng(1)
    ploidy, nb, lanes, steps, burn = 2, 2, 1, 20, 8
    g = _random_trace(rng, steps, ploidy, nb, lanes, 2, n_states=3)
    packed = _pack(g, 2)
    w_b, c_b, f_b, n_b = tabulate_packed_trace(
        packed, ploidy=ploidy, base=2, n_cap=steps, burn=burn
    )
    w_m, c_m, f_m, n_m = tabulate_packed_trace(
        packed[burn:], ploidy=ploidy, base=2, n_cap=steps - burn, burn=0
    )
    np.testing.assert_array_equal(np.asarray(n_b), np.asarray(n_m))
    k = int(np.asarray(n_b).max())
    np.testing.assert_array_equal(np.asarray(w_b)[:k], np.asarray(w_m)[:k])
    np.testing.assert_array_equal(np.asarray(c_b)[:k], np.asarray(c_m)[:k])
    np.testing.assert_array_equal(np.asarray(f_b)[:k], np.asarray(f_m)[:k])


def _tabulated_from_full(genotypes, llks, n_alleles):
    """Build a TabulatedGenotypeTrace from a [chains, steps, P, NB] trace."""
    chains, steps, ploidy, nb = genotypes.shape
    base = 1
    while base < max(n_alleles, 2):
        base *= 2
    packed = _pack(genotypes.transpose(1, 2, 3, 0), base)  # [steps, NB, C]
    words, counts, first, n_unique, state_llks = map(
        np.asarray,
        tabulate_packed_trace(
            packed, llks.T, ploidy=ploidy, base=base, n_cap=steps, burn=0
        ),
    )
    k = int(max(n_unique.max(), 1))
    states = decode_tabulated_states(words[:k], ploidy, base)
    return TabulatedGenotypeTrace(
        states.transpose(3, 0, 1, 2),  # [C, k, P, NB]
        counts[:k].T,
        first[:k].T,
        state_llks[:k].T,
        pre_burned=0,
        kept=steps,
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_tabulated_trace_matches_full_trace(seed):
    rng = np.random.default_rng(seed)
    chains, steps, ploidy, nb, n_alleles = 2, 60, 4, 4, 3
    g = _random_trace(
        rng, steps, ploidy, nb, chains, n_alleles, n_states=6
    ).transpose(3, 0, 1, 2)  # [C, steps, P, NB]
    llks = rng.normal(size=(chains, steps))
    full = GenotypeMultiTrace(g.copy(), llks.copy())
    tab = _tabulated_from_full(g, llks, n_alleles)

    pf, pt = full.posterior(), tab.posterior()
    np.testing.assert_array_equal(pf.genotypes, pt.genotypes)
    np.testing.assert_array_equal(pf.probabilities, pt.probabilities)

    # per-chain split posteriors drive replicate_incongruence
    for cf, ct in zip(full.split(), tab.split()):
        qf, qt = cf.posterior(), ct.posterior()
        np.testing.assert_array_equal(qf.genotypes, qt.genotypes)
        np.testing.assert_array_equal(qf.probabilities, qt.probabilities)
    assert full.replicate_incongruence() == tab.replicate_incongruence()

    mf = pf.mode_genotype_support()
    mt = pt.mode_genotype_support()
    np.testing.assert_array_equal(mf.genotypes, mt.genotypes)
    np.testing.assert_array_equal(mf.probabilities, mt.probabilities)

    # position truncation (cross-locus padding strip)
    pf2 = full.truncate_positions(2).posterior()
    pt2 = tab.truncate_positions(2).posterior()
    # NOTE: truncation may merge states here because these random traces
    # are not padding-frozen; both paths must still agree
    merged_f = {
        k: 0.0
        for k in [s.tobytes() for s in pf2.genotypes]
    }
    for s, p in zip(pf2.genotypes, pf2.probabilities):
        merged_f[s.tobytes()] += p
    merged_t = {
        k: 0.0
        for k in [s.tobytes() for s in pt2.genotypes]
    }
    for s, p in zip(pt2.genotypes, pt2.probabilities):
        merged_t[s.tobytes()] += p
    assert set(merged_f) == set(merged_t)
    for k in merged_f:
        np.testing.assert_allclose(merged_f[k], merged_t[k], rtol=1e-12)


def test_tabulated_burn_contract():
    rng = np.random.default_rng(5)
    g = _random_trace(rng, 10, 2, 2, 2, 2).transpose(3, 0, 1, 2)
    tab = _tabulated_from_full(g, np.zeros((2, 10)), 2)
    tab.pre_burned = 5
    assert tab.burn(5) is tab
    assert tab.burn(3) is tab
    with pytest.raises(ValueError):
        tab.burn(6)


def test_pallas_interpret_tabulated_matches_full():
    """The interpret-mode fast path with tabulate=True must reproduce the
    full-trace posterior of tabulate=False (the composition used on TPU)."""
    import jax.numpy as jnp

    from mchap_tpu.ops.likelihood import prepare_reads
    from mchap_tpu.testing import simulate_reads

    rng = np.random.default_rng(3)
    ploidy, nb, n_a = 4, 3, 2
    n_samples, chains, steps, burn = 2, 2, 6, 2
    truths = rng.integers(0, n_a, size=(n_samples, ploidy, nb)).astype(np.int8)
    reads = np.stack(
        [
            simulate_reads(t, n_alleles=n_a, n_reads=8, errors=False, seed=i)
            for i, t in enumerate(truths)
        ]
    )
    counts = np.ones((n_samples, reads.shape[1]))
    log_reads = np.asarray(prepare_reads(reads, dtype=jnp.float32))
    init = rng.integers(
        0, n_a, size=(n_samples, chains, ploidy, nb)
    ).astype(np.int32)
    nall = np.full((n_samples, nb), n_a, np.int32)
    break_dist = np.zeros((n_samples, nb))
    break_dist[:, 0] = 1.0
    kwargs = dict(
        seed=7, p_recomb=0.5, p_partial=0.5, p_full=1.0, interpret=True,
        mesh=None, burn=burn,
    )
    full = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, ploidy, steps, chains,
        tabulate=False, **kwargs
    )
    tab = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, ploidy, steps, chains,
        tabulate=True, **kwargs
    )
    for a, b in zip(full, tab):
        assert isinstance(b, TabulatedGenotypeTrace)
        pa, pb = a.posterior(), b.posterior()
        np.testing.assert_array_equal(pa.genotypes, pb.genotypes)
        np.testing.assert_array_equal(pa.probabilities, pb.probabilities)
        # per-state llks equal the full trace's llk at each state's
        # first occurrence (the O(n_unique) llk contract)
        for c in range(b.counts.shape[0]):
            live = b.counts[c] > 0
            np.testing.assert_allclose(
                b.llks[c][live], a.llks[c][b.first[c][live]], rtol=1e-6
            )
        assert a.replicate_incongruence() == b.replicate_incongruence()
