"""Device-side posterior tabulation of packed genotype traces.

The de novo pallas kernel emits a base-coded genotype trace
``i32[n_steps, n_base, lanes]`` (ops/pallas_denovo.py).  Fetching the
whole trace through the remote-device link dominated the end-to-end
device stage (BASELINE.md round 2: ~33 s of a 78 s device stage), but
the posterior summary only needs the UNIQUE genotype states and their
multiplicities — the reference builds its posterior from exactly that
tabulation, host-side over the full trace
(``mchap/assemble/classes.py:307-325``).  Here the tabulation runs on
device: canonicalise each step's haplotype rows, lexsort the kept steps
per lane, run-length encode, and compact the distinct states to the
front so the host fetches ``O(n_unique)`` words instead of
``O(n_steps)``.

Everything is plain XLA (three ``lax.sort`` calls — no scatters, so it
maps to the TPU sort unit and vectorises over lanes); the same program
runs on CPU for testing.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("ploidy", "base", "n_cap", "burn")
)
def tabulate_packed_trace(packed, *, ploidy, base, n_cap, burn=0):
    """Tabulate the distinct genotype states of a packed trace per lane.

    Parameters
    ----------
    packed : int[n_steps, n_base, lanes]
        Base-coded trace: digit ``h`` of lane ``l`` step ``s`` position
        ``j`` is haplotype ``h``'s allele (kernel row order).
    ploidy, base : static
        Digit count and radix of the packing.
    n_cap : static
        Maximum distinct states retained per lane (lexicographic
        truncation beyond it — see ``n_unique``).
    burn : static
        Leading steps to drop before tabulating.

    Returns
    -------
    words : i32[k, n_base, lanes]
        Packed distinct states with haplotype rows re-sorted into the
        canonical ascending order (the ``GenotypeMultiTrace`` trace
        canonicalisation), ``k = min(n_cap, kept_steps)``.
    counts : i32[k, lanes]
        Multiplicity of each state over the kept steps (0 beyond
        ``n_unique``).
    first : i32[k, lanes]
        Kept-step index of each state's first occurrence (the
        first-seen tie-break order of ``mset.unique_counts``).
    n_unique : i32[lanes]
        True distinct-state count; a lane with ``n_unique > n_cap`` is
        INCOMPLETE and the caller must fall back to a full-trace fetch.
    """
    packed = packed[burn:].astype(jnp.int32)
    t, nb, lanes = packed.shape
    k_out = min(n_cap, t)

    # 1. canonical haplotype-row sort per step: ascending lexicographic
    #    with position 0 the most significant key (matching the host
    #    trace canonicalisation in models/assemble.py)
    g = jnp.stack(
        [(packed // (base ** h)) % base for h in range(ploidy)], axis=1
    )  # [T, P, NB, L]
    row_sorted = jax.lax.sort(
        tuple(g[:, :, j, :] for j in range(nb)), dimension=1, num_keys=nb
    )
    words = [
        sum(row_sorted[j][:, h, :] * (base ** h) for h in range(ploidy))
        for j in range(nb)
    ]  # nb arrays of i32[T, L]

    # 2. lexsort the kept steps per lane, dragging the original step
    #    index along; the sort is stable, so the head of every run of
    #    equal states carries that state's first-occurrence index
    step_idx = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None], (t, lanes)
    )
    sorted_ops = jax.lax.sort(
        tuple(words) + (step_idx,), dimension=0, num_keys=nb
    )
    words_s = jnp.stack(sorted_ops[:nb], axis=1)  # [T, NB, L]
    idx_s = sorted_ops[nb]

    # 3. run-length encode
    head = jnp.concatenate(
        [
            jnp.ones((1, lanes), bool),
            jnp.any(words_s[1:] != words_s[:-1], axis=1),
        ],
        axis=0,
    )  # [T, L]
    seg = jnp.cumsum(head.astype(jnp.int32), axis=0) - 1
    n_unique = seg[-1] + 1  # [L]

    # 4. compact the run heads to the front with one stable single-key
    #    sort: each head keys on its segment id, non-heads share key T
    headkey = jnp.where(head, seg, t)
    comp = jax.lax.sort(
        (headkey,) + tuple(sorted_ops[:nb]) + (idx_s, step_idx),
        dimension=0,
        num_keys=1,
    )
    words_c = jnp.stack(comp[1 : 1 + nb], axis=1)[:k_out]  # [k, NB, L]
    first = comp[1 + nb][:k_out]
    start = comp[2 + nb]  # run-start positions (rows < n_unique)
    arange_t = jnp.arange(t, dtype=jnp.int32)[:, None]
    nxt = jnp.where(
        arange_t + 1 < n_unique[None, :], jnp.roll(start, -1, axis=0), t
    )
    counts = jnp.where(arange_t < n_unique[None, :], nxt - start, 0)[:k_out]
    return words_c, counts, first, n_unique


def decode_tabulated_states(words, ploidy, base):
    """Host-side decode of tabulated state words.

    words: int[k, n_base, lanes] -> int8[k, ploidy, n_base, lanes] with
    haplotype rows already in canonical ascending order (digit h of a
    word is row h).
    """
    import numpy as np

    words = np.asarray(words, np.int32)
    shifts = np.array([base ** h for h in range(ploidy)], np.int32)
    return (
        (words[:, None, :, :] // shifts[None, :, None, None]) % base
    ).astype(np.int8)
