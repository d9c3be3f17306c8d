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
maps to the TPU sort unit and vectorises over lanes).  Sort keys are
BIT-PACKED: a variadic sort with one operand per SNV position compiles
a comparator whose size grows with the operand count, and at real-data
widths (20+ positions) the TPU backend's compile time for such sorts
explodes (observed: minutes-to-unbounded at nb=23 vs seconds at nb=3).
Packing positions big-endian into ~30-bit words preserves the
lexicographic order exactly while keeping every sort at <= ~6 operands
regardless of locus width.  The same program runs on CPU for testing.
"""

import functools

import jax
import jax.numpy as jnp


def _log2(base):
    """Exact log2 of a power-of-two radix."""
    b = 0
    while (1 << b) < base:
        b += 1
    assert (1 << b) == base, "packing radix must be a power of two"
    return b


@functools.partial(
    jax.jit, static_argnames=("ploidy", "base", "n_cap", "burn")
)
def tabulate_packed_trace(packed, llks=None, *, ploidy, base, n_cap, burn=0):
    """Tabulate the distinct genotype states of a packed trace per lane.

    Parameters
    ----------
    packed : int[n_steps, n_base, lanes]
        Base-coded trace: digit ``h`` of lane ``l`` step ``s`` position
        ``j`` is haplotype ``h``'s allele (kernel row order).
    llks : float[n_steps, lanes], optional
        Per-step log-likelihoods; when given, each distinct state's llk
        (at its first occurrence) rides along so the host can fetch
        O(n_unique) llk values instead of the full step trace.
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
    state_llks : f[k, lanes] — only when ``llks`` was given
        Each distinct state's llk at its first occurrence.
    """
    packed = packed[burn:].astype(jnp.int32)
    t, nb, lanes = packed.shape
    k_out = min(n_cap, t)
    bpos = _log2(base)  # bits per allele digit
    # packed state words must fit in (signed) int32: callers gate the
    # radix (base_pack**ploidy <= 2**24 in models/assemble.py) but a
    # standalone call with a larger radix/ploidy would silently overflow
    # and corrupt the tabulation — fail loudly instead
    if bpos * ploidy > 30:  # ValueError, not assert: survives python -O
        raise ValueError(
            f"packed state word needs {bpos * ploidy} bits"
            " (> 30): radix**ploidy too large for int32 tabulation"
        )

    # 1. canonical haplotype-row sort per step: ascending lexicographic
    #    with position 0 the most significant key (matching the host
    #    trace canonicalisation in models/assemble.py).  Rows are packed
    #    into big-endian multi-position key words so the sort carries
    #    O(nb*bpos/30) operands instead of nb.
    g = jnp.stack(
        [(packed // (base ** h)) % base for h in range(ploidy)], axis=1
    )  # [T, P, NB, L]
    pp_row = max(1, 30 // bpos)  # positions per row key word
    n_rw = -(-nb // pp_row)
    row_words = []
    for w in range(n_rw):
        j0 = w * pp_row
        width = min(pp_row, nb - j0)
        acc = jnp.zeros((t, ploidy, lanes), jnp.int32)
        for i in range(width):
            acc = (acc << bpos) | g[:, :, j0 + i, :]
        row_words.append(acc)
    rs = jax.lax.sort(tuple(row_words), dimension=1, num_keys=n_rw)
    if not isinstance(rs, (tuple, list)):
        rs = (rs,)

    # per-position canonical state words v_j = sum_h allele_hj * base^h,
    # decoded from the sorted row words (elementwise shifts)
    mask = base - 1
    pos_words = []
    for j in range(nb):
        w, i = divmod(j, pp_row)
        width = min(pp_row, nb - w * pp_row)
        shift = bpos * (width - 1 - i)
        digits = (rs[w] >> shift) & mask  # [T, P, L]
        vj = jnp.zeros((t, lanes), jnp.int32)
        for h in range(ploidy):
            vj = vj + digits[:, h, :] * (base ** h)
        pos_words.append(vj)  # [T, L]

    # 2. lexsort the kept steps per lane, dragging the original step
    #    index along; the sort is stable, so the head of every run of
    #    equal states carries that state's first-occurrence index.
    #    Position words pack big-endian into ~30-bit key words, which
    #    preserves the lexicographic order exactly.
    bstate = bpos * ploidy  # bits per per-position state word
    pp = max(1, 30 // bstate)
    n_kw = -(-nb // pp)
    key_words = []
    for w in range(n_kw):
        j0 = w * pp
        width = min(pp, nb - j0)
        acc = jnp.zeros((t, lanes), jnp.int32)
        for i in range(width):
            acc = (acc << bstate) | pos_words[j0 + i]
        key_words.append(acc)
    step_idx = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None], (t, lanes)
    )
    values = (step_idx,)
    if llks is not None:
        values = values + (llks[burn:],)
    sorted_ops = jax.lax.sort(
        tuple(key_words) + values, dimension=0, num_keys=n_kw
    )
    kw_s = jnp.stack(sorted_ops[:n_kw], axis=1)  # [T, n_kw, L]
    idx_s = sorted_ops[n_kw]
    llk_s = sorted_ops[n_kw + 1] if llks is not None else None

    # 3. run-length encode
    head = jnp.concatenate(
        [
            jnp.ones((1, lanes), bool),
            jnp.any(kw_s[1:] != kw_s[:-1], axis=1),
        ],
        axis=0,
    )  # [T, L]
    seg = jnp.cumsum(head.astype(jnp.int32), axis=0) - 1
    n_unique = seg[-1] + 1  # [L]

    # 4. compact the run heads to the front with one stable single-key
    #    sort: each head keys on its segment id, non-heads share key T
    headkey = jnp.where(head, seg, t)
    comp_vals = (idx_s, step_idx)
    if llk_s is not None:
        comp_vals = comp_vals + (llk_s,)
    comp = jax.lax.sort(
        (headkey,) + tuple(sorted_ops[:n_kw]) + comp_vals,
        dimension=0,
        num_keys=1,
    )
    kw_c = jnp.stack(comp[1 : 1 + n_kw], axis=1)[:k_out]  # [k, n_kw, L]
    first = comp[1 + n_kw][:k_out]
    start = comp[2 + n_kw]  # run-start positions (rows < n_unique)
    state_llks = comp[3 + n_kw][:k_out] if llk_s is not None else None
    arange_t = jnp.arange(t, dtype=jnp.int32)[:, None]
    nxt = jnp.where(
        arange_t + 1 < n_unique[None, :], jnp.roll(start, -1, axis=0), t
    )
    counts = jnp.where(arange_t < n_unique[None, :], nxt - start, 0)[:k_out]

    # unpack the compacted key words back to per-position state words
    state_mask = (1 << bstate) - 1
    words_list = []
    for j in range(nb):
        w, i = divmod(j, pp)
        width = min(pp, nb - w * pp)
        shift = bstate * (width - 1 - i)
        words_list.append((kw_c[:, w, :] >> shift) & state_mask)
    words_c = jnp.stack(words_list, axis=1)  # [k, NB, L]
    if state_llks is not None:
        return words_c, counts, first, n_unique, state_llks
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
