"""Pallas TPU kernels: the de novo assembly sampler resident in VMEM.

Two entry points:

- ``pallas_mutation_sweep`` — one MH-within-Gibbs mutation compound
  sweep (reference assemble/mutation.py:164-246) for many chains; the
  original experimental kernel, kept as a building block and test
  surface.
- ``pallas_denovo_sampler`` — the FULL de novo compound step
  (mutation sweep + recombination sweep + partial-dosage sweep +
  full-length dosage step, reference assemble/mcmc.py:268-426) with
  MCMC steps as the inner grid dimension, mirroring the recipe that
  delivered the 35x calling kernel (ops/pallas_calling.py): sampler
  state persists in VMEM scratch across grid iterations and the only
  per-step HBM traffic is a packed [n_base, 128] genotype-trace write.

Design (chain batch on the 128-wide lane axis; one tile of 128 chains
per grid row):

- genotype state as one-hot occupancies [p, nb, A, 128] in VMEM scratch
  (one-hot avoids per-lane integer gathers entirely);
- per-read per-haplotype log-probs rh[p, R, 128] maintained
  incrementally (rank-1 per accepted mutation; interval partial-sum
  exchange per accepted structural move), refreshed from scratch every
  REFRESH steps to bound f32 drift;
- the mutation site loop and the structural interval loops are
  lax.fori_loops with dynamic scratch-ref indexing, so compiled kernel
  size is independent of ploidy x n_base (the unrolled form stalls the
  Mosaic compiler);
- structural moves use the same masked option enumeration as the XLA
  sampler (ops/assemble_mcmc.py interval_step; reference
  structural.py:121-307): segment labels from one-hot dot products,
  C(p,2) recombination / p*(p-1) dosage option tables, MH acceptance
  with the n_options/n_return proposal correction;
- interval partitions are drawn ON-CORE with per-position Bernoulli
  breakpoints whose rate matches the reference's expected break count
  (Beta-discretized, assemble/mcmc.py:429-452).  This is a documented
  design delta: the interval-count distribution differs from the
  reference's, but interval choice is state-independent and symmetric,
  so the stationary distribution is untouched (verified against exact
  enumeration);
- draws via the on-core PRNG (inverse-CDF over static option tables).

Scope: flat genotype prior or the Dirichlet-multinomial prior
(``--use-dirmul-prior``, per-lane dispersion), single temperature or a
parallel-tempering ladder of up to 8 rungs (``--mcmc-temperatures``,
ladder replicas on the chunk axis with in-kernel neighbor swaps) — the
full option surface of the reference sampler.  Only mixed
flat/inbred sample batches fall back to the XLA sampler
(ops/assemble_mcmc.py).

Mosaic constraints honoured (see also ops/pallas_calling.py): trace
with x64 disabled; no value-op dynamic_update_slice (state updates are
masked whole-row writes); no float iota; and NEVER
``jnp.where(pred, new, carry)`` on a rank-1 fori_loop carry — the
Mosaic layout pass hard-crashes (layout.h Check arr.size() >=
layout_rank); use the additive form ``carry + where(pred, new - carry,
0)`` instead.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _uniform_from_bits(bits):
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1e-12)


def _make_kernel(ploidy, n_base, n_alleles, n_reads):
    P, NB, A, R = ploidy, n_base, n_alleles, n_reads

    def kern(seed_ref, nall_ref, lr_ref, counts_ref, g_in_ref, llk_in_ref,
             temp_ref, g_out_ref, rh_out_ref, llk_out_ref, g_s, rh_s):
        tile = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + tile)
        counts = counts_ref[:]  # [R, LANES]
        log_p = jnp.log(jnp.float32(P))

        # load genotype one-hots and (re)build rh state
        for h in range(P):
            g_s[h, :, :, :] = g_in_ref[h, :, :, :]
        for h in range(P):
            acc = jnp.zeros((R, LANES), jnp.float32)
            for j in range(NB):
                sel = jnp.sum(
                    g_s[h, j, :, :][None] * lr_ref[:, j, :, :], axis=1
                )  # [R, LANES]
                acc = acc + sel
            rh_s[h, :, :] = acc

        temp = temp_ref[0]

        # h-major systematic sweep: haplotypes unrolled (static index into
        # scratch), positions as a fori_loop (dynamic leading ref index) —
        # the only ref-indexing pattern this Mosaic toolchain accepts.
        llk = llk_in_ref[0, :]
        for h in range(P):
            def site_body(j, llk, h=h):
                cur_oh = g_s[h, j, :, :]  # [A, LANES]
                lr_j = lr_ref[:, j, :, :]  # [R, A, LANES]
                lr_cur = jnp.sum(cur_oh[None] * lr_j, axis=1)  # [R, LANES]
                base = rh_s[h, :, :] - lr_cur
                others = [rh_s[i, :, :] for i in range(P) if i != h]
                m = others[0]
                for o in others[1:]:
                    m = jnp.maximum(m, o)
                acc = jnp.zeros_like(m)
                for o in others:
                    acc = acc + jnp.exp(o - m)
                rest = m + jnp.log(acc)  # [R, LANES]
                cand = jnp.logaddexp(rest[:, None, :], base[:, None, :] + lr_j)
                llks = jnp.sum(
                    counts[:, None, :] * (cand - log_p), axis=0
                )  # [A, LANES]

                # haplotype-copy proposal correction (mutation.py:84-139)
                row_h = g_s[h, :, :, :]  # [NB, A, LANES]
                col = jnp.concatenate(
                    [g_s[h2, j, :, :][None] for h2 in range(P)], axis=0
                )  # [P, A, LANES]
                dots_list = []
                for h2 in range(P):
                    dots_list.append(
                        jnp.sum(g_s[h2, :, :, :] * row_h, axis=(0, 1))[None]
                    )
                dots = jnp.concatenate(dots_list, axis=0)  # [P, LANES]
                dots_j = jnp.sum(col * cur_oh[None], axis=1)  # [P, LANES]
                keep2 = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) != h
                eq_except = ((dots - dots_j) >= jnp.float32(NB - 1)) & keep2
                counts_a = 1.0 + jnp.sum(
                    jnp.where(eq_except[:, None, :], col, 0.0), axis=0
                )  # [A, LANES]
                count_cur = jnp.sum(counts_a * cur_oh, axis=0)
                lproposal = jnp.log(counts_a) - jnp.log(count_cur)[None, :]

                mh = (llks - llk[None, :]) * temp + lproposal
                a_iota = jax.lax.broadcasted_iota(jnp.int32, (A, LANES), 0)
                nall_j = nall_ref[j]
                valid = (a_iota < nall_j) & (cur_oh < 0.5)
                n_opt = jnp.sum(valid.astype(jnp.float32), axis=0)
                log_accept = jnp.where(
                    valid, jnp.minimum(0.0, mh), jnp.float32(-1e30)
                ) - jnp.log(jnp.maximum(n_opt, 1.0))[None, :]
                probs = jnp.where(valid, jnp.exp(log_accept), 0.0)
                p_move = jnp.sum(probs, axis=0)
                u = _uniform_from_bits(
                    pltpu.bitcast(pltpu.prng_random_bits((8, LANES)), jnp.uint32)
                )[0]
                # static unrolled CDF walk (cumsum is not Mosaic-lowerable)
                acc2 = jnp.zeros(LANES, jnp.float32)
                chosen = jnp.zeros(LANES, jnp.int32)
                for a in range(A):
                    acc2 = acc2 + probs[a]
                    chosen = chosen + (acc2 <= u).astype(jnp.int32)
                moved = u < p_move
                choice_oh = (
                    a_iota == jnp.minimum(chosen, A - 1)[None, :]
                ).astype(jnp.float32)
                new_oh = jnp.where(moved[None, :], choice_oh, cur_oh)
                lr_new = jnp.sum(new_oh[None] * lr_j, axis=1)
                g_s[h, j, :, :] = new_oh
                rh_s[h, :, :] = base + lr_new
                llk_new = jnp.sum(llks * new_oh, axis=0)
                # NOT jnp.where(moved, llk_new, llk): a select whose
                # fallback is the loop carry crashes the Mosaic layout
                # pass (layout.h Check arr.size() >= layout_rank, rank-1
                # carry inferred an implicit 2-D layout); the additive
                # form below is identical and compiles.
                return llk + jnp.where(moved, llk_new - llk, 0.0)

            llk = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(NB), site_body, llk, unroll=False
            )

        for h in range(P):
            g_out_ref[h, :, :, :] = g_s[h, :, :, :]
            rh_out_ref[h, :, :] = rh_s[h, :, :]
        llk_out_ref[0, :] = llk

    return kern


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=())
def pallas_mutation_sweep(seed, n_alleles_arr, log_reads_cl, counts_cl,
                          g_onehot, llk, temp, *, interpret=False):
    """One compound mutation sweep for many chains.

    Parameters
    ----------
    seed : int32 scalar
    n_alleles_arr : i32[n_base]
    log_reads_cl : f32[R, n_base, A, n_chains] (chain-last)
    counts_cl : f32[R, n_chains]
    g_onehot : f32[ploidy, n_base, A, n_chains] genotype occupancies
    llk : f32[n_chains] current log-likelihoods
    temp : f32 scalar inverse temperature

    Returns (g_onehot', rh' [ploidy, R, n_chains], llk').
    """
    R, NB, A, n_chains = log_reads_cl.shape
    P = g_onehot.shape[0]
    assert n_chains % LANES == 0
    n_tiles = n_chains // LANES
    kern = _make_kernel(P, NB, A, R)
    with jax.enable_x64(False):
        out_shapes = (
            jax.ShapeDtypeStruct((P, NB, A, n_chains), jnp.float32),
            jax.ShapeDtypeStruct((P, R, n_chains), jnp.float32),
            jax.ShapeDtypeStruct((1, n_chains), jnp.float32),
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (R, NB, A, LANES), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((R, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (P, NB, A, LANES), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        out_specs = (
            pl.BlockSpec(
                (P, NB, A, LANES), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (P, R, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        )
        interp = pltpu.InterpretParams() if interpret else False
        g_out, rh_out, llk_out = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((P, NB, A, LANES), jnp.float32),
                pltpu.VMEM((P, R, LANES), jnp.float32),
            ],
            input_output_aliases={},
            interpret=interp,
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(n_alleles_arr, jnp.int32),
            log_reads_cl,
            counts_cl,
            g_onehot,
            jnp.asarray(llk, jnp.float32).reshape(1, -1),
            jnp.asarray(temp, jnp.float32).reshape(1),
        )
    return g_out, rh_out, llk_out[0]


# ---------------------------------------------------------------------------
# full-step sampler kernel: steps as grid dim, state resident in VMEM
# ---------------------------------------------------------------------------


def _make_full_kernel(n_steps, ploidy, n_base, n_alleles, n_reads,
                      p_recomb, p_partial, p_full, base, refresh, stage,
                      chunk, n_temps=1, use_prior=False):
    """Kernel factory for the full de novo compound step (v2 layout).

    Performance-critical layout decisions (vs the v1 one-hot kernel,
    which saturated at ~7e5 chain-steps/s):

    - genotype state is INTEGER-VALUED ``g_s[P, NB, LANES]`` (f32-coded
      alleles) instead of one-hot [P, NB, A, LANES]: pairwise row
      equality, segment labels, copy counts and trace packing become
      [NB, LANES] compares instead of one-hot dot products, and VMEM
      state shrinks A-fold;
    - prepared reads live as ``lr[NB, A, R, LANES]`` so every heavy
      operand is an [R, LANES] plane — (64, 128) = 8 fully-occupied
      (8, 128) f32 vregs — instead of the v1 [R, A, LANES] slices whose
      (A=2, 128) trailing tile wasted 3/4 of each vreg's sublanes;
    - biallelic fast path: with A == 2 each mutation site has exactly
      one alternative allele, so candidate scoring needs ONE logaddexp
      chain, not A;
    - the recombination and partial-dosage sweeps FUSE over a single
      shared interval partition: the expensive per-interval work
      (rh interval partial sums, pairwise equality) is computed once,
      the recombination MH fires first (per-lane gate), its acceptance
      permutes the cached partial sums, then the dosage MH reuses them.
      Each interval step is still an individually valid MH move, so the
      stationary distribution is unchanged (gated on TPU vs exact
      enumeration, scripts/gate_pallas_denovo.py);
    - the full-length dosage step uses rh itself as its interval sums
      (mask = everything), skipping the partial-sum pass entirely.

    ``chunk`` packs CHUNK independent 128-lane chain groups into one
    kernel instance with a leading array dimension: the sampler's
    sequential MH blocks are latency-bound (dependency chains of
    reductions and transcendentals), so carrying 4x independent data
    per op amortises instruction latency, and per-lane scalars become
    (CHUNK, 128) tiles instead of 1/8-occupied single vregs.

    ``stage`` gates sub-steps for incremental compile probing:
    1 = mutation only, 2 = + fused partition sweep, 3 = + full dosage.

    ``use_prior`` enables the Dirichlet-multinomial genotype prior
    (reference assemble/prior.py:81-112) with per-lane dispersion
    ``alpha_ref``.  The prior depends only on the genotype's haplotype
    dosage, so every MH ratio needs just the copy counts the kernel
    already tracks: for the mutation sweep the DM permutation term
    cancels against the copy-count proposal correction, leaving
    log((count_new-1+alpha)/(count_cur-1+alpha)) per candidate; the
    structural sweeps evaluate the dosage pmf difference from the
    pairwise row-equality matrices (t(d) = sum_{k<d} log(alpha+k)
    - log d!, normalising constants cancel in ratios).

    ``n_temps > 1`` turns the chunk axis into a parallel-tempering
    ladder (chunk == n_temps, temperatures ascending so slot C-1 is the
    cold chain): every MH llk-difference is multiplied by the slot's
    inverse temperature ``temps_ref`` and the compound step ends with
    the reference's warm-to-cold neighbor state swaps
    (assemble/tempering.py:61-151) — swaps exchange the cached genotype,
    rh and llk rows between adjacent C slots, which on this layout are
    plain masked row selects, not cross-lane traffic.
    """
    STEPS = n_steps
    C = chunk
    P, NB, A, R = ploidy, n_base, n_alleles, n_reads
    # cap on interval-partition segments per structural sweep: the
    # sequential interval loop is the sampler's dominant cost, and the
    # Bernoulli(~E[Beta(1,3) breaks]/NB) partition has ~NB/4 expected
    # segments, so capping at NB//4 + 2 segments (extra breaks merge
    # into the last segment, P(breaks > cap) ~ a few percent) trades a
    # slightly coarser proposal partition for a ~1/3 shorter loop —
    # interval choice is state-independent, so the stationary
    # distribution is untouched (gates: scripts/gate_pallas_denovo.py)
    MAXSEG = max(2, min(NB, NB // 4 + 2))
    RECOMB_PAIRS = [(a, b) for a in range(P) for b in range(a + 1, P)]
    DOSAGE_PAIRS = [(a, b) for a in range(P) for b in range(P) if a != b]

    def kern(seed_ref, nall_ref, pbreak_ref, temps_ref, alpha_ref, lr_ref,
             counts_ref, g0_ref, gtrace_ref, lltrace_ref, g_s, rh_s, llk_s):
        tile = pl.program_id(0)
        step = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + tile * jnp.int32(STEPS) + step)
        counts = counts_ref[:]  # [C, R, LANES]
        temp = temps_ref[:, 0, :]  # [C, LANES] inverse temperatures
        log_p = jnp.log(jnp.float32(P))

        if use_prior:
            alpha = alpha_ref[:, 0, :]  # [C, LANES] DM dispersion
            # log(alpha + k) for k = 0..P-1 and log d! lookups, shared
            # by every dosage pmf term t(d) = sum_{k<d} log(alpha+k) - log d!
            log_alpha_k = [jnp.log(alpha + jnp.float32(k)) for k in range(P)]
            log_ints = [jnp.log(jnp.float32(m)) for m in range(2, P + 1)]

            def t_of(d):
                """Per-dosage DM pmf term for integer-valued d [C, LANES]."""
                s = jnp.zeros((C, LANES), jnp.float32)
                for k in range(P):
                    s = s + jnp.where(
                        d > jnp.float32(k) + 0.5, log_alpha_k[k], 0.0
                    )
                for m in range(2, P + 1):
                    s = s - jnp.where(
                        d > jnp.float32(m) - 0.5, log_ints[m - 2], 0.0
                    )
                return s

            def prior_S(eqm):
                """Dosage DM log-pmf (up to a genotype-independent
                constant) from a full-row equality matrix eqm[i][j]
                of [C, LANES] f32 indicators."""
                S = jnp.zeros((C, LANES), jnp.float32)
                for h in range(P):
                    d = jnp.zeros((C, LANES), jnp.float32)
                    for j2 in range(P):
                        d = d + eqm[h][j2]
                    first = jnp.ones((C, LANES), jnp.float32)
                    for hp in range(h):
                        first = first * (1.0 - eqm[hp][h])
                    S = S + first * t_of(d)
                return S

        def uniform(shape):
            return _uniform_from_bits(
                pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            )

        def uniform_lane():
            return uniform((8, LANES))[:C]  # [C, LANES]

        def sel_lr_static(j, val, mrow=None):
            """lr at static position j gathered by allele value.

            ``val`` [C, LANES] f32 allele values; optional ``mrow``
            [C, LANES] folds an interval mask into the gather for free.
            Returns [C, R, LANES].
            """
            lr_j = lr_ref[j]  # [C, A, R, LANES] (static leading index)
            acc = jnp.zeros((C, R, LANES), jnp.float32)
            for a in range(A):
                cond = val == jnp.float32(a)
                if mrow is not None:
                    cond = cond & (mrow > 0.5)
                acc = acc + jnp.where(cond[:, None, :], lr_j[:, a], 0.0)
            return acc

        def lse_of(rs):
            if not rs:
                return jnp.full((C, R, LANES), -1e30, jnp.float32)
            m = rs[0]
            for o in rs[1:]:
                m = jnp.maximum(m, o)
            acc = jnp.zeros_like(m)
            for o in rs:
                acc = acc + jnp.exp(o - m)
            return m + jnp.log(acc)

        def lse_llk(rows):
            """sum_r counts * (logsumexp_h rows[h] - log P) -> [C, LANES]."""
            return jnp.sum(counts * (lse_of(rows) - log_p), axis=1)

        @pl.when(step == 0)
        def _():
            for h in range(P):
                g_s[h, :, :, :] = g0_ref[h, :, :, :]

        # (re)build rh + llk from the genotype values: at step 0 and
        # every ``refresh`` steps to bound incremental-update f32 drift
        @pl.when(jax.lax.rem(step, jnp.int32(refresh)) == 0)
        def _():
            for h in range(P):
                acc = jnp.zeros((C, R, LANES), jnp.float32)
                for j in range(NB):
                    acc = acc + sel_lr_static(j, g_s[h, :, j, :])
                rh_s[h, :, :, :] = acc
            llk_s[:, :] = lse_llk([rh_s[h, :, :, :] for h in range(P)])

        llk = llk_s[:, :]  # [C, LANES]
        nb_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NB, 1), 1)

        # ------------------------------------------------------------------
        # 1. mutation compound sweep (systematic h-major site order)
        # ------------------------------------------------------------------
        for h in range(P):
            # logsumexp over the OTHER haplotypes' rh rows is invariant
            # across haplotype h's whole site loop: hoist it
            if P > 1:
                rest = lse_of([rh_s[i, :, :, :] for i in range(P) if i != h])
            else:
                rest = jnp.full((C, R, LANES), -1e30, jnp.float32)

            def site_body(j, carry, h=h, rest=rest):
                # carry: (llk, per-row whole-row match counts d[h2] =
                # sum_col (g_s[h2] == g_s[h])) — d is maintained
                # INCREMENTALLY across the site loop (only column j can
                # change per update), replacing a [C, NB, LANES]
                # compare + reduce per other row per site
                llk, d = carry
                j_oh = (nb_iota == j).astype(jnp.float32)  # [1, NB, 1]
                row_h = g_s[h, :, :, :]  # [C, NB, LANES]
                cur = jnp.sum(row_h * j_oh, axis=1)  # [C, LANES]
                lr_j = lr_ref[j]  # [C, A, R, LANES] (dynamic leading index)
                lr_cur = jnp.zeros((C, R, LANES), jnp.float32)
                for a in range(A):
                    lr_cur = lr_cur + jnp.where(
                        (cur == jnp.float32(a))[:, None, :], lr_j[:, a], 0.0
                    )
                b = rh_s[h, :, :, :] - lr_cur
                nall_j = jnp.sum(
                    nall_ref[:].astype(jnp.float32) * j_oh, axis=1
                )  # [C, LANES]

                # copy-count proposal correction (mutation.py:84-139):
                # rows equal to row h outside position j, per other row
                colv = []
                for h2 in range(P):
                    if h2 == h:
                        colv.append(cur)
                        continue
                    colv.append(jnp.sum(g_s[h2, :, :, :] * j_oh, axis=1))
                eq_except = []
                eqj_cur = []
                for h2 in range(P):
                    if h2 == h:
                        eq_except.append(None)
                        eqj_cur.append(None)
                        continue
                    eqj = (colv[h2] == cur).astype(jnp.float32)
                    eqj_cur.append(eqj)
                    eq_except.append((d[h2] - eqj) >= jnp.float32(NB - 1))

                if A == 2:
                    # biallelic fast path: exactly one alternative allele
                    alt = 1.0 - cur
                    lr_alt = lr_j[:, 0] + lr_j[:, 1] - lr_cur
                    cand = jnp.logaddexp(rest, b + lr_alt)
                    llk_alt = jnp.sum(counts * (cand - log_p), axis=1)
                    count_cur = jnp.ones((C, LANES), jnp.float32)
                    count_alt = jnp.ones((C, LANES), jnp.float32)
                    for h2 in range(P):
                        if h2 == h:
                            continue
                        e = eq_except[h2].astype(jnp.float32)
                        is_cur = (colv[h2] == cur).astype(jnp.float32)
                        count_cur = count_cur + e * is_cur
                        count_alt = count_alt + e * (1.0 - is_cur)
                    if use_prior:
                        # DM dosage prior ratio; its permutation term is
                        # log(count_cur/count_alt) (assemble/prior.py)
                        lpr = (
                            jnp.log(count_cur) - jnp.log(count_alt)
                            + jnp.log(count_alt - 1.0 + alpha)
                            - jnp.log(count_cur - 1.0 + alpha)
                        )
                    else:
                        lpr = 0.0
                    mh = (llk_alt - llk + lpr) * temp + jnp.log(
                        count_alt
                    ) - jnp.log(count_cur)
                    p_acc = jnp.where(
                        nall_j > 1.5, jnp.exp(jnp.minimum(0.0, mh)), 0.0
                    )
                    u = uniform_lane()
                    moved = u < p_acc
                    movedf = moved.astype(jnp.float32)
                    new = cur + movedf * (alt - cur)
                    g_s[h, :, :, :] = row_h + j_oh * (new - cur)[:, None, :]
                    rh_s[h, :, :, :] = b + lr_cur + jnp.where(
                        moved[:, None, :], lr_alt - lr_cur, 0.0
                    )
                    d_new = tuple(
                        d[h2]
                        if h2 == h
                        # A == 2: a flip turns a column match into a
                        # mismatch and vice versa
                        else d[h2] + movedf * (1.0 - 2.0 * eqj_cur[h2])
                        for h2 in range(P)
                    )
                    return llk + movedf * (llk_alt - llk), d_new

                # general path: score every allele
                llks = []
                for a in range(A):
                    cand = jnp.logaddexp(rest, b + lr_j[:, a])
                    llks.append(jnp.sum(counts * (cand - log_p), axis=1))
                counts_a = []
                for a in range(A):
                    ca = jnp.ones((C, LANES), jnp.float32)
                    for h2 in range(P):
                        if h2 == h:
                            continue
                        ca = ca + (
                            eq_except[h2]
                            & (colv[h2] == jnp.float32(a))
                        ).astype(jnp.float32)
                    counts_a.append(ca)
                count_cur = jnp.zeros((C, LANES), jnp.float32)
                for a in range(A):
                    count_cur = count_cur + jnp.where(
                        cur == jnp.float32(a), counts_a[a], 0.0
                    )
                valid = []
                n_opt = jnp.zeros((C, LANES), jnp.float32)
                for a in range(A):
                    v = (
                        (jnp.float32(a) < nall_j)
                        & (cur != jnp.float32(a))
                        & (nall_j > 1.5)
                    )
                    valid.append(v)
                    n_opt = n_opt + v.astype(jnp.float32)
                probs = []
                p_move = jnp.zeros((C, LANES), jnp.float32)
                for a in range(A):
                    if use_prior:
                        lpr = (
                            jnp.log(count_cur) - jnp.log(counts_a[a])
                            + jnp.log(counts_a[a] - 1.0 + alpha)
                            - jnp.log(count_cur - 1.0 + alpha)
                        )
                    else:
                        lpr = 0.0
                    mh = (llks[a] - llk + lpr) * temp + jnp.log(
                        counts_a[a]
                    ) - jnp.log(count_cur)
                    pa = jnp.where(
                        valid[a],
                        jnp.exp(jnp.minimum(0.0, mh))
                        / jnp.maximum(n_opt, 1.0),
                        0.0,
                    )
                    probs.append(pa)
                    p_move = p_move + pa
                u = uniform_lane()
                acc2 = jnp.zeros((C, LANES), jnp.float32)
                chosen = jnp.zeros((C, LANES), jnp.float32)
                for a in range(A):
                    acc2 = acc2 + probs[a]
                    chosen = chosen + (acc2 <= u).astype(jnp.float32)
                chosen = jnp.minimum(chosen, jnp.float32(A - 1))
                moved = u < p_move
                movedf = moved.astype(jnp.float32)
                new = cur + movedf * (chosen - cur)
                lr_new = jnp.zeros((C, R, LANES), jnp.float32)
                for a in range(A):
                    lr_new = lr_new + jnp.where(
                        (new == jnp.float32(a))[:, None, :], lr_j[:, a], 0.0
                    )
                llk_new = jnp.zeros((C, LANES), jnp.float32)
                for a in range(A):
                    llk_new = llk_new + jnp.where(
                        chosen == jnp.float32(a), llks[a], 0.0
                    )
                g_s[h, :, :, :] = row_h + j_oh * (new - cur)[:, None, :]
                rh_s[h, :, :, :] = b + lr_new
                d_new = tuple(
                    d[h2]
                    if h2 == h
                    else d[h2]
                    + movedf
                    * ((colv[h2] == new).astype(jnp.float32) - eqj_cur[h2])
                    for h2 in range(P)
                )
                return llk + movedf * (llk_new - llk), d_new

            d0 = tuple(
                jnp.zeros((C, LANES), jnp.float32)
                if h2 == h
                else jnp.sum(
                    (g_s[h2, :, :, :] == g_s[h, :, :, :]).astype(jnp.float32),
                    axis=1,
                )
                for h2 in range(P)
            )
            llk, _ = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(NB), site_body, (llk, d0),
                unroll=False,
            )

        # ------------------------------------------------------------------
        # structural machinery
        # ------------------------------------------------------------------

        def draw_seg_id():
            """Per-lane segment ids from Bernoulli breaks: [C, NB, LANES]."""
            pb = pbreak_ref[:, 0, :]  # [C, LANES]
            rows = []
            acc = jnp.zeros((C, LANES), jnp.float32)
            rows.append(acc[:, None, :])
            for j in range(1, NB):
                brk_j = (uniform_lane() < pb).astype(jnp.float32)
                acc = jnp.minimum(acc + brk_j, jnp.float32(MAXSEG - 1))
                rows.append(acc[:, None, :])
            return jnp.concatenate(rows, axis=1)  # [C, NB, LANES] f32

        def count_kind_options(lab_in, lab_out, kind):
            """# of valid options of ``kind`` given label vectors.

            lab_in/lab_out: python lists of P [C, LANES] f32 label
            values.  Mirrors recombination_n_options / dosage_n_options.
            """
            eq_in = [[(lab_in[i] == lab_in[j]) for j in range(P)]
                     for i in range(P)]
            eq_full = [[eq_in[i][j] & (lab_out[i] == lab_out[j])
                        for j in range(P)] for i in range(P)]
            first_full = []
            first_in = []
            count_in = []
            for hh in range(P):
                ff = jnp.ones((C, LANES), jnp.float32)
                fi = jnp.ones((C, LANES), jnp.float32)
                for hp in range(hh):
                    ff = ff * (1.0 - eq_full[hp][hh].astype(jnp.float32))
                    fi = fi * (1.0 - eq_in[hp][hh].astype(jnp.float32))
                first_full.append(ff > 0.5)
                first_in.append(fi > 0.5)
                ci = jnp.zeros((C, LANES), jnp.float32)
                for hp in range(P):
                    ci = ci + eq_in[hp][hh].astype(jnp.float32)
                count_in.append(ci)
            n = jnp.zeros((C, LANES), jnp.float32)
            if kind == 0:
                for (a, b2) in RECOMB_PAIRS:
                    v = (first_full[a] & first_full[b2]
                         & ~eq_in[a][b2] & (lab_out[a] != lab_out[b2]))
                    n = n + v.astype(jnp.float32)
            else:
                for (a, b2) in DOSAGE_PAIRS:
                    sd_a = jnp.where(first_in[a], count_in[a], 0.0)
                    v = (first_full[a] & (jnp.abs(sd_a - 1.0) > 0.5)
                         & first_in[b2] & ~eq_in[a][b2])
                    n = n + v.astype(jnp.float32)
            return n

        def structural_mh(mask, len_in, rh_int, gate, llk, kind,
                          full_interval=False):
            """One structural MH step given precomputed interval sums.

            Returns (llk', srcw, rh_int') where srcw[h][hp] [C, LANES]
            is the source-row weight matrix of the applied (or identity)
            move.  State (g_s, rh_s) is updated in place.
            """
            # pairwise row equality inside / outside the interval from
            # integer-valued rows: one [C, NB, LANES] compare per pair
            eq_in = [[None] * P for _ in range(P)]
            eq_out = [[None] * P for _ in range(P)]
            for i in range(P):
                eq_in[i][i] = jnp.ones((C, LANES), jnp.bool_)
                eq_out[i][i] = jnp.ones((C, LANES), jnp.bool_)
                for j2 in range(i + 1, P):
                    eqpos = (g_s[i, :, :, :] == g_s[j2, :, :, :]).astype(
                        jnp.float32
                    )
                    d_in = jnp.sum(eqpos * mask, axis=1)
                    d_all = jnp.sum(eqpos, axis=1)
                    e_in = d_in >= len_in - 0.5
                    e_out = (d_all - d_in) >= (jnp.float32(NB) - len_in) - 0.5
                    eq_in[i][j2] = eq_in[j2][i] = e_in
                    eq_out[i][j2] = eq_out[j2][i] = e_out

            def labels_of(eq):
                labs = []
                for hh in range(P):
                    found = jnp.zeros((C, LANES), jnp.float32)
                    lab = jnp.zeros((C, LANES), jnp.float32)
                    for hp in range(hh + 1):
                        e = eq[hp][hh].astype(jnp.float32)
                        take = e * (1.0 - found)
                        lab = lab + jnp.float32(hp) * take
                        found = jnp.maximum(found, e)
                    labs.append(lab)
                return labs

            lab_in = labels_of(eq_in)
            lab_out = labels_of(eq_out)

            eq_fullrow = [[eq_in[i][j2] & eq_out[i][j2] for j2 in range(P)]
                          for i in range(P)]
            first_full = []
            first_in = []
            count_in = []
            for hh in range(P):
                ff = jnp.ones((C, LANES), jnp.float32)
                fi = jnp.ones((C, LANES), jnp.float32)
                ci = jnp.zeros((C, LANES), jnp.float32)
                for hp in range(P):
                    if hp < hh:
                        ff = ff * (1.0 - eq_fullrow[hp][hh].astype(jnp.float32))
                        fi = fi * (1.0 - eq_in[hp][hh].astype(jnp.float32))
                    ci = ci + eq_in[hp][hh].astype(jnp.float32)
                first_full.append(ff > 0.5)
                first_in.append(fi > 0.5)
                count_in.append(ci)

            pairs = RECOMB_PAIRS if kind == 0 else DOSAGE_PAIRS
            K = len(pairs)
            rows0 = [rh_s[h, :, :, :] for h in range(P)]
            # shared-anchor linear-domain scoring of the CURRENT rows:
            # one exp per row, and every excluded-row logsumexp (the
            # per-pair "rest" terms) becomes adds + one log — vs a
            # fresh max/exp/log chain per pair.  The excluded-row sums
            # are built by ADDING the kept rows, never by subtracting
            # from the total, so there is no cancellation when one row
            # carries all the mass.  Candidate rows of PARTIAL-interval
            # moves can exceed the anchor by an unbounded margin
            # (interval sums of log-probs), so those keep logaddexp;
            # with ``full_interval`` the candidate row IS an existing
            # row (rows0[b2] <= anchor) and goes linear too — the
            # full-length dosage step drops all 12 of its logaddexps.
            m_anchor = rows0[0]
            for h in range(1, P):
                m_anchor = jnp.maximum(m_anchor, rows0[h])
            e_rows = [jnp.exp(rows0[h] - m_anchor) for h in range(P)]

            def sum_rows(hs):
                acc = None
                for h in hs:
                    acc = e_rows[h] if acc is None else acc + e_rows[h]
                if acc is None:
                    acc = jnp.zeros((C, R, LANES), jnp.float32)
                return acc

            def log_of(e_sum):
                return jnp.log(jnp.maximum(e_sum, 1e-30)) + m_anchor

            if kind == 0:
                rest = {
                    (a, b2): log_of(
                        sum_rows([h for h in range(P) if h != a and h != b2])
                    )
                    for (a, b2) in pairs
                }
            else:
                rest_e = {
                    a: sum_rows([h for h in range(P) if h != a])
                    for a in set(a for (a, _) in pairs)
                }
                if not full_interval:
                    rest = {a: log_of(e) for a, e in rest_e.items()}

            if use_prior:
                eqf_cur = [
                    [eq_fullrow[i][j2].astype(jnp.float32) for j2 in range(P)]
                    for i in range(P)
                ]
                S_cur = prior_S(eqf_cur)

                def option_prior_ratio(a, b2):
                    """DM prior log-ratio of the (a, b2) move: rebuild the
                    full-row equality matrix of the proposed genotype from
                    the interval/outside equality matrices (new row a is
                    b2-inside + a-outside; for recombination row b2 is
                    a-inside + b2-outside)."""
                    changed = {a, b2} if kind == 0 else {a}
                    src_in = {a: b2, b2: a} if kind == 0 else {a: b2}
                    new_eq = [[None] * P for _ in range(P)]
                    for i in range(P):
                        for j2 in range(i, P):
                            if i == j2:
                                e = jnp.ones((C, LANES), jnp.float32)
                            else:
                                si = src_in.get(i, i)
                                sj = src_in.get(j2, j2)
                                if i in changed or j2 in changed:
                                    e = (
                                        eq_in[si][sj] & eq_out[i][j2]
                                    ).astype(jnp.float32)
                                else:
                                    e = eqf_cur[i][j2]
                            new_eq[i][j2] = e
                            new_eq[j2][i] = e
                    return prior_S(new_eq) - S_cur

            valid = []
            llk_opts = []
            n_return = []
            lpriors = []
            for (a, b2) in pairs:
                if kind == 0:
                    v = (first_full[a] & first_full[b2]
                         & ~eq_in[a][b2] & ~eq_out[a][b2])
                    row_a = rows0[a] - rh_int[a] + rh_int[b2]
                    row_b = rows0[b2] - rh_int[b2] + rh_int[a]
                    cand = jnp.logaddexp(
                        jnp.logaddexp(row_a, row_b), rest[(a, b2)]
                    )
                    li = list(lab_in)
                    li[a], li[b2] = lab_in[b2], lab_in[a]
                else:
                    sd_a = jnp.where(first_in[a], count_in[a], 0.0)
                    v = (first_full[a] & (jnp.abs(sd_a - 1.0) > 0.5)
                         & first_in[b2] & ~eq_in[a][b2])
                    if full_interval:
                        cand = log_of(rest_e[a] + e_rows[b2])
                    else:
                        row_a = rows0[a] - rh_int[a] + rh_int[b2]
                        cand = jnp.logaddexp(row_a, rest[a])
                    li = list(lab_in)
                    li[a] = lab_in[b2]
                valid.append(v)
                llk_opts.append(jnp.sum(counts * (cand - log_p), axis=1))
                n_return.append(count_kind_options(li, lab_out, kind))
                lpriors.append(
                    option_prior_ratio(a, b2) if use_prior else 0.0
                )

            n_options = jnp.zeros((C, LANES), jnp.float32)
            for v in valid:
                n_options = n_options + v.astype(jnp.float32)

            probs = []
            p_move = jnp.zeros((C, LANES), jnp.float32)
            for k in range(K):
                lp = jnp.log(jnp.maximum(n_options, 1.0)) - jnp.log(
                    jnp.maximum(n_return[k], 1.0)
                )
                mh = (llk_opts[k] - llk + lpriors[k]) * temp + lp
                pk = jnp.where(
                    valid[k] & (gate > 0.5),
                    jnp.exp(jnp.minimum(0.0, mh))
                    / jnp.maximum(n_options, 1.0),
                    0.0,
                )
                probs.append(pk)
                p_move = p_move + pk

            u = uniform_lane()
            acc2 = jnp.zeros((C, LANES), jnp.float32)
            chosen = jnp.zeros((C, LANES), jnp.int32)
            for k in range(K):
                acc2 = acc2 + probs[k]
                chosen = chosen + (acc2 <= u).astype(jnp.int32)
            moved = (u < p_move).astype(jnp.float32)
            ch = []
            for k in range(K):
                ch.append(
                    moved
                    * (jnp.minimum(chosen, K - 1) == k).astype(jnp.float32)
                )

            # source-row weights: srcw[h][hp] = P(new row h copies row hp)
            srcw = [[None] * P for _ in range(P)]
            for h in range(P):
                for hp in range(P):
                    w = (
                        1.0 - moved
                        if h == hp
                        else jnp.zeros((C, LANES), jnp.float32)
                    )
                    for k, (a, b2) in enumerate(pairs):
                        if kind == 0:
                            src = b2 if h == a else (a if h == b2 else h)
                        else:
                            src = b2 if h == a else h
                        if src == hp:
                            w = w + ch[k]
                    srcw[h][hp] = w

            # apply: masked whole-row writes driven by srcw
            m2 = mask  # [C, NB, LANES]
            new_g = []
            new_rh = []
            for h in range(P):
                gsum = jnp.zeros((C, NB, LANES), jnp.float32)
                rsum = jnp.zeros((C, R, LANES), jnp.float32)
                for hp in range(P):
                    gsum = gsum + srcw[h][hp][:, None, :] * g_s[hp, :, :, :]
                    rsum = rsum + srcw[h][hp][:, None, :] * rh_int[hp]
                new_g.append(gsum)
                new_rh.append(rsum)
            for h in range(P):
                g_s[h, :, :, :] = (
                    m2 * new_g[h] + (1.0 - m2) * g_s[h, :, :, :]
                )
                rh_s[h, :, :, :] = rh_s[h, :, :, :] - rh_int[h] + new_rh[h]

            dllk = jnp.zeros((C, LANES), jnp.float32)
            for k in range(K):
                dllk = dllk + ch[k] * (llk_opts[k] - llk)
            return llk + dllk, srcw, new_rh

        # ------------------------------------------------------------------
        # 2. fused recombination + partial-dosage sweep (one shared
        #    partition; rh interval sums computed once per interval)
        # ------------------------------------------------------------------
        if stage >= 2 and P > 1:
            gate_r = (uniform_lane() <= jnp.float32(p_recomb)).astype(
                jnp.float32
            )
            gate_d = (uniform_lane() <= jnp.float32(p_partial)).astype(
                jnp.float32
            )
            seg = draw_seg_id()

            def seg_body(i, llk):
                mask = (seg == i.astype(jnp.float32)).astype(jnp.float32)
                len_in = jnp.sum(mask, axis=1)  # [C, LANES]
                # per-haplotype interval partial sums (the heavy pass);
                # j-major so each position's lr block is loaded once and
                # its allele-0/1 difference shared by all P rows, with
                # the A == 2 gather as arithmetic select
                rh_int = [
                    jnp.zeros((C, R, LANES), jnp.float32) for _ in range(P)
                ]
                for j in range(NB):
                    lr_j = lr_ref[j]  # [C, A, R, LANES]
                    mrow = mask[:, j, :][:, None, :]  # [C, 1, LANES]
                    if A == 2:
                        lr0 = lr_j[:, 0]
                        dlr = lr_j[:, 1] - lr0
                        for h in range(P):
                            val = g_s[h, :, j, :][:, None, :]
                            rh_int[h] = rh_int[h] + mrow * (lr0 + val * dlr)
                    else:
                        for h in range(P):
                            rh_int[h] = rh_int[h] + sel_lr_static(
                                j, g_s[h, :, j, :], mrow=mask[:, j, :]
                            )
                llk, srcw, rh_int_new = structural_mh(
                    mask, len_in, rh_int, gate_r, llk, 0
                )
                if stage >= 3:
                    # dosage MH on the SAME interval, reusing the
                    # permuted interval sums
                    llk, _, _ = structural_mh(
                        mask, len_in, rh_int_new, gate_d, llk, 1
                    )
                return llk

            llk = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(MAXSEG), seg_body, llk, unroll=False
            )

        # ------------------------------------------------------------------
        # 3. full-length dosage step: the interval is everything, so the
        #    interval sums ARE the rh rows — no partial-sum pass needed
        # ------------------------------------------------------------------
        if stage >= 3 and P > 1:
            gate_f = (uniform_lane() <= jnp.float32(p_full)).astype(
                jnp.float32
            )
            rh_full = [rh_s[h, :, :, :] for h in range(P)]
            llk, _, _ = structural_mh(
                jnp.ones((C, NB, LANES), jnp.float32),
                jnp.full((C, LANES), jnp.float32(NB)),
                rh_full, gate_f, llk, 1, full_interval=True,
            )

        # ------------------------------------------------------------------
        # 4. parallel-tempering neighbor swaps over the chunk-axis ladder
        #    (warm -> cold, reference tempering.py:61-151 / Sambridge
        #    2014 eq. 11; flat prior, so posterior == llk)
        # ------------------------------------------------------------------
        if n_temps > 1:
            if use_prior:
                # posterior = llk + DM prior of each slot's genotype
                eqm = [[None] * P for _ in range(P)]
                for i in range(P):
                    eqm[i][i] = jnp.ones((C, LANES), jnp.float32)
                    for j2 in range(i + 1, P):
                        same = jnp.sum(
                            (g_s[i, :, :, :] == g_s[j2, :, :, :]).astype(
                                jnp.float32
                            ),
                            axis=1,
                        )
                        e = (same >= jnp.float32(NB) - 0.5).astype(jnp.float32)
                        eqm[i][j2] = eqm[j2][i] = e
                pri = prior_S(eqm)
            else:
                pri = jnp.zeros((C, LANES), jnp.float32)
            rows = [llk[t : t + 1] for t in range(C)]  # [1, LANES] each
            prows = [pri[t : t + 1] for t in range(C)]
            for t in range(1, C):
                u = uniform((8, LANES))[0:1]  # [1, LANES]
                ex = (
                    (rows[t - 1] + prows[t - 1]) - (rows[t] + prows[t])
                ) * (temp[t : t + 1] - temp[t - 1 : t])
                sw = (u < jnp.exp(jnp.minimum(0.0, ex))).astype(jnp.float32)
                for h in range(P):
                    ga = g_s[h, t - 1, :, :]
                    gb = g_s[h, t, :, :]
                    g_s[h, t - 1, :, :] = ga + sw * (gb - ga)
                    g_s[h, t, :, :] = gb + sw * (ga - gb)
                    ra = rh_s[h, t - 1, :, :]
                    rb = rh_s[h, t, :, :]
                    rh_s[h, t - 1, :, :] = ra + sw * (rb - ra)
                    rh_s[h, t, :, :] = rb + sw * (ra - rb)
                la, lb = rows[t - 1], rows[t]
                rows[t - 1] = la + sw * (lb - la)
                rows[t] = lb + sw * (la - lb)
                pa, pb = prows[t - 1], prows[t]
                prows[t - 1] = pa + sw * (pb - pa)
                prows[t] = pb + sw * (pa - pb)
            llk = jnp.concatenate(rows, axis=0)

        # ------------------------------------------------------------------
        # trace write: base-packed genotype + llk
        # ------------------------------------------------------------------
        llk_s[:, :] = llk
        packed = jnp.zeros((C, NB, LANES), jnp.float32)
        for h in range(P):
            packed = packed + g_s[h, :, :, :] * jnp.float32(base ** h)
        gtrace_ref[0, :, :, :] = packed.astype(jnp.int32)
        lltrace_ref[0, :, 0, :] = llk

    return kern


def _next_pow2(x):
    n = 1
    while n < x:
        n *= 2
    return n


def unpack_genotype_trace(packed, ploidy, n_alleles):
    """Host-side decode of a ``packed=True`` trace.

    packed: [n_steps, n_base, n_chains] ints (allele_h at digit h of the
    base-``_next_pow2(max(A, 2))`` code) -> int8[n_steps, ploidy, n_base,
    n_chains].
    """
    import numpy as np

    base = _next_pow2(max(n_alleles, 2))
    packed = np.asarray(packed, np.int32)
    shifts = np.array([base ** h for h in range(ploidy)], np.int32)
    return (
        (packed[:, None, :, :] // shifts[None, :, None, None]) % base
    ).astype(np.int8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_steps", "ploidy", "p_recomb", "p_partial", "p_full",
        "refresh", "stage", "packed", "interpret", "chunk_override",
    ),
)
def pallas_denovo_sampler(
    seed,
    log_reads_cl,
    counts_cl,
    g_init,
    nall_cl,
    pbreak_cl,
    temps=None,
    alphas_cl=None,
    *,
    n_steps,
    ploidy,
    p_recomb=0.5,
    p_partial=0.5,
    p_full=1.0,
    refresh=64,
    stage=3,
    packed=False,
    interpret=False,
    chunk_override=None,
):
    """Run the full de novo assembly MCMC for many chains on-core.

    Parameters
    ----------
    seed : int32 scalar
    log_reads_cl : f32[R, n_base, A, n_chains] chain-last prepared reads
        (n_chains a multiple of 128; padding reads must be all-gap with
        zero counts)
    counts_cl : f32[R, n_chains]
    g_init : i32[ploidy, n_base, n_chains] initial allele matrices
    nall_cl : i32[n_base, n_chains] per-lane allele counts (homozygote-
        fixed positions carry 1)
    pbreak_cl : f32[1, n_chains] per-lane Bernoulli breakpoint rate
    temps : optional f32[n_temps] ascending inverse-temperature ladder,
        last == 1.0 (reference tempering.py); None = single temperature.
        With a ladder, every chain lane runs n_temps coupled replicas on
        the kernel's chunk axis and the returned trace is the COLD chain
    alphas_cl : optional f32[n_chains] per-lane Dirichlet-multinomial
        dispersion alpha = (1-F)/F / u_haps (reference prior.py:81-112);
        None = flat genotype prior
    n_steps, ploidy : static
    p_recomb, p_partial, p_full : static sub-step gate probabilities
        (reference mcmc.py:381-393)
    refresh : static; rebuild rh/llk from the genotype every this many
        steps (f32 drift bound)
    stage : static sub-step gate for compile probing (3 = full sampler)
    packed : static; return the base-packed genotype trace
        (uint8/int16[n_steps, n_base, n_chains], value = sum_h
        allele_h * base**h) instead of unpacked alleles — 4x less
        device->host traffic, decode with ``unpack_genotype_trace``

    Returns
    -------
    genotypes : int8[n_steps, ploidy, n_base, n_chains], or the packed
        trace when ``packed``
    llks : f32[n_steps, n_chains]
    """
    R, NB, A, n_chains = log_reads_cl.shape
    P = ploidy
    assert n_chains % LANES == 0
    n_lane_tiles = n_chains // LANES
    if temps is None:
        temps = jnp.ones((1,), jnp.float32)
    temps = jnp.asarray(temps, jnp.float32)
    n_temps = temps.shape[0]
    if n_temps > 1:
        # tempered mode: the chunk axis IS the ladder — every lane tile
        # becomes one kernel instance carrying n_temps coupled replicas
        assert n_temps <= 8, "ladder larger than a vreg sublane tile"
        chunk = n_temps
        lr_bytes = NB * A * R * chunk * LANES * 4
        assert lr_bytes <= 5 * 1024 * 1024, "tempered lr exceeds VMEM budget"
        n_tiles = n_lane_tiles
    else:
        # chain groups ("chunks") per kernel instance: the largest of
        # 4/2/1 that divides the lane-tile count (latency amortisation,
        # see _make_full_kernel); VMEM budget: lr is NB*A*R*CHUNK*128*4
        # bytes, double-buffered.  chunk_override (static arg) pins it
        # for tuning experiments — measured on v5e: chunk=8 fails the
        # Mosaic compile at both NB=16 (8.4 MB lr) and NB=8 (4.2 MB),
        # so 4 is the widest packing this toolchain accepts.
        chunk = 1
        if chunk_override:
            chunk = int(chunk_override)
            assert n_lane_tiles % chunk == 0
        else:
            for c in (4, 2):
                lr_bytes = NB * A * R * c * LANES * 4
                if n_lane_tiles % c == 0 and lr_bytes <= 5 * 1024 * 1024:
                    chunk = c
                    break
        n_tiles = n_lane_tiles // chunk
    sc = n_tiles * chunk
    base = _next_pow2(max(A, 2))
    assert float(base) ** P <= 2.0 ** 24, "trace packing exceeds f32 ints"
    use_prior = alphas_cl is not None
    kern = _make_full_kernel(
        n_steps, P, NB, A, R, p_recomb, p_partial, p_full, base,
        refresh, stage, chunk, n_temps=n_temps, use_prior=use_prior,
    )

    def _pack(x, lead):
        """[..., n_chains] -> [lead..., sc, ..., LANES] chunk packing.

        Untempered: consecutive lane tiles group into chunk slots.
        Tempered: every lane tile is REPLICATED across the n_temps chunk
        slots (the ladder replicas share the problem data).
        """
        shape = x.shape[:-1]
        x = x.reshape(shape + (n_tiles, 1, LANES) if n_temps > 1
                      else shape + (n_tiles, chunk, LANES))
        if n_temps > 1:
            x = jnp.broadcast_to(
                x, shape + (n_tiles, chunk, LANES)
            )
        # move (n_tiles, chunk) in front of the per-chain payload dims
        nd = len(shape)
        perm = tuple(range(lead)) + (nd, nd + 1) + tuple(
            range(lead, nd)
        ) + (nd + 2,)
        x = jnp.transpose(x, perm)
        return x.reshape(
            x.shape[:lead] + (sc,) + x.shape[lead + 2:]
        )

    with jax.enable_x64(False):
        # kernel-side layout: [NB, sc, A, R, LANES] so every heavy
        # operand is a [CHUNK, R, LANES] block of fully-occupied
        # (8, 128) vregs; the one-time XLA transpose is negligible vs
        # n_steps of on-core sampling
        lr_nbar = jnp.transpose(
            jnp.asarray(log_reads_cl, jnp.float32), (1, 2, 0, 3)
        )  # [NB, A, R, C]
        lr_p = _pack(lr_nbar, 1)  # [NB, sc, A, R, LANES]
        counts_p = _pack(jnp.asarray(counts_cl, jnp.float32), 0)
        nall_p = _pack(jnp.asarray(nall_cl, jnp.int32), 0)
        pbreak_p = _pack(jnp.asarray(pbreak_cl, jnp.float32), 0)
        temps_p = jnp.broadcast_to(
            temps[None, :, None, None], (n_tiles, chunk, 1, LANES)
        ).reshape(sc, 1, LANES)
        if use_prior:
            alpha_p = _pack(
                jnp.asarray(alphas_cl, jnp.float32)[None, :], 1
            ).reshape(sc, 1, LANES)
        else:
            alpha_p = jnp.ones((sc, 1, LANES), jnp.float32)
        g0_p = _pack(jnp.asarray(g_init, jnp.float32), 1)  # [P, sc, NB, L]
        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, sc, NB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, sc, 1, LANES), jnp.float32),
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, NB, LANES), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chunk, 1, LANES), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chunk, 1, LANES), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chunk, 1, LANES), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (NB, chunk, A, R, LANES),
                lambda i, j: (0, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chunk, R, LANES), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (P, chunk, NB, LANES),
                lambda i, j: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_specs = (
            pl.BlockSpec(
                (1, chunk, NB, LANES), lambda i, j: (j, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk, 1, LANES), lambda i, j: (j, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        interp = pltpu.InterpretParams() if interpret else False
        gtrace, lltrace = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            grid=(n_tiles, n_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((P, chunk, NB, LANES), jnp.float32),
                pltpu.VMEM((P, chunk, R, LANES), jnp.float32),
                pltpu.VMEM((chunk, LANES), jnp.float32),
            ],
            interpret=interp,
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            nall_p,
            pbreak_p,
            temps_p,
            alpha_p,
            lr_p,
            counts_p,
            g0_p,
        )
        if n_temps > 1:
            # keep only the cold chain (slot n_temps-1) of each lane tile
            gtrace = gtrace.reshape(n_steps, n_tiles, chunk, NB, LANES)[
                :, :, n_temps - 1
            ]
            gtrace = jnp.transpose(gtrace, (0, 2, 1, 3)).reshape(
                n_steps, NB, n_chains
            )
            llks = lltrace.reshape(n_steps, n_tiles, chunk, LANES)[
                :, :, n_temps - 1
            ].reshape(n_steps, n_chains)
        else:
            # unpack chain axis: [steps, sc, NB, L] -> [steps, NB, n_chains]
            gtrace = jnp.transpose(
                gtrace.reshape(n_steps, n_tiles, chunk, NB, LANES),
                (0, 3, 1, 2, 4),
            ).reshape(n_steps, NB, n_chains)
            llks = lltrace.reshape(n_steps, n_chains)
        if packed:
            # packed values span [0, base**P - 1]
            pack_dtype = (
                jnp.uint8 if float(base) ** P <= 256 else jnp.int16
                if float(base) ** P <= 32768 else jnp.int32
            )
            return gtrace.astype(pack_dtype), llks
        # unpack base-coded alleles -> [n_steps, P, NB, n_chains] int8
        shifts = jnp.asarray(
            [base ** h for h in range(P)], jnp.int32
        )  # python ints stay i32 under enable_x64(False)
        alleles = (
            gtrace[:, None, :, :] // shifts[None, :, None, None]
        ) % jnp.int32(base)
    return alleles.astype(jnp.int8), llks
