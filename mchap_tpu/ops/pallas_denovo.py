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

Scope: flat (null) genotype prior and a single temperature — the
defaults.  Dirichlet-multinomial priors (--inbreeding) and parallel
tempering fall back to the XLA sampler (ops/assemble_mcmc.py).

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
                      p_recomb, p_partial, p_full, base, refresh, stage):
    """Kernel factory for the full de novo compound step.

    ``stage`` gates sub-steps for incremental compile probing:
    1 = mutation only, 2 = + recombination sweep, 3 = + dosage sweeps.
    """
    STEPS = n_steps
    P, NB, A, R = ploidy, n_base, n_alleles, n_reads
    # cap on interval-partition segments per structural sweep: the
    # Beta(1,3) break-count distribution puts ~87.5% of its mass below
    # NB/2 breaks, so capping the Bernoulli partition at NB//2 + 1
    # segments (extra breaks merge into the last segment) halves the
    # sequential interval-loop depth at negligible proposal distortion
    MAXSEG = max(2, min(NB, NB // 2 + 1))
    RECOMB_PAIRS = [(a, b) for a in range(P) for b in range(a + 1, P)]
    DOSAGE_PAIRS = [(a, b) for a in range(P) for b in range(P) if a != b]

    def kern(seed_ref, nall_ref, pbreak_ref, lr_ref, counts_ref, g0_ref,
             gtrace_ref, lltrace_ref, g_s, rh_s, llk_s):
        tile = pl.program_id(0)
        step = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + tile * jnp.int32(STEPS) + step)
        counts = counts_ref[:]  # [R, LANES]
        log_p = jnp.log(jnp.float32(P))

        def uniform(shape):
            return _uniform_from_bits(
                pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            )

        def uniform_lane():
            return uniform((8, LANES))[0]  # [LANES]

        def lse_llk(rows):
            """sum_r counts * (logsumexp_h rows[h] - log P) -> [LANES]."""
            m = rows[0]
            for o in rows[1:]:
                m = jnp.maximum(m, o)
            acc = jnp.zeros_like(m)
            for o in rows:
                acc = acc + jnp.exp(o - m)
            return jnp.sum(counts * (m + jnp.log(acc) - log_p), axis=0)

        @pl.when(step == 0)
        def _():
            for h in range(P):
                g_s[h, :, :, :] = g0_ref[h, :, :, :]

        # (re)build rh + llk from the genotype one-hots: at step 0 and
        # every ``refresh`` steps to bound incremental-update f32 drift
        @pl.when(jax.lax.rem(step, jnp.int32(refresh)) == 0)
        def _():
            lr = lr_ref[:]  # [R, NB, A, LANES]
            for h in range(P):
                rh_s[h, :, :] = jnp.sum(
                    g_s[h, :, :, :][None] * lr, axis=(1, 2)
                )
            llk_s[0, :] = lse_llk([rh_s[h, :, :] for h in range(P)])

        llk = llk_s[0, :]

        # ------------------------------------------------------------------
        # 1. mutation compound sweep (systematic h-major site order)
        # ------------------------------------------------------------------
        for h in range(P):
            # logsumexp over the OTHER haplotypes' rh rows is invariant
            # across haplotype h's whole site loop: hoist it
            if P > 1:
                others = [rh_s[i, :, :] for i in range(P) if i != h]
                m = others[0]
                for o in others[1:]:
                    m = jnp.maximum(m, o)
                acc = jnp.zeros_like(m)
                for o in others:
                    acc = acc + jnp.exp(o - m)
                rest = m + jnp.log(acc)  # [R, LANES]
            else:
                rest = jnp.full((R, LANES), -1e30, jnp.float32)

            def site_body(j, llk, h=h, rest=rest):
                cur_oh = g_s[h, j, :, :]  # [A, LANES]
                lr_j = lr_ref[:, j, :, :]  # [R, A, LANES]
                lr_cur = jnp.sum(cur_oh[None] * lr_j, axis=1)  # [R, LANES]
                b = rh_s[h, :, :] - lr_cur
                cand = jnp.logaddexp(rest[:, None, :], b[:, None, :] + lr_j)
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

                mh = (llks - llk[None, :]) + lproposal
                a_iota = jax.lax.broadcasted_iota(jnp.int32, (A, LANES), 0)
                nall_j = nall_ref[j, :]  # [LANES] per-lane allele count
                # nall == 1 -> homozygote-fixed position: provably no-op
                valid = (
                    (a_iota < nall_j[None, :])
                    & (cur_oh < 0.5)
                    & (nall_j[None, :] > 1)
                )
                n_opt = jnp.sum(valid.astype(jnp.float32), axis=0)
                log_accept = jnp.where(
                    valid, jnp.minimum(0.0, mh), jnp.float32(-1e30)
                ) - jnp.log(jnp.maximum(n_opt, 1.0))[None, :]
                probs = jnp.where(valid, jnp.exp(log_accept), 0.0)
                p_move = jnp.sum(probs, axis=0)
                u = uniform_lane()
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
                rh_s[h, :, :] = b + lr_new
                llk_new = jnp.sum(llks * new_oh, axis=0)
                return llk + jnp.where(moved, llk_new - llk, 0.0)

            llk = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(NB), site_body, llk, unroll=False
            )

        # ------------------------------------------------------------------
        # structural machinery (shared by both sweep kinds)
        # ------------------------------------------------------------------

        def draw_seg_id():
            """Per-lane segment ids from Bernoulli breakpoints: [NB, LANES]."""
            ub = uniform((NB, LANES))
            pb = pbreak_ref[0, :]  # [LANES]
            brk = (ub < pb[None, :]).astype(jnp.float32)
            rows = []
            acc = jnp.zeros(LANES, jnp.float32)
            rows.append(acc[None])
            for j in range(1, NB):
                acc = jnp.minimum(acc + brk[j], jnp.float32(MAXSEG - 1))
                rows.append(acc[None])
            return jnp.concatenate(rows, axis=0)  # [NB, LANES] f32

        def count_kind_options(lab_in, lab_out, kind):
            """# of valid options of ``kind`` given label vectors.

            lab_in/lab_out: python lists of P [LANES] f32 label values.
            Mirrors recombination_n_options / dosage_n_options.
            """
            eq_in = [[(lab_in[i] == lab_in[j]) for j in range(P)]
                     for i in range(P)]
            eq_full = [[eq_in[i][j] & (lab_out[i] == lab_out[j])
                        for j in range(P)] for i in range(P)]
            first_full = []
            first_in = []
            count_in = []
            for hh in range(P):
                ff = jnp.ones(LANES, jnp.float32)
                fi = jnp.ones(LANES, jnp.float32)
                for hp in range(hh):
                    ff = ff * (1.0 - eq_full[hp][hh].astype(jnp.float32))
                    fi = fi * (1.0 - eq_in[hp][hh].astype(jnp.float32))
                first_full.append(ff > 0.5)
                first_in.append(fi > 0.5)
                ci = jnp.zeros(LANES, jnp.float32)
                for hp in range(P):
                    ci = ci + eq_in[hp][hh].astype(jnp.float32)
                count_in.append(ci)
            n = jnp.zeros(LANES, jnp.float32)
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

        def interval_update(mask, gate, llk, kind):
            """One structural MH step on the interval ``mask`` [NB, LANES].

            kind 0 = recombination (segment exchange between pairs),
            kind 1 = dosage (receiver segment overwritten by donor).
            ``gate`` [LANES] f32 0/1 disables acceptance for ungated lanes
            (the reference's per-chain sub-step coin flip).
            """
            m3 = mask[:, None, :]  # [NB, 1, LANES]
            len_in = jnp.sum(mask, axis=0)  # [LANES]
            lr = lr_ref[:]  # [R, NB, A, LANES]

            # per-haplotype interval partial sums of rh
            rh_int = []
            for h in range(P):
                gm = g_s[h, :, :, :] * m3  # [NB, A, LANES]
                rh_int.append(jnp.sum(gm[None] * lr, axis=(1, 2)))

            # pairwise one-hot dot products: inside / everywhere
            dots_in = [[None] * P for _ in range(P)]
            dots_full = [[None] * P for _ in range(P)]
            for i in range(P):
                for j in range(i, P):
                    prod = g_s[i, :, :, :] * g_s[j, :, :, :]
                    d_all = jnp.sum(prod, axis=(0, 1))
                    d_in = jnp.sum(prod * m3, axis=(0, 1))
                    dots_in[i][j] = dots_in[j][i] = d_in
                    dots_full[i][j] = dots_full[j][i] = d_all
            eq_in = [[dots_in[i][j] >= len_in - 0.5 for j in range(P)]
                     for i in range(P)]
            eq_out = [[(dots_full[i][j] - dots_in[i][j])
                       >= (jnp.float32(NB) - len_in) - 0.5
                       for j in range(P)] for i in range(P)]

            # first-occurrence labels (values = index of first equal row)
            def labels_of(eq):
                labs = []
                for hh in range(P):
                    found = jnp.zeros(LANES, jnp.float32)
                    lab = jnp.zeros(LANES, jnp.float32)
                    for hp in range(hh + 1):
                        e = eq[hp][hh].astype(jnp.float32)
                        take = e * (1.0 - found)
                        lab = lab + jnp.float32(hp) * take
                        found = jnp.maximum(found, e)
                    labs.append(lab)
                return labs

            lab_in = labels_of(eq_in)
            lab_out = labels_of(eq_out)

            # dosage bookkeeping for validity clauses
            eq_fullrow = [[eq_in[i][j] & eq_out[i][j] for j in range(P)]
                          for i in range(P)]
            first_full = []
            first_in = []
            count_in = []
            for hh in range(P):
                ff = jnp.ones(LANES, jnp.float32)
                fi = jnp.ones(LANES, jnp.float32)
                ci = jnp.zeros(LANES, jnp.float32)
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

            # shared logsumexp "rest" terms (lse of rows not in the pair)
            rows0 = [rh_s[h, :, :] for h in range(P)]

            def lse_of(rs):
                if not rs:
                    return jnp.full((R, LANES), -1e30, jnp.float32)
                m = rs[0]
                for o in rs[1:]:
                    m = jnp.maximum(m, o)
                acc = jnp.zeros_like(m)
                for o in rs:
                    acc = acc + jnp.exp(o - m)
                return m + jnp.log(acc)

            if kind == 0:
                rest = {
                    (a, b2): lse_of(
                        [rows0[h] for h in range(P) if h != a and h != b2]
                    )
                    for (a, b2) in pairs
                }
            else:
                rest = {
                    a: lse_of([rows0[h] for h in range(P) if h != a])
                    for a in set(a for (a, _) in pairs)
                }

            valid = []
            llk_opts = []
            n_return = []
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
                    row_a = rows0[a] - rh_int[a] + rh_int[b2]
                    cand = jnp.logaddexp(row_a, rest[a])
                    li = list(lab_in)
                    li[a] = lab_in[b2]
                valid.append(v)
                llk_opts.append(jnp.sum(counts * (cand - log_p), axis=0))
                n_return.append(count_kind_options(li, lab_out, kind))

            n_options = jnp.zeros(LANES, jnp.float32)
            for v in valid:
                n_options = n_options + v.astype(jnp.float32)

            probs = []
            p_move = jnp.zeros(LANES, jnp.float32)
            for k in range(K):
                lp = jnp.log(jnp.maximum(n_options, 1.0)) - jnp.log(
                    jnp.maximum(n_return[k], 1.0)
                )
                mh = (llk_opts[k] - llk) + lp
                pk = jnp.where(
                    valid[k] & (gate > 0.5),
                    jnp.exp(jnp.minimum(0.0, mh))
                    / jnp.maximum(n_options, 1.0),
                    0.0,
                )
                probs.append(pk)
                p_move = p_move + pk

            u = uniform_lane()
            acc2 = jnp.zeros(LANES, jnp.float32)
            chosen = jnp.zeros(LANES, jnp.int32)
            for k in range(K):
                acc2 = acc2 + probs[k]
                chosen = chosen + (acc2 <= u).astype(jnp.int32)
            moved = (u < p_move).astype(jnp.float32)
            ch = []  # chosen-option indicator per option, [LANES] f32
            for k in range(K):
                ch.append(
                    moved
                    * (jnp.minimum(chosen, K - 1) == k).astype(jnp.float32)
                )

            # source-row weights: srcw[h][h'] = P(new row h copies row h')
            srcw = [[None] * P for _ in range(P)]
            for h in range(P):
                for hp in range(P):
                    w = jnp.where(h == hp, 1.0 - moved, 0.0)
                    w = jnp.broadcast_to(w, (LANES,)) if w.ndim == 0 else w
                    for k, (a, b2) in enumerate(pairs):
                        if kind == 0:
                            src = b2 if h == a else (a if h == b2 else h)
                        else:
                            src = b2 if h == a else h
                        if src == hp:
                            w = w + ch[k]
                    srcw[h][hp] = w

            # apply: masked whole-row writes driven by srcw
            new_g = []
            new_rh = []
            for h in range(P):
                gsum = jnp.zeros((NB, A, LANES), jnp.float32)
                rsum = jnp.zeros((R, LANES), jnp.float32)
                for hp in range(P):
                    gsum = gsum + srcw[h][hp][None, None, :] * g_s[hp, :, :, :]
                    rsum = rsum + srcw[h][hp][None, :] * rh_int[hp]
                new_g.append(gsum)
                new_rh.append(rsum)
            for h in range(P):
                g_s[h, :, :, :] = (
                    m3 * new_g[h] + (1.0 - m3) * g_s[h, :, :, :]
                )
                rh_s[h, :, :] = rh_s[h, :, :] - rh_int[h] + new_rh[h]

            dllk = jnp.zeros(LANES, jnp.float32)
            for k in range(K):
                dllk = dllk + ch[k] * (llk_opts[k] - llk)
            return llk + dllk

        # ------------------------------------------------------------------
        # 2. recombination sweep  3. partial dosage sweep  4. full dosage
        # ------------------------------------------------------------------
        if stage >= 2 and P > 1:
            gate_r = (uniform_lane() <= jnp.float32(p_recomb)).astype(
                jnp.float32
            )
            seg_r = draw_seg_id()

            def recomb_body(i, llk):
                mask = (seg_r == i.astype(jnp.float32)).astype(jnp.float32)
                return interval_update(mask, gate_r, llk, 0)

            llk = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(MAXSEG), recomb_body, llk, unroll=False
            )

        if stage >= 3 and P > 1:
            gate_d = (uniform_lane() <= jnp.float32(p_partial)).astype(
                jnp.float32
            )
            seg_d = draw_seg_id()

            def dosage_body(i, llk):
                mask = (seg_d == i.astype(jnp.float32)).astype(jnp.float32)
                return interval_update(mask, gate_d, llk, 1)

            llk = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(MAXSEG), dosage_body, llk, unroll=False
            )

            gate_f = (uniform_lane() <= jnp.float32(p_full)).astype(
                jnp.float32
            )
            llk = interval_update(
                jnp.ones((NB, LANES), jnp.float32), gate_f, llk, 1
            )

        # ------------------------------------------------------------------
        # trace write: base-packed genotype + llk
        # ------------------------------------------------------------------
        llk_s[0, :] = llk
        a_iof = jax.lax.broadcasted_iota(jnp.int32, (NB, A, LANES), 1).astype(
            jnp.float32
        )
        packed = jnp.zeros((NB, LANES), jnp.float32)
        for h in range(P):
            alle = jnp.sum(g_s[h, :, :, :] * a_iof, axis=1)  # [NB, LANES]
            packed = packed + alle * jnp.float32(base ** h)
        gtrace_ref[0, :, :] = packed.astype(jnp.int32)
        lltrace_ref[0, 0, :] = llk

    return kern


def _next_pow2(x):
    n = 1
    while n < x:
        n *= 2
    return n


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_steps", "ploidy", "p_recomb", "p_partial", "p_full",
        "refresh", "stage", "interpret",
    ),
)
def pallas_denovo_sampler(
    seed,
    log_reads_cl,
    counts_cl,
    g_init,
    nall_cl,
    pbreak_cl,
    *,
    n_steps,
    ploidy,
    p_recomb=0.5,
    p_partial=0.5,
    p_full=1.0,
    refresh=64,
    stage=3,
    interpret=False,
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
    n_steps, ploidy : static
    p_recomb, p_partial, p_full : static sub-step gate probabilities
        (reference mcmc.py:381-393)
    refresh : static; rebuild rh/llk from the genotype every this many
        steps (f32 drift bound)
    stage : static sub-step gate for compile probing (3 = full sampler)

    Returns
    -------
    genotypes : int8[n_steps, ploidy, n_base, n_chains]
    llks : f32[n_steps, n_chains]
    """
    R, NB, A, n_chains = log_reads_cl.shape
    P = ploidy
    assert n_chains % LANES == 0
    n_tiles = n_chains // LANES
    base = _next_pow2(max(A, 2))
    assert float(base) ** P <= 2.0 ** 24, "trace packing exceeds f32 ints"
    kern = _make_full_kernel(
        n_steps, P, NB, A, R, p_recomb, p_partial, p_full, base,
        refresh, stage,
    )
    with jax.enable_x64(False):
        g0 = (
            g_init[:, :, None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, A, 1), 2)
        ).astype(jnp.float32)  # [P, NB, A, C]
        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, NB, n_chains), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, 1, n_chains), jnp.float32),
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (NB, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (R, NB, A, LANES),
                lambda i, j: (0, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (R, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (P, NB, A, LANES),
                lambda i, j: (0, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_specs = (
            pl.BlockSpec(
                (1, NB, LANES), lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, LANES), lambda i, j: (j, 0, i),
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
                pltpu.VMEM((P, NB, A, LANES), jnp.float32),
                pltpu.VMEM((P, R, LANES), jnp.float32),
                pltpu.VMEM((1, LANES), jnp.float32),
            ],
            interpret=interp,
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(nall_cl, jnp.int32),
            jnp.asarray(pbreak_cl, jnp.float32),
            jnp.asarray(log_reads_cl, jnp.float32),
            jnp.asarray(counts_cl, jnp.float32),
            g0,
        )
        # unpack base-coded alleles -> [n_steps, P, NB, n_chains] int8
        shifts = jnp.asarray(
            [base ** h for h in range(P)], jnp.int32
        )  # python ints stay i32 under enable_x64(False)
        alleles = (
            gtrace[:, None, :, :] // shifts[None, :, None, None]
        ) % jnp.int32(base)
    return alleles.astype(jnp.int8), lltrace[:, 0, :]
