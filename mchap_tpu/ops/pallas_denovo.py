"""EXPERIMENTAL: de novo mutation compound-sweep as a pallas kernel.

Status: lowers correctly (all value-op constraints addressed) but the
remote Mosaic compiler SIGABRTs/stalls on the composed kernel on this
toolchain; not yet wired into the sampler.  The design below is the
round-2 path to a ~30x de novo speedup (same recipe that delivered the
calling kernel in ops/pallas_calling.py).

The mutation sweep (reference assemble/mutation.py:164-246) dominates the
de novo assembler's per-step cost: ploidy x n_base sequential site
updates, each scoring all alleles of one (haplotype, position) site.
The XLA formulation reaches ~2.5e4 compound steps/s on a v5e chip
(tiny inner shapes, HBM round-trips per scan iteration); this kernel
keeps the whole sweep on-core:

- chain batch on the 128-wide lane axis (one tile of 128 chains per grid
  row);
- genotype state as one-hot occupancies [p, nb, A, 128] in VMEM scratch
  (one-hot avoids per-lane integer gathers entirely);
- per-read per-haplotype log-probs rh[p, R, 128] maintained
  incrementally (rank-1 per accepted mutation);
- the site loop is a lax.fori_loop with dynamic scratch-ref indexing, so
  the compiled kernel size is independent of ploidy x n_base (the
  unrolled form stalls the Mosaic compiler);
- MH acceptance with the haplotype-copy proposal correction computed
  from one-hot dot products; draws via on-core PRNG inverse-CDF.

Structural (recombination/dosage) moves stay in the XLA sampler; the
hybrid interleaves one kernel call per step with the XLA sub-steps.
See ops/pallas_calling.py's docstring for the Mosaic constraints
honoured here.
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
