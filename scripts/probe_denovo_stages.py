"""Bisect the pallas de novo mutation-sweep Mosaic crash by compiling
progressively larger prefixes of the site-update body.

Usage: python scripts/probe_denovo_stages.py <stage 1..6>
  1: allele llk scoring (logaddexp candidates)
  2: + haplotype-copy proposal correction
  3: + validity mask / acceptance probs
  4: + PRNG draw + CDF walk
  5: + state update (scratch writes, llk select)
  6: full kernel via pallas_mutation_sweep (real entry point)
"""

import sys

import numpy as np

STAGE = int(sys.argv[1])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128
P, NB, A, R = 4, 16, 4, 32


def _uniform_from_bits(bits):
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1e-12)


def make_kernel(stage):
    def kern(seed_ref, nall_ref, lr_ref, counts_ref, g_in_ref, llk_in_ref,
             temp_ref, llk_out_ref, g_s, rh_s):
        tile = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + tile)
        counts = counts_ref[:]
        log_p = jnp.log(jnp.float32(P))
        for h in range(P):
            g_s[h, :, :, :] = g_in_ref[h, :, :, :]
        for h in range(P):
            acc = jnp.zeros((R, LANES), jnp.float32)
            for j in range(NB):
                sel = jnp.sum(g_s[h, j, :, :][None] * lr_ref[:, j, :, :],
                              axis=1)
                acc = acc + sel
            rh_s[h, :, :] = acc
        temp = temp_ref[0]
        llk = llk_in_ref[0, :]
        h = 0

        def site_body(j, llk):
            cur_oh = g_s[h, j, :, :]
            lr_j = lr_ref[:, j, :, :]
            lr_cur = jnp.sum(cur_oh[None] * lr_j, axis=1)
            base = rh_s[h, :, :] - lr_cur
            others = [rh_s[i, :, :] for i in range(P) if i != h]
            m = others[0]
            for o in others[1:]:
                m = jnp.maximum(m, o)
            acc = jnp.zeros_like(m)
            for o in others:
                acc = acc + jnp.exp(o - m)
            rest = m + jnp.log(acc)
            cand = jnp.logaddexp(rest[:, None, :], base[:, None, :] + lr_j)
            llks = jnp.sum(counts[:, None, :] * (cand - log_p), axis=0)
            if stage == 1:
                return llk + jnp.sum(llks, axis=0) * 1e-6

            row_h = g_s[h, :, :, :]
            col = jnp.concatenate(
                [g_s[h2, j, :, :][None] for h2 in range(P)], axis=0)
            dots_list = []
            for h2 in range(P):
                dots_list.append(
                    jnp.sum(g_s[h2, :, :, :] * row_h, axis=(0, 1))[None])
            dots = jnp.concatenate(dots_list, axis=0)
            dots_j = jnp.sum(col * cur_oh[None], axis=1)
            keep2 = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) != h
            eq_except = ((dots - dots_j) >= jnp.float32(NB - 1)) & keep2
            counts_a = 1.0 + jnp.sum(
                jnp.where(eq_except[:, None, :], col, 0.0), axis=0)
            count_cur = jnp.sum(counts_a * cur_oh, axis=0)
            lproposal = jnp.log(counts_a) - jnp.log(count_cur)[None, :]
            if stage == 2:
                return llk + jnp.sum(lproposal, axis=0) * 1e-6

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
            if stage == 3:
                return llk + p_move * 1e-6

            u = _uniform_from_bits(
                pltpu.bitcast(pltpu.prng_random_bits((8, LANES)),
                              jnp.uint32))[0]
            acc2 = jnp.zeros(LANES, jnp.float32)
            chosen = jnp.zeros(LANES, jnp.int32)
            for a in range(A):
                acc2 = acc2 + probs[a]
                chosen = chosen + (acc2 <= u).astype(jnp.int32)
            moved = u < p_move
            if stage == 4:
                return llk + jnp.where(moved, 1e-6, 0.0) \
                    + chosen.astype(jnp.float32) * 1e-7

            choice_oh = (
                a_iota == jnp.minimum(chosen, A - 1)[None, :]
            ).astype(jnp.float32)
            new_oh = jnp.where(moved[None, :], choice_oh, cur_oh)
            lr_new = jnp.sum(new_oh[None] * lr_j, axis=1)
            if stage == 51:  # dynamic-j scratch write only
                g_s[h, j, :, :] = new_oh
                return llk + jnp.sum(new_oh, axis=0) * 1e-7
            if stage == 52:  # static scratch write only
                rh_s[h, :, :] = base + lr_new
                return llk + jnp.sum(lr_new, axis=0) * 1e-7
            if stage == 53:  # llk select only, no scratch writes
                llk_new = jnp.sum(llks * new_oh, axis=0)
                return jnp.where(moved, llk_new, llk)
            if stage == 54:  # llk select via arithmetic blend, no where
                llk_new = jnp.sum(llks * new_oh, axis=0)
                mf = moved.astype(jnp.float32)
                return mf * llk_new + (1.0 - mf) * llk
            if stage == 55:  # where but with fresh (non-carry) fallback
                llk_new = jnp.sum(llks * new_oh, axis=0)
                return llk + jnp.where(moved, llk_new - llk, 0.0)
            g_s[h, j, :, :] = new_oh
            rh_s[h, :, :] = base + lr_new
            llk_new = jnp.sum(llks * new_oh, axis=0)
            return llk + jnp.where(moved, llk_new - llk, 0.0)

        llk = jax.lax.fori_loop(jnp.int32(0), jnp.int32(NB), site_body, llk,
                                unroll=False)
        llk_out_ref[0, :] = llk

    return kern


def main():
    n_chains = LANES
    rng = np.random.default_rng(0)
    lr = np.log(rng.dirichlet(np.ones(A), size=(R, NB)).astype(np.float32))
    log_reads_cl = np.broadcast_to(lr[:, :, :, None],
                                   (R, NB, A, n_chains)).copy()
    counts_cl = np.ones((R, n_chains), np.float32)
    g = rng.integers(0, A, size=(P, NB)).astype(np.int32)
    g_onehot = np.zeros((P, NB, A, n_chains), np.float32)
    for h in range(P):
        for j in range(NB):
            g_onehot[h, j, g[h, j], :] = 1.0
    llk = np.zeros((1, n_chains), np.float32)
    nall = np.full((NB,), A, np.int32)

    if STAGE == 6:
        from mchap_tpu.ops.pallas_denovo import pallas_mutation_sweep
        g2, rh2, llk2 = pallas_mutation_sweep(
            jnp.int32(7), nall, jnp.asarray(log_reads_cl),
            jnp.asarray(counts_cl), jnp.asarray(g_onehot),
            jnp.asarray(llk[0]), jnp.float32(1.0))
        print("stage 6 OK", np.asarray(llk2)[:3], flush=True)
        return

    kern = make_kernel(STAGE)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, n_chains), jnp.float32),
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((R, NB, A, LANES), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, NB, A, LANES), lambda i: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((P, NB, A, LANES), jnp.float32),
                pltpu.VMEM((P, R, LANES), jnp.float32),
            ],
        )(
            jnp.asarray([7], jnp.int32),
            jnp.asarray(nall),
            jnp.asarray(log_reads_cl),
            jnp.asarray(counts_cl),
            jnp.asarray(g_onehot),
            jnp.asarray(llk),
            jnp.asarray([1.0], jnp.float32),
        )
    print(f"stage {STAGE} OK", np.asarray(out)[0, :3], flush=True)


if __name__ == "__main__":
    main()
