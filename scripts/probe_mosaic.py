"""Bisect Mosaic layout crash: run one tiny probe kernel per variant.

Usage: python scripts/probe_mosaic.py <variant>
Variants:
  a1  fori_loop with 1-D [LANES] carry, trivial body
  a2  fori_loop with 2-D [1, LANES] carry, trivial body
  b1  fori_loop, dynamic second-axis ref read g_s[h, j, :, :]
  b2  fori_loop, dynamic read via leading-axis subref g_s[h][j]
  c1  1-D slice u = bits2d[0] used in compare against 1-D
  c2  dynamic SMEM scalar read nall_ref[j]
"""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NB = 8
A = 8
P = 4


def run(variant):
    def kern(x_ref, o_ref, g_s):
        g_s[:, :, :, :] = x_ref[:]

        if variant == "a1":
            def body(j, llk):
                return llk + jnp.sum(g_s[0, 0, :, :], axis=0)
            llk = jax.lax.fori_loop(jnp.int32(0), jnp.int32(NB), body,
                                    jnp.zeros(LANES, jnp.float32))
            o_ref[0, :] = llk
        elif variant == "a2":
            def body(j, llk):
                return llk + jnp.sum(g_s[0, 0, :, :], axis=0)[None]
            llk = jax.lax.fori_loop(jnp.int32(0), jnp.int32(NB), body,
                                    jnp.zeros((1, LANES), jnp.float32))
            o_ref[0, :] = llk[0]
        elif variant == "b1":
            def body(j, llk):
                return llk + jnp.sum(g_s[0, j, :, :], axis=0)[None]
            llk = jax.lax.fori_loop(jnp.int32(0), jnp.int32(NB), body,
                                    jnp.zeros((1, LANES), jnp.float32))
            o_ref[0, :] = llk[0]
        elif variant == "b2":
            def body(j, llk):
                sub = g_s.at[0]
                return llk + jnp.sum(sub[j, :, :], axis=0)[None]
            llk = jax.lax.fori_loop(jnp.int32(0), jnp.int32(NB), body,
                                    jnp.zeros((1, LANES), jnp.float32))
            o_ref[0, :] = llk[0]
        elif variant == "c1":
            pltpu.prng_seed(jnp.int32(7))
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((8, LANES)), jnp.uint32)
            f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000),
                              jnp.float32)
            u = jnp.maximum(f - 1.0, 1e-12)[0]
            acc = jnp.sum(g_s[0, 0, :, :], axis=0)
            o_ref[0, :] = jnp.where(u < 0.5, acc, -acc)
        elif variant == "c2":
            def body(j, llk):
                return llk + jnp.sum(g_s[0, 0, :, :], axis=0)[None]
            llk = jax.lax.fori_loop(jnp.int32(0), jnp.int32(NB), body,
                                    jnp.zeros((1, LANES), jnp.float32))
            o_ref[0, :] = llk[0]
        else:
            raise SystemExit(f"unknown variant {variant}")

    import numpy as np
    x = np.random.default_rng(0).random((P, NB, A, LANES)).astype(np.float32)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            grid=(1,),
            in_specs=[pl.BlockSpec((P, NB, A, LANES), lambda i: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((P, NB, A, LANES), jnp.float32)],
        )(jnp.asarray(x))
    print(variant, "OK", np.asarray(out)[0, :3], flush=True)


if __name__ == "__main__":
    run(sys.argv[1])
