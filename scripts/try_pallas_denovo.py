"""Compile-and-run probe for the experimental pallas de novo mutation
sweep on the current backend.  Run under `timeout` — the known failure
mode is a Mosaic compiler stall/SIGABRT.

Usage: python scripts/try_pallas_denovo.py [n_chains]
"""

import sys
import time

import numpy as np


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    import jax
    import jax.numpy as jnp

    from mchap_tpu.ops.pallas_denovo import pallas_mutation_sweep

    print("backend:", jax.default_backend(), flush=True)

    P, NB, A, R = 4, 16, 4, 32
    rng = np.random.default_rng(0)
    lr = np.log(
        rng.dirichlet(np.ones(A), size=(R, NB)).astype(np.float32)
    )  # [R, NB, A]
    log_reads_cl = np.broadcast_to(
        lr[:, :, :, None], (R, NB, A, n_chains)
    ).copy()
    counts_cl = np.ones((R, n_chains), np.float32)
    g = rng.integers(0, A, size=(P, NB)).astype(np.int32)
    g_onehot = np.zeros((P, NB, A, n_chains), np.float32)
    for h in range(P):
        for j in range(NB):
            g_onehot[h, j, g[h, j], :] = 1.0
    # llk consistent with state
    rh = lr[np.arange(R)[:, None, None], np.arange(NB)[None, :, None],
            g.T[None, :, :]].sum(axis=1)  # [R, P]
    llk0 = (np.log(np.mean(np.exp(rh - rh.max(1, keepdims=True)), axis=1))
            + rh.max(1)).sum()
    llk = np.full((n_chains,), llk0, np.float32)
    n_alleles_arr = np.full((NB,), A, np.int32)

    t0 = time.time()
    g2, rh2, llk2 = pallas_mutation_sweep(
        jnp.int32(7), n_alleles_arr, jnp.asarray(log_reads_cl),
        jnp.asarray(counts_cl), jnp.asarray(g_onehot), jnp.asarray(llk),
        jnp.float32(1.0),
    )
    g2 = np.asarray(g2)
    llk2 = np.asarray(llk2)
    print(f"compiled+ran in {time.time()-t0:.1f}s", flush=True)
    print("llk sample:", llk2[:4], "finite:", np.isfinite(llk2).all())
    print("onehot rows sum to 1:",
          np.allclose(np.asarray(g2).sum(axis=2), 1.0))
    print("OK", flush=True)


if __name__ == "__main__":
    main()
