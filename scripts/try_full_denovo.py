"""Compile-and-run probe for the full-step pallas de novo sampler.

Usage: python scripts/try_full_denovo.py <stage> [n_steps] [n_chains] [NB] [R]
"""

import sys
import time

import numpy as np


def main():
    stage = int(sys.argv[1])
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_chains = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    NB = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    R = int(sys.argv[5]) if len(sys.argv) > 5 else 16

    import jax
    import jax.numpy as jnp

    from mchap_tpu.ops.pallas_denovo import pallas_denovo_sampler

    print("backend:", jax.default_backend(), flush=True)
    P, A = 4, 4
    rng = np.random.default_rng(0)
    lr = np.log(rng.dirichlet(np.ones(A), size=(R, NB)).astype(np.float32))
    lrc = np.broadcast_to(lr[:, :, :, None], (R, NB, A, n_chains)).copy()
    cnt = np.ones((R, n_chains), np.float32)
    g = rng.integers(0, A, size=(P, NB, 1)).astype(np.int32)
    gi = np.broadcast_to(g, (P, NB, n_chains)).copy()
    nall = np.full((NB, n_chains), A, np.int32)
    pb = np.full((1, n_chains), 0.25, np.float32)

    t0 = time.time()
    gt, llks = pallas_denovo_sampler(
        jnp.int32(3), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb), n_steps=n_steps, ploidy=P,
        stage=stage,
    )
    gt = np.asarray(gt)
    llks = np.asarray(llks)
    t1 = time.time()
    print(f"stage {stage}: compiled+ran in {t1-t0:.1f}s", flush=True)

    # timing run (amortize compile)
    t0 = time.time()
    gt, llks = pallas_denovo_sampler(
        jnp.int32(4), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb), n_steps=n_steps, ploidy=P,
        stage=stage,
    )
    gt = np.asarray(gt)
    dt = time.time() - t0
    print(f"steady: {dt:.3f}s -> {n_steps*n_chains/dt:.3e} chain-steps/s",
          flush=True)
    assert (gt >= 0).all() and (gt < A).all()
    assert np.isfinite(llks).all()
    # bookkeeping invariant on a few lanes
    import numpy as _np
    for lane in (0, n_chains // 2, n_chains - 1):
        gl = gt[-1, :, :, lane]
        rh = lr[_np.arange(R)[:, None, None], _np.arange(NB)[None, :, None],
                gl.T[None, :, :]].sum(1)
        llkn = float((_np.log(_np.exp(rh - rh.max(1, keepdims=True)).mean(1))
                      + rh.max(1)).sum())
        assert abs(llks[-1, lane] - llkn) < 0.05, (lane, llks[-1, lane], llkn)
    print("invariants OK", flush=True)


if __name__ == "__main__":
    main()
