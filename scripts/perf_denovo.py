"""Measure pallas de novo kernel throughput by stage and chain count.

Usage: python scripts/perf_denovo.py [stages] [chain counts]
Runs on the default backend (TPU under axon).  Stage 1 = mutation sweep
only, 2 = + recombination sweep, 3 = full compound step.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mchap_tpu.ops.likelihood import prepare_reads
from mchap_tpu.ops.pallas_denovo import pallas_denovo_sampler

PLOIDY, N_READS, N_POS, N_ALLELE = 4, 64, 16, 2
STEPS = 100


def measure(n_chains, stage, steps=STEPS, repeats=2):
    rng = np.random.default_rng(0)
    truth = rng.integers(0, N_ALLELE, (PLOIDY, N_POS))
    srcs = truth[rng.integers(0, PLOIDY, N_READS)]
    reads = np.where(
        srcs[..., None] == np.arange(N_ALLELE), 0.99, 0.01
    ).astype(np.float32)
    log_reads = np.asarray(prepare_reads(reads, dtype=jnp.float32))
    lr = jnp.asarray(
        np.broadcast_to(
            log_reads[..., None], (N_READS, N_POS, N_ALLELE, n_chains)
        )
    )
    counts = jnp.ones((N_READS, n_chains), jnp.float32)
    init = jnp.zeros((PLOIDY, N_POS, n_chains), jnp.int32)
    nall = jnp.full((N_POS, n_chains), N_ALLELE, jnp.int32)
    pbreak = jnp.full((1, n_chains), 0.2, jnp.float32)

    def run(seed):
        g, llks = pallas_denovo_sampler(
            jnp.int32(seed), lr, counts, init, nall, pbreak,
            n_steps=steps, ploidy=PLOIDY, stage=stage,
        )
        return llks

    t0 = time.perf_counter()
    _ = np.asarray(run(1)[-1])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        _ = np.asarray(run(2 + i)[-1])
        best = min(best, time.perf_counter() - t0)
    rate = n_chains * steps / best
    print(
        f"stage={stage} chains={n_chains:6d} steps={steps}: "
        f"{best*1e3:8.1f} ms  {rate:12.3g} chain-steps/s "
        f"(compile {compile_s:.1f}s)",
        flush=True,
    )
    return rate


if __name__ == "__main__":
    stages = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1 else [1, 2, 3])]
    chains = [int(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2 else [128, 1024, 8192])]
    print(f"backend: {jax.default_backend()}")
    for stage in stages:
        for c in chains:
            measure(c, stage)
