"""Benchmark: aggregate MCMC sampler throughput on the current device.

Workload: the calling-model Gibbs sampler (the framework's hot path) in
float32 over a realistic bucket — tetraploid, 16-haplotype panel, 64
unique reads x 16 SNVs — batched over many independent locus x sample
problems x chains (the framework's data-parallel axis).

Prints ONE json line:
  {"metric": "gibbs_compound_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": R}
where the baseline is the same program on the host CPU backend (measured
in a subprocess), standing in for the reference's per-core numba
throughput class.  Higher is better; vs_baseline is the TPU speedup.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

B = 2048  # independent locus x sample problems
CHAINS = 2
PLOIDY = 4
N_READS = 64
N_POS = 16
N_HAPS = 16
STEPS = 500


def measure(b, steps, repeats=2):
    import jax
    import jax.numpy as jnp

    from mchap_tpu.ops.calling_mcmc import calling_sampler
    from mchap_tpu.parallel.mesh import make_problem_batch

    rng = np.random.default_rng(0)
    initial, read_hap, read_counts = make_problem_batch(
        rng, b, CHAINS, PLOIDY, N_READS, N_POS, N_HAPS, dtype=np.float32
    )

    @jax.jit
    def fn(keys, initial, rh, counts):
        g, llks = jax.vmap(
            lambda key, init, r, c: calling_sampler(key, init, r, c, n_steps=steps)
        )(keys, initial, rh, counts)
        # small on-device summary (the app's posterior pooling shape);
        # keeps the timing free of large host transfers
        pooled = jnp.sum(jax.nn.one_hot(g, N_HAPS, dtype=jnp.float32), axis=(0, 1, 2, 3))
        return pooled, jnp.mean(llks)

    keys = jax.random.split(jax.random.PRNGKey(0), b)
    # warmup/compile; np.asarray forces real completion (block_until_ready
    # does not reliably block through the remote-TPU tunnel)
    out = fn(keys, initial, read_hap, read_counts)
    _ = [np.asarray(o) for o in out]
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(keys, initial, read_hap, read_counts)
        _ = [np.asarray(o) for o in out]
        best = min(best, time.perf_counter() - t0)
    compound_steps = b * CHAINS * steps
    return compound_steps / best


def cpu_baseline_rate():
    """Same program on the host CPU backend, in a clean subprocess."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["MCHAP_BENCH_CPU_CHILD"] = "1"
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)["value"]
    except Exception:
        return None
    return None


def main():
    if os.environ.get("MCHAP_BENCH_CPU_CHILD"):
        # smaller batch on CPU; rate is per-step so comparable
        rate = measure(32, 100, repeats=1)
        print(json.dumps({"metric": "cpu", "value": rate}))
        return
    rate = measure(B, STEPS)
    cpu_rate = cpu_baseline_rate()
    vs = round(rate / cpu_rate, 2) if cpu_rate else None
    print(
        json.dumps(
            {
                "metric": "gibbs_compound_steps_per_s",
                "value": round(rate, 1),
                "unit": "steps/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
