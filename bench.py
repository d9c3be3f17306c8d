"""Benchmark: aggregate MCMC sampler throughput vs an honest baseline.

Workloads (matching shapes in ``mchap_tpu/native/bench_oracle.cpp``):

* **de novo assembly** (the flagship sampler): full compound step
  (mutation sweep + recombination/dosage interval sweeps + full dosage
  step) at ploidy 4, 16 SNVs, 64 unique reads, biallelic — the
  VMEM-resident full-step pallas kernel with chains on the 128-wide
  lane axis (ops/pallas_denovo.py).
* **calling** Gibbs over a 16-haplotype panel, same reads bucket
  (ops/pallas_calling.py).
* **pedigree** joint Gibbs over a 22-sample bi-parental pedigree
  (ops/pedigree_mcmc.py), batched over loci.

Baseline: the reference's own inner loops (mutation/structural sweeps
with the arraymap llk cache, cached Gibbs slot scoring —
mchap/assemble/mcmc.py:268-426, mchap/calling/mcmc.py:232-327,
mchap/pedigree/mcmc.py:658-814) re-implemented in single-thread C++
-O3 (the same performance class as the reference's numba-compiled
output; numba is unavailable in this image) and scaled to the 64-core
deployment named in BASELINE.md.  This makes ``vs_baseline`` a true
cross-implementation ratio, not a same-program backend ratio.  Note
the C++ oracle *includes* the reference's likelihood caches (hit
rates are printed), which the reference enables by default at these
shapes.

Also reports a VPU roofline estimate: these samplers are elementwise/
gather bound (no matmuls at sampling time), so the relevant peak is the
VPU vector unit (~3.7e12 f32 FLOP/s on v5e: 8 sublanes x 128 lanes x
4 ALUs x ~940 MHz), not the MXU.  FLOP counts per compound step are
analytic estimates documented inline.

Architecture (un-hangable by construction): the parent process NEVER
touches the TPU (the single-client axon grant means a hung TPU call
blocks everything).  Each device workload runs in its own subprocess
(``python bench.py --workload NAME``) under a hard timeout; a hang or
crash in one workload loses that number only.  Results stream to
stderr as they land and to ``.build/bench_partial.json``; the final
JSON line always prints.  ``MCHAP_BENCH_PEDIGREE=0`` skips the
pedigree workload; ``MCHAP_BENCH_BUDGET`` (seconds, default 1500)
bounds total wall-clock — remaining workloads are skipped, never cut
mid-flight, when the budget runs out.

Prints ONE json line with the flagship metric; secondary metrics ride
in "extra".
"""

import json
import os
import subprocess
import sys
import time

PLOIDY = 4
N_READS = 64
N_POS = 16
N_ALLELE = 2
N_HAPS = 16

CALLING_STEPS = 500
DENOVO_STEPS = 200
CALLING_LANES = 65536
DENOVO_LANES = 16384
# pedigree bench runs at a production-scale locus batch: loci are the
# tool's data-parallel axis (the reference forks one process per locus
# block; its 64-core baseline is exactly 64 loci in flight), and the
# TPU's win on this sampler is wide-batch throughput, not single-locus
# latency.  128 loci fill one 128-lane tile of the VMEM-resident
# pallas kernel (ops/pallas_pedigree.py).
PEDIGREE_LOCI = int(os.environ.get("MCHAP_BENCH_PEDIGREE_LOCI", "128"))
PEDIGREE_STEPS = int(os.environ.get("MCHAP_BENCH_PEDIGREE_STEPS", "500"))

V5E_VPU_FLOPS = 3.7e12  # f32 vector peak, v5e (8 sublanes*128 lanes*4*940MHz)

# Analytic FLOPs per compound chain-step (order-of-magnitude, used for
# the roofline estimate only):
# denovo: mutation sweep = P*NB sites x ~R*(P + 2A + 6) flops (rest
# logsumexp over ploidy, candidate dot with counts) ~= 64 * 900 ~= 58k;
# structural sweeps ~= (NB/4 + 1 intervals) x K options x ~R*P ~= 20k;
# total ~= 8e4.
DENOVO_FLOPS_PER_STEP = 8.0e4
# calling: P slots x H candidates x ~(R adds + R exps for the hap mean)
# ~= 4 * 16 * 3*64 ~= 1.2e4.
CALLING_FLOPS_PER_STEP = 1.2e4


def _force(x):
    """Force completion; block_until_ready does not block through the
    remote-TPU tunnel, np.asarray on a small output does."""
    import numpy as np

    return np.asarray(x)


# ---------------------------------------------------------------------------
# workloads (run inside per-workload child processes)
# ---------------------------------------------------------------------------


def measure_pallas_calling(n_chains, steps, repeats=2):
    """VMEM-resident pallas calling kernel (TPU only)."""
    import jax.numpy as jnp
    import numpy as np

    from mchap_tpu.ops.pallas_calling import pallas_calling_sampler

    rng = np.random.default_rng(0)
    rh = jnp.asarray(rng.normal(size=(N_READS, N_HAPS, n_chains)), jnp.float32)
    counts = jnp.ones((N_READS, n_chains), jnp.float32)
    out = pallas_calling_sampler(
        jnp.int32(1), rh, counts, n_steps=steps, ploidy=PLOIDY
    )
    _force(out[1][-1])
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        out = pallas_calling_sampler(
            jnp.int32(2 + i), rh, counts, n_steps=steps, ploidy=PLOIDY
        )
        _force(out[1][-1])
        best = min(best, time.perf_counter() - t0)
    return n_chains * steps / best


def measure_pallas_denovo(n_chains, steps, repeats=2):
    """VMEM-resident full-step pallas de novo kernel (TPU only)."""
    import jax.numpy as jnp
    import numpy as np

    from mchap_tpu.ops.likelihood import prepare_reads
    from mchap_tpu.ops.pallas_denovo import pallas_denovo_sampler

    rng = np.random.default_rng(0)
    # biallelic reads from a random truth (shared across chains: the
    # bench measures sampler throughput, not read diversity)
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
            n_steps=steps, ploidy=PLOIDY,
        )
        return llks

    _force(run(1)[-1])
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        _force(run(2 + i)[-1])
        best = min(best, time.perf_counter() - t0)
    return n_chains * steps / best


def measure_pedigree(n_loci, steps, repeats=3):
    """Joint pedigree sampler over a bi-parental pedigree (22 samples:
    2 parents + 20 progeny, the realistic example's structure), batched
    over ``n_loci`` loci on the 128-wide lane axis of the VMEM-resident
    pallas kernel (ops/pallas_pedigree.py).  Returns compound steps/s
    where one compound step = a full Gibbs sweep over every sample's
    allele slots plus the parental-pair swap (reference
    pedigree/mcmc.py:658-814 semantics).

    Like the denovo/calling workloads, the problem batch is uploaded
    ONCE and the sampler program itself is timed — matching the C++
    oracle, which times the reference's inner loops.  (The fit-path
    wall including IO/transfers is the e2e workload's job.)
    """
    import jax.numpy as jnp
    import numpy as np

    from mchap_tpu.ops.likelihood import read_hap_loglik_np
    from mchap_tpu.ops.pallas_pedigree import make_plan, pallas_pedigree_sampler

    rng = np.random.default_rng(0)
    n_samples = 22
    sample_parents = np.full((n_samples, 2), -1, int)
    sample_parents[2:] = [0, 1]  # progeny of the two founders
    plan = make_plan(
        np.full(n_samples, PLOIDY),
        sample_parents,
        np.full((n_samples, 2), PLOIDY // 2),
        np.zeros((n_samples, 2)),
        np.full((n_samples, 2), 0.1),
        swap_parental_alleles=True,
    )

    haplotypes = np.zeros((N_HAPS, N_POS), np.int8)
    haplotypes[1:] = rng.integers(0, N_ALLELE, (N_HAPS - 1, N_POS))
    lanes = ((n_loci + 127) // 128) * 128
    rh_l = np.zeros((n_samples, N_READS, N_HAPS, lanes), np.float32)
    for i in range(n_loci):
        truth = haplotypes[rng.integers(0, N_HAPS, (n_samples, PLOIDY))]
        srcs = np.take_along_axis(
            truth,
            rng.integers(0, PLOIDY, (n_samples, N_READS))[..., None],
            axis=1,
        )
        reads = np.where(srcs[..., None] == np.arange(N_ALLELE), 0.99, 0.01)
        rh_l[..., i] = read_hap_loglik_np(reads, haplotypes)
    rh_l[..., n_loci:] = rh_l[..., n_loci - 1 : n_loci]
    rh_l = jnp.asarray(rh_l)
    counts_l = jnp.ones((n_samples, N_READS, lanes), jnp.float32)
    freqs_l = jnp.full((N_HAPS, lanes), 1.0 / N_HAPS, jnp.float32)
    nv_l = jnp.full((lanes,), N_HAPS, jnp.int32)
    init_l = jnp.zeros((n_samples, PLOIDY, lanes), jnp.int32)

    def run(seed):
        tr = pallas_pedigree_sampler(
            jnp.int32(seed), rh_l, counts_l, freqs_l, nv_l, init_l,
            plan=plan, n_steps=steps,
        )
        return _force(tr[-1, 0, 0, :4])

    run(0)  # compile
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        run(1 + i)
        best = min(best, time.perf_counter() - t0)
    return n_loci * steps / best


def measure_xla_calling(b, steps, repeats=2):
    """XLA formulation (fallback when pallas is unavailable)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mchap_tpu.ops.calling_mcmc import calling_sampler
    from mchap_tpu.parallel.mesh import make_problem_batch

    rng = np.random.default_rng(0)
    initial, read_hap, read_counts = make_problem_batch(
        rng, b, 2, PLOIDY, N_READS, N_POS, N_HAPS, dtype=np.float32
    )

    @jax.jit
    def fn(keys, initial, rh, counts):
        g, llks = jax.vmap(
            lambda key, init, r, c: calling_sampler(key, init, r, c, n_steps=steps)
        )(keys, initial, rh, counts)
        pooled = jnp.sum(
            jax.nn.one_hot(g, N_HAPS, dtype=jnp.float32), axis=(0, 1, 2, 3)
        )
        return pooled, jnp.mean(llks)

    keys = jax.random.split(jax.random.PRNGKey(0), b)
    out = fn(keys, initial, read_hap, read_counts)
    _ = [_force(o) for o in out]
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(keys, initial, read_hap, read_counts)
        _ = [_force(o) for o in out]
        best = min(best, time.perf_counter() - t0)
    return b * 2 * steps / best


def measure_e2e():
    """Full ``mchap assemble`` pipeline over the realistic 22-sample
    bi-parental example (20 loci, 866 SNVs, 1000 steps x 2 chains):
    loci/s including IO/encode/VCF (BASELINE config, scripts/bench_e2e).
    Writes the output VCF for the call-pedigree e2e workload."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import bench_e2e

    here = os.path.dirname(os.path.abspath(__file__))
    out_vcf = os.path.join(here, ".build", "e2e_assemble.vcf")
    os.makedirs(os.path.dirname(out_vcf), exist_ok=True)
    dt, n_loci = bench_e2e.run_assemble(1000, 500, out_vcf=out_vcf)
    return n_loci / dt


def measure_pedigree_e2e():
    """Full ``mchap call-pedigree`` pipeline over the same example
    (22-sample bi-parental pedigree, 20 loci) against the assemble
    workload's haplotype calls: loci/s end-to-end (BASELINE config #5,
    first timed round 5)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import bench_e2e

    here = os.path.dirname(os.path.abspath(__file__))
    hap_vcf = os.path.join(here, ".build", "e2e_assemble.vcf")
    if not os.path.exists(hap_vcf):
        bench_e2e.run_assemble(500, 250, out_vcf=hap_vcf)
    dt, n_loci = bench_e2e.run_call_pedigree(hap_vcf, 1000, 500)
    return n_loci / dt


WORKLOADS = {
    "denovo": lambda: measure_pallas_denovo(DENOVO_LANES, DENOVO_STEPS),
    "calling": lambda: measure_pallas_calling(CALLING_LANES, CALLING_STEPS),
    "pedigree": lambda: measure_pedigree(PEDIGREE_LOCI, PEDIGREE_STEPS),
    "e2e": measure_e2e,
    "pedigree_e2e": measure_pedigree_e2e,
    "xla_calling": lambda: measure_xla_calling(32, 50, repeats=1),
}

# per-workload hard timeouts (seconds).  Cold remote compiles of the
# big pallas programs have been observed at 5-10+ min through the
# tunnel; the persistent compile cache (mchap_tpu/__init__) makes every
# later run of the same shapes start in seconds, so these bounds cover
# a cold-cache first run and are barely touched warm.
CHILD_TIMEOUT = {
    "denovo": 900,
    "calling": 700,
    "pedigree": 900,
    "e2e": 900,
    "pedigree_e2e": 900,
    "xla_calling": 600,
}


def run_child(name):
    """Child-process entry: run one workload, print one JSON line."""
    t0 = time.perf_counter()
    rate = WORKLOADS[name]()
    print(json.dumps({"rate": rate, "seconds": round(time.perf_counter() - t0, 1)}))


# ---------------------------------------------------------------------------
# parent orchestrator (never touches the TPU)
# ---------------------------------------------------------------------------


def oracle_rates(here):
    """Build + run the single-core C++ oracle; returns its JSON dict."""
    src = os.path.join(here, "mchap_tpu", "native", "bench_oracle.cpp")
    binary = os.path.join(here, ".build", "bench_oracle")
    try:
        if not os.path.exists(binary) or os.path.getmtime(binary) < os.path.getmtime(src):
            os.makedirs(os.path.dirname(binary), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-o", binary, src],
                check=True, capture_output=True, timeout=300,
            )
        out = subprocess.run(
            [binary, "2000"], capture_output=True, text=True, timeout=600
        )
        return json.loads(out.stdout.strip())
    except Exception as e:
        print(f"[bench] oracle failed: {e!r}", file=sys.stderr)
        return None


def spawn_workload(name, timeout):
    """Run one workload in a child process under a hard timeout.

    Returns (rate_or_None, error_or_None).  The child holds the
    single-client TPU grant for its lifetime; the parent stays off the
    device so a hung child costs only its own timeout."""
    cmd = [sys.executable, os.path.abspath(__file__), "--workload", name]
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout}s"
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        return None, f"rc={proc.returncode} after {dt:.0f}s: {' | '.join(tail)}"
    try:
        last = proc.stdout.strip().splitlines()[-1]
        return json.loads(last)["rate"], None
    except Exception as e:
        return None, f"unparseable output ({e!r}): {proc.stdout[-200:]!r}"


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    budget = float(os.environ.get("MCHAP_BENCH_BUDGET", "1800"))
    deadline = time.monotonic() + budget
    on_tpu = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))

    partial_path = os.path.join(here, ".build", "bench_partial.json")
    os.makedirs(os.path.dirname(partial_path), exist_ok=True)
    results, errors = {}, {}

    def checkpoint():
        with open(partial_path, "w") as fh:
            json.dump({"results": results, "errors": errors}, fh)

    if on_tpu:
        order = ["denovo", "calling", "pedigree", "e2e", "pedigree_e2e"]
    else:
        order = ["xla_calling"]
    if os.environ.get("MCHAP_BENCH_PEDIGREE", "1") == "0" and "pedigree" in order:
        order.remove("pedigree")
        errors["pedigree"] = "skipped (MCHAP_BENCH_PEDIGREE=0)"
    for name in os.environ.get("MCHAP_BENCH_SKIP", "").split(","):
        name = name.strip()
        if name and name in order:
            order.remove(name)
            errors[name] = "skipped (MCHAP_BENCH_SKIP)"

    for name in order:
        remaining = deadline - time.monotonic()
        timeout = min(CHILD_TIMEOUT[name], remaining)
        if timeout < 60:
            errors[name] = f"skipped (budget exhausted, {remaining:.0f}s left)"
            print(f"[bench] {name}: {errors[name]}", file=sys.stderr)
            continue
        print(f"[bench] {name}: starting (timeout {timeout:.0f}s)", file=sys.stderr)
        rate, err = spawn_workload(name, timeout)
        if rate is not None:
            key = "calling" if name == "xla_calling" else name
            results[key] = rate
            print(f"[bench] {name}: {rate:.1f} steps/s", file=sys.stderr)
        else:
            errors[name] = err
            print(f"[bench] {name}: FAILED ({err})", file=sys.stderr)
        checkpoint()

    oracle = oracle_rates(here)
    checkpoint()

    cores = 64  # BASELINE.md reference deployment
    extra = {
        "baseline_source": (
            "single-core C++ -O3 port of the reference inner loops "
            "(numba-class; includes the reference's llk caches) x 64 cores"
        ),
    }
    if "calling" in results:
        extra["calling_compound_steps_per_s"] = round(results["calling"], 1)
        extra["calling_vpu_utilization"] = round(
            results["calling"] * CALLING_FLOPS_PER_STEP / V5E_VPU_FLOPS, 4
        )
    if oracle:
        denovo_base = oracle["denovo_steps_per_s_1core"] * cores
        calling_base = oracle["calling_steps_per_s_1core"] * cores
        extra["baseline_denovo_steps_per_s_64core"] = round(denovo_base, 1)
        extra["baseline_calling_steps_per_s_64core"] = round(calling_base, 1)
        extra["oracle"] = oracle
        if "calling" in results:
            extra["calling_vs_baseline"] = round(
                results["calling"] / calling_base, 2
            )
    if "denovo" in results:
        extra["denovo_vpu_utilization"] = round(
            results["denovo"] * DENOVO_FLOPS_PER_STEP / V5E_VPU_FLOPS, 4
        )
    if "e2e" in results:
        extra["e2e_loci_per_s"] = round(results["e2e"], 4)
    if "pedigree_e2e" in results:
        extra["pedigree_e2e_loci_per_s"] = round(results["pedigree_e2e"], 4)
    if "pedigree" in results:
        extra["pedigree_compound_steps_per_s"] = round(results["pedigree"], 1)
        if oracle and "pedigree_steps_per_s_1core" in oracle:
            pedigree_base = oracle["pedigree_steps_per_s_1core"] * cores
            extra["baseline_pedigree_steps_per_s_64core"] = round(
                pedigree_base, 1
            )
            extra["pedigree_vs_baseline"] = round(
                results["pedigree"] / pedigree_base, 5
            )
    for name, err in errors.items():
        extra[f"{name}_error"] = err

    if "denovo" in results:
        value = results["denovo"]
        metric = "denovo_compound_steps_per_s"
        vs = (
            round(value / extra["baseline_denovo_steps_per_s_64core"], 3)
            if oracle
            else None
        )
    elif "calling" in results:
        value = results["calling"]
        metric = "calling_compound_steps_per_s"
        vs = extra.get("calling_vs_baseline")
    else:
        value = 0.0
        metric = "denovo_compound_steps_per_s"
        vs = None

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": "steps/s",
                "vs_baseline": vs,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--workload":
        run_child(sys.argv[2])
    else:
        main()
