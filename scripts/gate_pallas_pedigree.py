"""Statistical correctness gate for the pallas pedigree Gibbs kernel.

Runs ON the TPU (the kernel's PRNG is a no-op under CPU interpret mode).
Gates the VMEM-resident joint sampler's per-sample posteriors against
brute-force enumeration of the full joint (llk x trio pmfs) — the
regime of tests/test_pedigree_mcmc.py::test_pedigree_mcmc_matches_exact
and of reference test_pedigree/test_pedigree_classes.py:17-120 — with
the parental-pair swap move enabled (its acceptance ratio is part of
the stationary distribution being checked).  Two scenarios:

1. diploid trio, tau (1, 1) — the classic regime;
2. tetraploid trio with MIXED gamete ploidies, tau (3, 1) — exercises
   the kernel's static composition tables beyond the diploid-gamete
   default.

Usage: python scripts/gate_pallas_pedigree.py
"""

import os

import numpy as np

os.environ.setdefault("MCHAP_PEDIGREE_PALLAS", "1")


def run_scenario(name, ploidy, tau_child, steps, burn, atol):
    import jax
    import jax.numpy as jnp  # noqa: F401  (backend init)

    from mchap_tpu.models.pedigree import PedigreeCallingMCMC
    from mchap_tpu.ops.exact import genotype_likelihoods
    from mchap_tpu.testing import exact_pedigree_marginals, simulate_reads
    from mchap_tpu.utils import fallback as _fb

    HAPS = np.array([[0, 0], [0, 1], [1, 1]], dtype=np.int8)
    n_samples = 3
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    tau = np.full((3, 2), max(ploidy // 2, 1))
    tau[2] = tau_child
    lam = np.zeros((3, 2))
    err = np.full((3, 2), 0.01)
    rng = np.random.default_rng(3)
    truths = [
        HAPS[rng.integers(0, len(HAPS), ploidy)] for _ in range(n_samples)
    ]
    reads = [
        simulate_reads(t, n_alleles=2, n_reads=4, qual=(14, 18), seed=i)
        for i, t in enumerate(truths)
    ]
    max_reads = max(len(r) for r in reads)
    sample_reads = np.full((n_samples, max_reads, 2, 2), np.nan)
    sample_counts = np.zeros((n_samples, max_reads))
    for i, r in enumerate(reads):
        sample_reads[i, : len(r)] = r
        sample_counts[i, : len(r)] = 1

    llks = np.stack(
        [
            np.asarray(
                genotype_likelihoods(
                    sample_reads[i], ploidy, HAPS, sample_counts[i]
                )
            )
            for i in range(n_samples)
        ]
    )
    want = exact_pedigree_marginals(
        llks, parents, tau, lam, err, len(HAPS), ploidy
    )

    model = PedigreeCallingMCMC(
        sample_ploidy=np.full(3, ploidy),
        sample_parents=parents,
        gamete_tau=tau,
        gamete_lambda=lam,
        gamete_error=err,
        haplotypes=HAPS,
        steps=steps,
        chains=2,
        random_seed=11,
        swap_parental_alleles=True,
    )
    paths = []
    orig = _fb.note_path
    _fb.note_path = lambda s, p: (paths.append((s, p)), orig(s, p))
    trace = model.fit(sample_reads, sample_counts).burn(burn)
    _fb.note_path = orig
    assert ("pedigree", "pallas") in paths, f"pallas path not taken: {paths}"

    worst = 0.0
    for i in range(n_samples):
        got = trace.individual(i).posterior().as_array(len(HAPS))
        tv = 0.5 * np.abs(got - want[i]).sum()
        worst = max(worst, tv)
        top = np.argsort(want[i])[::-1][:2]
        detail = ", ".join(
            f"state {s}: exact={want[i][s]:.4f} pallas={got[s]:.4f}"
            for s in top
        )
        print(f"  [{name}] sample {i}: TV={tv:.4f} ({detail})")
    print(f"TV({name}, exact) = {round(float(worst), 4)}")
    assert worst < atol, f"{name}: pallas vs exact TV too large: {worst}"


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    run_scenario("trio", ploidy=2, tau_child=(1, 1), steps=3000, burn=500,
                 atol=0.05)
    run_scenario("tau31", ploidy=4, tau_child=(3, 1), steps=3000, burn=500,
                 atol=0.05)
    print("GATE PASSED")


if __name__ == "__main__":
    main()
