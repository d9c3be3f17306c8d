"""Statistical correctness gate for the pallas pedigree Gibbs kernel.

Runs ON the TPU (the kernel's PRNG is a no-op under CPU interpret mode).
Gates the VMEM-resident joint sampler's per-sample posteriors against
brute-force enumeration of the full joint (llk x trio pmfs) for a
diploid trio — the regime of
tests/test_pedigree_mcmc.py::test_pedigree_mcmc_matches_exact and of
reference test_pedigree/test_pedigree_classes.py:17-120 — with the
parental-pair swap move enabled (its acceptance ratio is part of the
stationary distribution being checked).

Usage: python scripts/gate_pallas_pedigree.py
"""

import itertools
import os

import numpy as np

os.environ.setdefault("MCHAP_PEDIGREE_PALLAS", "1")


def main():
    import jax
    import jax.numpy as jnp

    from mchap_tpu.models.pedigree import PedigreeCallingMCMC
    from mchap_tpu.numerics.combinadics import enumerate_genotypes
    from mchap_tpu.ops import pedigree_mcmc as K
    from mchap_tpu.ops.exact import genotype_likelihoods
    from mchap_tpu.testing import simulate_reads
    from mchap_tpu.utils import fallback as _fb

    print("backend:", jax.default_backend(), flush=True)

    HAPS = np.array([[0, 0], [0, 1], [1, 1]], dtype=np.int8)
    ploidy, n_samples = 2, 3
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    tau = np.full((3, 2), 1)
    lam = np.zeros((3, 2))
    err = np.full((3, 2), 0.01)
    truths = [HAPS[[0, 1]], HAPS[[1, 2]], HAPS[[0, 2]]]
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

    # exact joint enumeration oracle (same as the CPU test's)
    table = enumerate_genotypes(len(HAPS), ploidy)
    G = len(table)
    tables, valid = K.composition_tables(ploidy)
    log_freqs = np.log(np.full(3, 1 / 3))
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

    def pad(vec):
        out = np.full(ploidy, -1, np.int32)
        out[: len(vec)] = vec
        return out

    def trio(i, combo):
        p, q = parents[i]
        has_p, has_q = p >= 0, q >= 0
        return float(
            K.trio_log_pmf(
                jnp.asarray(pad(table[combo[i]])),
                jnp.asarray(pad(table[combo[p]] if has_p else [])),
                jnp.asarray(pad(table[combo[q]] if has_q else [])),
                jnp.asarray(ploidy if has_p else 0),
                jnp.asarray(ploidy if has_q else 0),
                jnp.asarray(tau[i][0]),
                jnp.asarray(tau[i][1]),
                jnp.asarray(lam[i][0]),
                jnp.asarray(lam[i][1]),
                jnp.asarray(err[i][0] if has_p else 1.0),
                jnp.asarray(err[i][1] if has_q else 1.0),
                jnp.asarray(log_freqs),
                jnp.asarray(tables),
                jnp.asarray(valid),
                jnp.asarray(K._COMB_LUT),
            )
        )

    marginals = np.zeros((n_samples, G))
    combos = list(itertools.product(range(G), repeat=n_samples))
    joint_logs = [
        sum(llks[i, c[i]] for i in range(n_samples))
        + sum(trio(i, c) for i in range(n_samples))
        for c in combos
    ]
    joint = np.exp(np.array(joint_logs) - max(joint_logs))
    joint /= joint.sum()
    for idx, combo in enumerate(combos):
        for i in range(n_samples):
            marginals[i, combo[i]] += joint[idx]

    model = PedigreeCallingMCMC(
        sample_ploidy=np.full(3, ploidy),
        sample_parents=parents,
        gamete_tau=tau,
        gamete_lambda=lam,
        gamete_error=err,
        haplotypes=HAPS,
        steps=3000,
        chains=2,
        random_seed=11,
        swap_parental_alleles=True,
    )
    paths = []
    orig = _fb.note_path
    _fb.note_path = lambda s, p: (paths.append((s, p)), orig(s, p))
    trace = model.fit(sample_reads, sample_counts).burn(500)
    _fb.note_path = orig
    assert ("pedigree", "pallas") in paths, f"pallas path not taken: {paths}"

    worst = 0.0
    for i in range(n_samples):
        got = trace.individual(i).posterior().as_array(len(HAPS))
        tv = 0.5 * np.abs(got - marginals[i]).sum()
        worst = max(worst, tv)
        print(f"sample {i}: TV(pallas, exact) = {tv:.4f}")
        top = np.argsort(marginals[i])[::-1][:3]
        for s in top:
            print(f"  state {s}: exact={marginals[i][s]:.4f} "
                  f"pallas={got[s]:.4f}")
    print("TV(pallas, exact) =", round(float(worst), 4))
    assert worst < 0.05, f"pallas pedigree vs exact TV too large: {worst}"
    print("GATE PASSED")


if __name__ == "__main__":
    main()
