"""Statistical correctness gate for the pallas calling Gibbs kernel.

Runs ON the TPU (the kernel's PRNG is a no-op under CPU interpret mode).
Gates the VMEM-resident sampler's posterior over genotypes against exact
enumeration on a small panel (same regime as
tests/test_calling_mcmc.py::test_gibbs_matches_exact_posterior).

Usage: python scripts/gate_pallas_calling.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mchap_tpu.numerics.combinadics import genotype_alleles_as_index
    from mchap_tpu.ops import exact
    from mchap_tpu.ops.likelihood import prepare_reads, read_hap_loglik
    from mchap_tpu.ops.pallas_calling import pallas_calling_sampler
    from mchap_tpu.testing import simulate_reads

    print("backend:", jax.default_backend(), flush=True)

    P, NB, A = 4, 3, 2
    haplotypes = np.array(
        [[0, 0, 0], [0, 1, 1], [1, 1, 0], [1, 1, 1]], np.int8
    )
    truth = haplotypes[np.array([0, 1, 1, 3])]
    reads = simulate_reads(
        truth, n_alleles=A, n_reads=8, errors=False, uniform_sample=True,
        qual=(20, 20), seed=7,
    )
    H = len(haplotypes)

    llks = exact.genotype_likelihoods(reads, P, haplotypes)
    want = np.asarray(exact.genotype_posteriors(llks, P, H))

    C, STEPS, BURN = 1024, 3000, 500
    log_reads = prepare_reads(reads, dtype=jnp.float32)
    rh = np.asarray(read_hap_loglik(log_reads, jnp.asarray(haplotypes)))
    rh_cl = np.broadcast_to(rh[:, :, None], rh.shape + (C,)).copy()
    counts_cl = np.ones((len(reads), C), np.float32)
    gt, _ = pallas_calling_sampler(
        jnp.int32(13), jnp.asarray(rh_cl, jnp.float32),
        jnp.asarray(counts_cl), n_steps=STEPS, ploidy=P,
    )
    gt = np.asarray(gt)[BURN:]  # [steps, P, C]
    flat = np.sort(gt.transpose(0, 2, 1).reshape(-1, P), axis=1)
    idx = np.asarray(genotype_alleles_as_index(jnp.asarray(flat)))
    got = np.bincount(idx, minlength=len(want)).astype(float)
    got /= got.sum()

    tv = 0.5 * np.abs(got - want).sum()
    print("TV(pallas, exact) =", round(float(tv), 4))
    top = np.argsort(want)[::-1][:5]
    for i in top:
        print(f"  state {i}: exact={want[i]:.4f} pallas={got[i]:.4f}")
    assert tv < 0.03, f"pallas calling vs exact TV too large: {tv}"
    print("GATE PASSED", flush=True)


if __name__ == "__main__":
    main()
