"""Statistical correctness gate for the full-step pallas de novo sampler.

Runs ON the TPU (the kernel's PRNG is a no-op under CPU interpret mode).
Gates, on a tiny 2-SNV tetraploid locus where exact enumeration over the
full haplotype space is available:

1. pallas sampler posterior over genotypes  ==  exact posterior
   (total-variation distance below tolerance), same regime as
   tests/test_assemble_mcmc.py::test_denovo_matches_exact_posterior;
2. pallas posterior == XLA denovo_sampler posterior (same target).

Usage: python scripts/gate_pallas_denovo.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mchap_tpu.ops import exact
    from mchap_tpu.ops.likelihood import prepare_reads
    from mchap_tpu.ops.pallas_denovo import pallas_denovo_sampler
    from mchap_tpu.testing import simulate_reads

    print("backend:", jax.default_backend(), flush=True)

    P, NB, A = 4, 2, 2
    # moderate depth so the posterior is spread over several genotypes
    haplotypes = np.array([[0, 0], [0, 1], [1, 1], [0, 0]], np.int8)
    reads = simulate_reads(
        haplotypes, n_alleles=A, n_reads=8, errors=False, uniform_sample=True,
        qual=(20, 20), seed=11,
    )
    R = len(reads)

    # exact posterior over the full 2-SNV haplotype space
    panel = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.int8)
    llks = exact.genotype_likelihoods(reads, P, panel)
    want = np.asarray(exact.genotype_posteriors(llks, P, len(panel)))

    def genotype_index(gen):
        """sorted panel-allele multiset -> VCF genotype index."""
        from mchap_tpu.numerics.combinadics import genotype_alleles_as_index
        alleles = np.sort([int(h[0]) * 2 + int(h[1]) for h in gen])
        return int(genotype_alleles_as_index(jnp.asarray(alleles)))

    # ---- pallas sampler ----
    C, STEPS, BURN = 1024, 1500, 300
    lr = np.asarray(prepare_reads(reads, dtype=jnp.float32))  # [R, NB, A]
    lrc = np.broadcast_to(lr[:, :, :, None], (R, NB, A, C)).copy()
    cnt = np.ones((R, C), np.float32)
    rng = np.random.default_rng(0)
    gi = rng.integers(0, A, size=(P, NB, C)).astype(np.int32)
    nall = np.full((NB, C), A, np.int32)
    pb = np.full((1, C), 0.25, np.float32)
    gt, llt = pallas_denovo_sampler(
        jnp.int32(11), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb), n_steps=STEPS, ploidy=P,
    )
    gt = np.asarray(gt)[BURN:]  # [steps, P, NB, C]

    got = np.zeros_like(want)
    n_states = len(want)
    flat = gt.transpose(0, 3, 1, 2).reshape(-1, P, NB)
    codes = flat[:, :, 0] * 2 + flat[:, :, 1]  # [N, P] panel indices
    codes = np.sort(codes, axis=1)
    from mchap_tpu.numerics.combinadics import genotype_alleles_as_index

    idx = np.asarray(genotype_alleles_as_index(jnp.asarray(codes)))
    binc = np.bincount(idx, minlength=n_states).astype(float)
    got = binc / binc.sum()

    tv_exact = 0.5 * np.abs(got - want).sum()
    print("TV(pallas, exact) =", round(float(tv_exact), 4))
    top = np.argsort(want)[::-1][:5]
    for i in top:
        print(f"  state {i}: exact={want[i]:.4f} pallas={got[i]:.4f}")

    # ---- XLA sampler on the same problem ----
    from mchap_tpu.ops.assemble_mcmc import denovo_sampler

    n_chains_x = 64
    init = jnp.asarray(
        rng.integers(0, A, size=(n_chains_x, P, NB)), jnp.int32
    )
    bd = np.zeros(NB)
    bd[0] = 0.75
    bd[1] = 0.25
    gx, _ = denovo_sampler(
        jax.random.PRNGKey(11), init, prepare_reads(reads),
        jnp.ones(R, jnp.float64), jnp.full((NB,), A, jnp.int32),
        jnp.asarray(bd), jnp.asarray([1.0]), n_steps=STEPS,
    )
    gx = np.asarray(gx)[:, BURN:]  # [chains, steps, P, NB]
    flatx = gx.reshape(-1, P, NB)
    codesx = np.sort(flatx[:, :, 0] * 2 + flatx[:, :, 1], axis=1)
    idxx = np.asarray(genotype_alleles_as_index(jnp.asarray(codesx)))
    gotx = np.bincount(idxx, minlength=n_states).astype(float)
    gotx /= gotx.sum()
    tv_xla = 0.5 * np.abs(got - gotx).sum()
    tv_xla_exact = 0.5 * np.abs(gotx - want).sum()
    print("TV(xla, exact)    =", round(float(tv_xla_exact), 4))
    print("TV(pallas, xla)   =", round(float(tv_xla), 4))

    assert tv_exact < 0.03, f"pallas vs exact TV too large: {tv_exact}"
    assert tv_xla < 0.04, f"pallas vs xla TV too large: {tv_xla}"

    # ---- tempered pallas sampler: cold-chain posterior is the same
    # target (swaps preserve the stationary distribution) ----
    gt_t, _ = pallas_denovo_sampler(
        jnp.int32(11), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb),
        jnp.asarray([0.33, 0.66, 1.0], jnp.float32),
        n_steps=STEPS, ploidy=P,
    )
    gt_t = np.asarray(gt_t)[BURN:]
    flat_t = gt_t.transpose(0, 3, 1, 2).reshape(-1, P, NB)
    codes_t = np.sort(flat_t[:, :, 0] * 2 + flat_t[:, :, 1], axis=1)
    idx_t = np.asarray(genotype_alleles_as_index(jnp.asarray(codes_t)))
    got_t = np.bincount(idx_t, minlength=n_states).astype(float)
    got_t /= got_t.sum()
    tv_temp = 0.5 * np.abs(got_t - want).sum()
    print("TV(tempered, exact) =", round(float(tv_temp), 4))
    assert tv_temp < 0.03, f"tempered pallas vs exact TV too large: {tv_temp}"

    # ---- Dirichlet-multinomial prior: exact target over the complete
    # panel (calling-model prior with uniform frequencies == assemble
    # dosage prior when the panel is the full haplotype space) ----
    F = 0.3
    want_f = np.asarray(exact.genotype_posteriors(llks, P, len(panel), prior=(F, None)))
    uh = float(len(panel))
    alpha = (1.0 - F) / F / uh
    gt_f, _ = pallas_denovo_sampler(
        jnp.int32(11), jnp.asarray(lrc), jnp.asarray(cnt), jnp.asarray(gi),
        jnp.asarray(nall), jnp.asarray(pb), None,
        jnp.full((C,), alpha, jnp.float32),
        n_steps=STEPS, ploidy=P,
    )
    gt_f = np.asarray(gt_f)[BURN:]
    flat_f = gt_f.transpose(0, 3, 1, 2).reshape(-1, P, NB)
    codes_f = np.sort(flat_f[:, :, 0] * 2 + flat_f[:, :, 1], axis=1)
    idx_f = np.asarray(genotype_alleles_as_index(jnp.asarray(codes_f)))
    got_f = np.bincount(idx_f, minlength=n_states).astype(float)
    got_f /= got_f.sum()
    tv_dirmul = 0.5 * np.abs(got_f - want_f).sum()
    print("TV(dirmul, exact)  =", round(float(tv_dirmul), 4))
    assert tv_dirmul < 0.03, f"dirmul pallas vs exact TV too large: {tv_dirmul}"
    print("GATE PASSED", flush=True)


if __name__ == "__main__":
    main()
