"""Statistical-correctness gates for the batched de novo assembler.

Regimes of reference test_assemble/test_mcmc.py: behavioral posteriors
by depth, determinism, edge cases — plus an exact-enumeration oracle:
on a tiny locus the de novo sampler's posterior over genotypes must
match the exact caller's posterior over the FULL haplotype space
(both target likelihood x uniform-over-unordered-genotypes).
"""

import itertools

import numpy as np
import pytest

from mchap_tpu import mset
from mchap_tpu.models.assemble import DenovoMCMC, call_posterior_haplotypes
from mchap_tpu.numerics.combinadics import enumerate_genotypes
from mchap_tpu.ops import exact
from mchap_tpu.testing import simulate_reads

HAPS = np.array([[0, 0, 0], [0, 1, 1], [1, 1, 0], [1, 1, 1]], dtype=np.int8)


def full_panel(n_pos, n_alleles=2):
    """All possible haplotypes over a locus, in integer-lex order."""
    return np.array(
        list(itertools.product(range(n_alleles), repeat=n_pos)), dtype=np.int8
    )


def denovo_posterior_as_panel_array(trace, panel, ploidy):
    """Project a de novo genotype posterior onto panel-allele indices."""
    post = trace.posterior()
    out = np.zeros(len(enumerate_genotypes(len(panel), ploidy)))
    for gen, prob in zip(post.genotypes, post.probabilities):
        idx_alleles = np.sort(mset.categorize(gen, panel))
        assert np.all(idx_alleles >= 0)
        from mchap_tpu.numerics.combinadics import genotype_alleles_as_index

        out[int(genotype_alleles_as_index(idx_alleles))] += prob
    return out


@pytest.mark.parametrize("fix_homozygous", [0.999, 1.1])
def test_denovo_matches_exact_posterior(fix_homozygous):
    """Sampler posterior ≈ exact posterior over the full 2-SNV space.

    fix_homozygous = 1.1 disables homozygote fixing, exercising both the
    fixed-column no-op path and the plain path.
    """
    truth = np.array([[0, 0], [0, 0], [0, 1], [1, 1]], dtype=np.int8)
    reads = simulate_reads(truth, n_alleles=2, n_reads=8, qual=(15, 25), seed=3)
    model = DenovoMCMC(
        ploidy=4,
        n_alleles=[2, 2],
        steps=3500,
        chains=2,
        random_seed=7,
        fix_homozygous=fix_homozygous,
    )
    trace = model.fit(reads).burn(500)
    panel = full_panel(2)
    got = denovo_posterior_as_panel_array(trace, panel, 4)

    llks = exact.genotype_likelihoods(reads, 4, panel)
    want = np.asarray(exact.genotype_posteriors(llks, 4, len(panel)))
    np.testing.assert_allclose(got, want, atol=0.05)


def test_high_depth_recovers_truth():
    truth = HAPS[[0, 0, 1, 2]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=60, errors=False, seed=1)
    model = DenovoMCMC(ploidy=4, n_alleles=[2, 2, 2], steps=1000, chains=2, random_seed=5)
    trace = model.fit(reads).burn(200)
    mode, prob = trace.posterior().mode()
    np.testing.assert_array_equal(mode, np.array(sorted(truth.tolist())))
    assert prob > 0.9
    assert trace.replicate_incongruence() == 0


def test_low_depth_is_uncertain():
    truth = HAPS[[0, 1, 2, 3]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=4, qual=(10, 15), seed=2)
    model = DenovoMCMC(ploidy=4, n_alleles=[2, 2, 2], steps=1500, chains=2, random_seed=6)
    trace = model.fit(reads).burn(300)
    _, prob = trace.posterior().mode()
    assert prob < 0.5


def test_determinism_under_seed():
    reads = simulate_reads(HAPS[[0, 1, 2, 3]], n_alleles=2, n_reads=20, seed=8)
    kwargs = dict(ploidy=4, n_alleles=[2, 2, 2], steps=200, chains=2, random_seed=11)
    t1 = DenovoMCMC(**kwargs).fit(reads)
    t2 = DenovoMCMC(**kwargs).fit(reads)
    np.testing.assert_array_equal(t1.genotypes, t2.genotypes)
    np.testing.assert_allclose(t1.llks, t2.llks)


def test_zero_reads():
    reads = np.empty((0, 3, 2))
    model = DenovoMCMC(ploidy=4, n_alleles=[2, 2, 2], steps=300, chains=2, random_seed=3)
    trace = model.fit(reads).burn(100)
    # uninformative: posterior spread over many genotypes
    _, prob = trace.posterior().mode()
    assert prob < 0.6


def test_all_homozygous_shortcut():
    # reads overwhelmingly support the 1,0 haplotype at both positions
    truth = np.tile(np.array([[1, 0]], dtype=np.int8), (4, 1))
    reads = simulate_reads(truth, n_alleles=2, n_reads=80, errors=False, seed=4)
    model = DenovoMCMC(ploidy=4, n_alleles=[2, 2], steps=100, chains=2, random_seed=3)
    trace = model.fit(reads)
    assert np.all(trace.genotypes == truth[None, None])
    assert np.all(np.isnan(trace.llks))


def test_tempering_matches_exact_mode():
    truth = HAPS[[0, 0, 1, 2]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=40, errors=False, seed=9)
    model = DenovoMCMC(
        ploidy=4,
        n_alleles=[2, 2, 2],
        steps=600,
        chains=2,
        random_seed=13,
        temperatures=(0.25, 0.5, 1.0),
    )
    trace = model.fit(reads).burn(100)
    mode, prob = trace.posterior().mode()
    # the tempered sampler must agree with the exact-enumeration mode
    panel = full_panel(3)
    exact_alleles, _, exact_prob = exact.posterior_mode(reads, 4, panel)
    np.testing.assert_array_equal(mode, panel[np.asarray(exact_alleles)])
    assert abs(prob - exact_prob) < 0.1


def test_inbreeding_prior_shifts_posterior():
    truth = HAPS[[0, 0, 1, 1]]
    reads = simulate_reads(truth, n_alleles=2, n_reads=6, qual=(12, 18), seed=10)
    flat = DenovoMCMC(ploidy=4, n_alleles=[2, 2, 2], steps=2000, chains=2, random_seed=3)
    inbred = DenovoMCMC(
        ploidy=4, n_alleles=[2, 2, 2], steps=2000, chains=2, random_seed=3,
        inbreeding=0.5,
    )
    t_flat = flat.fit(reads).burn(400)
    t_inbred = inbred.fit(reads).burn(400)
    # the inbreeding prior must increase the posterior weight of
    # low-diversity genotypes (mean count of distinct haplotypes drops)
    def mean_diversity(trace):
        post = trace.posterior()
        div = [len(mset.unique(g)) for g in post.genotypes]
        return float(np.dot(div, post.probabilities))

    assert mean_diversity(t_inbred) < mean_diversity(t_flat)


def test_call_posterior_haplotypes_pools_population():
    truth_a = HAPS[[0, 0, 0, 1]]
    truth_b = HAPS[[0, 2, 2, 2]]
    posteriors = []
    for truth, seed in [(truth_a, 1), (truth_b, 2)]:
        reads = simulate_reads(truth, n_alleles=2, n_reads=50, errors=False, seed=seed)
        model = DenovoMCMC(ploidy=4, n_alleles=[2, 2, 2], steps=500, chains=2, random_seed=3)
        posteriors.append(model.fit(reads).burn(100).posterior())
    haplotypes, ref_observed = call_posterior_haplotypes(posteriors, threshold=0.2)
    assert ref_observed  # haplotype 0 (all ref) present in sample A
    # ref first, then alts; both alt haplotypes called
    np.testing.assert_array_equal(haplotypes[0], [0, 0, 0])
    alt_set = {h.tobytes() for h in haplotypes[1:]}
    assert HAPS[1].tobytes() in alt_set
    assert HAPS[2].tobytes() in alt_set


def test_hom_screen_numpy_mirror_matches_jitted():
    """The host-route numpy screen (flat prior) must match the jitted
    screen within f32 rounding — the >= 0.999 fix decision depends on
    it (ops/assemble_mcmc._hom_batch_probs_np)."""
    import numpy as np

    from mchap_tpu.ops import assemble_mcmc as K

    rng = np.random.default_rng(0)
    S, R, NB, A = 5, 24, 7, 3
    reads = rng.uniform(0.0, 1.0, (S, R, NB, A))
    reads[reads < 0.1] = np.nan
    counts = rng.integers(1, 4, (S, R)).astype(float)
    nall = rng.integers(1, A + 1, (S, NB)).astype(np.int32)
    want = np.asarray(
        K._hom_batch_probs(
            np.asarray(reads, np.float32), nall, np.zeros(S),
            np.asarray(counts, np.float32), ploidy=4, use_prior=False,
        )
    )
    got = K._hom_batch_probs_np(reads, nall, counts, 4)
    np.testing.assert_allclose(got, want, atol=1e-5)
