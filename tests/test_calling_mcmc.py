"""Statistical-correctness gates for the batched calling MCMC.

The central pattern (as in reference test_calling/test_calling_mcmc.py):
the sampler's posterior over a small panel must agree with the exact
enumeration posterior (ops/exact.py) within a depth-dependent tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.models.calling import CallingMCMC
from mchap_tpu.numerics.combinadics import enumerate_genotypes
from mchap_tpu.ops import exact
from mchap_tpu.testing import simulate_reads

HAPLOTYPES = np.array(
    [
        [0, 0, 0, 0],
        [0, 0, 1, 1],
        [1, 1, 0, 0],
        [1, 1, 1, 1],
    ],
    dtype=np.int8,
)


def trace_posterior_array(trace, n_alleles):
    return trace.posterior().as_array(n_alleles)


@pytest.mark.parametrize("step_type", ["Gibbs", "Metropolis-Hastings"])
@pytest.mark.parametrize("prior", [None, (0.1, np.array([0.4, 0.3, 0.2, 0.1]))])
def test_mcmc_matches_exact_posterior(step_type, prior):
    truth = np.array([0, 0, 1, 3])
    reads = simulate_reads(
        HAPLOTYPES[truth], n_alleles=2, n_reads=8, qual=(20, 30), seed=3
    )
    model = CallingMCMC(
        ploidy=4,
        haplotypes=HAPLOTYPES,
        prior=prior,
        steps=4000,
        chains=2,
        random_seed=7,
        step_type=step_type,
    )
    trace = model.fit(reads).burn(500)
    got = trace_posterior_array(trace, len(HAPLOTYPES))

    llks = exact.genotype_likelihoods(reads, 4, HAPLOTYPES)
    want = np.asarray(exact.genotype_posteriors(llks, 4, len(HAPLOTYPES), prior=prior))
    # compare where exact posterior is non-negligible
    np.testing.assert_allclose(got, want, atol=0.05)


def test_gibbs_flat_prior_targets_uniform_unordered_genotypes():
    """Without an explicit prior the stationary distribution is uniform
    over unordered genotypes: the reference's flat allele prior
    (log multiplicity, calling/prior.py:30-52) is exactly the Jacobian
    correction for slot-wise sampling of a multiset state — consistent
    with the exact caller's prior=None posterior (∝ llk alone)."""
    reads = np.full((1, 4, 2), 0.5)  # uninformative reads
    model = CallingMCMC(
        ploidy=2, haplotypes=HAPLOTYPES[:2], steps=8000, chains=2, random_seed=1
    )
    trace = model.fit(reads).burn(1000)
    got = trace_posterior_array(trace, 2)
    np.testing.assert_allclose(got, [1 / 3, 1 / 3, 1 / 3], atol=0.04)


def test_high_depth_recovers_truth():
    truth = np.array([0, 1, 1, 2])
    reads = simulate_reads(HAPLOTYPES[truth], n_alleles=2, n_reads=60, errors=False, seed=4)
    model = CallingMCMC(ploidy=4, haplotypes=HAPLOTYPES, steps=1500, chains=2, random_seed=5)
    trace = model.fit(reads).burn(300)
    mode, prob = trace.posterior().mode()
    np.testing.assert_array_equal(mode, truth)
    assert prob > 0.9


def test_determinism_under_seed():
    reads = simulate_reads(HAPLOTYPES[[0, 1, 2, 3]], n_alleles=2, n_reads=10, seed=9)
    kwargs = dict(ploidy=4, haplotypes=HAPLOTYPES, steps=200, chains=2, random_seed=11)
    t1 = CallingMCMC(**kwargs).fit(reads)
    t2 = CallingMCMC(**kwargs).fit(reads)
    np.testing.assert_array_equal(t1.genotypes, t2.genotypes)
    np.testing.assert_allclose(t1.llks, t2.llks)


def test_zero_variant_shortcut():
    reads = np.empty((5, 0, 2))
    model = CallingMCMC(ploidy=4, haplotypes=np.zeros((1, 0), np.int8), steps=100, chains=2)
    trace = model.fit(reads)
    assert trace.genotypes.shape == (2, 100, 4)
    assert np.all(trace.genotypes == 0)
    assert np.all(np.isnan(trace.llks))


def test_trace_utilities():
    truth = np.array([0, 0, 2, 3])
    reads = simulate_reads(HAPLOTYPES[truth], n_alleles=2, n_reads=40, errors=False, seed=2)
    model = CallingMCMC(ploidy=4, haplotypes=HAPLOTYPES, steps=600, chains=2, random_seed=3)
    trace = model.fit(reads).burn(100)

    # posterior_frequencies sums to 1 / ploidy semantics
    freqs, counts, occur = trace.posterior_frequencies()
    assert freqs.sum() == pytest.approx(1.0)
    assert counts.sum() == pytest.approx(4.0)
    assert np.all(occur <= 1.0 + 1e-12)

    # support mode
    alleles, prob, support = trace.posterior().mode(genotype_support=True)
    assert support >= prob
    np.testing.assert_array_equal(np.unique(alleles), np.unique(truth))

    # replicate congruence on a decisive posterior
    assert trace.replicate_incongruence() == 0

    # relabel
    labels = np.array([3, 2, 1, 0])
    relabeled = trace.relabel(labels)
    assert relabeled.n_allele == 4
    np.testing.assert_array_equal(relabeled.genotypes, labels[trace.genotypes])

    # split yields per-chain traces
    parts = list(trace.split())
    assert len(parts) == 2
    assert parts[0].genotypes.shape[0] == 1


def test_greedy_caller_initialises_well():
    from mchap_tpu.ops.calling_mcmc import greedy_caller
    from mchap_tpu.ops.likelihood import prepare_reads, read_hap_loglik

    truth = np.array([1, 1, 2, 2])
    reads = simulate_reads(HAPLOTYPES[truth], n_alleles=2, n_reads=50, errors=False, seed=6)
    rh = read_hap_loglik(prepare_reads(reads), jnp.asarray(HAPLOTYPES))
    got = np.asarray(greedy_caller(rh, jnp.ones(len(reads)), ploidy=4))
    np.testing.assert_array_equal(np.sort(got), truth)


def test_fit_calling_multi_heterogeneous_panels():
    """Cross-locus batching: problems with different panel sizes and read
    depths padded into one device program must each recover the exact
    posterior computed on their OWN panel."""
    from mchap_tpu.models.calling import fit_calling_multi

    panel_a = HAPLOTYPES  # 4 haplotypes x 4 pos
    panel_b = np.array([[0, 0], [1, 1]], dtype=np.int8)  # 2 haplotypes x 2 pos
    reads_a = simulate_reads(
        panel_a[[0, 0, 1, 3]], n_alleles=2, n_reads=12, qual=(30, 40), seed=5
    )
    reads_b = simulate_reads(
        panel_b[[0, 1, 1, 1]], n_alleles=2, n_reads=5, qual=(30, 40), seed=6
    )
    problems = [
        dict(reads=reads_a, counts=np.ones(len(reads_a)), haplotypes=panel_a),
        dict(reads=reads_b, counts=np.ones(len(reads_b)), haplotypes=panel_b),
    ]
    traces = fit_calling_multi(problems, ploidy=4, steps=3000, chains=2,
                               random_seed=3)
    assert traces[0].n_allele == 4
    assert traces[1].n_allele == 2
    for trace, reads, panel in zip(traces, (reads_a, reads_b), (panel_a, panel_b)):
        t = trace.burn(500)
        # padded -inf alleles must never be sampled
        assert t.genotypes.max() < len(panel)
        got = trace_posterior_array(t, len(panel))
        llks = exact.genotype_likelihoods(reads, 4, panel)
        want = np.asarray(exact.genotype_posteriors(llks, 4, len(panel)))
        np.testing.assert_allclose(got, want, atol=0.06)


def test_fit_calling_multi_with_priors():
    """Per-problem inbreeding/frequency priors flow through the batched
    path and match the exact Dirichlet-multinomial posterior."""
    from mchap_tpu.models.calling import fit_calling_multi

    truth = np.array([0, 1, 1, 3])
    reads = simulate_reads(
        HAPLOTYPES[truth], n_alleles=2, n_reads=8, qual=(20, 30), seed=9
    )
    freqs = np.array([0.4, 0.3, 0.2, 0.1])
    problems = [
        dict(
            reads=reads,
            counts=np.ones(len(reads)),
            haplotypes=HAPLOTYPES,
            inbreeding=0.1,
            frequencies=freqs,
        )
    ]
    traces = fit_calling_multi(problems, ploidy=4, steps=4000, chains=2,
                               random_seed=1)
    got = trace_posterior_array(traces[0].burn(500), len(HAPLOTYPES))
    llks = exact.genotype_likelihoods(reads, 4, HAPLOTYPES)
    want = np.asarray(
        exact.genotype_posteriors(llks, 4, len(HAPLOTYPES), prior=(0.1, freqs))
    )
    np.testing.assert_allclose(got, want, atol=0.06)
