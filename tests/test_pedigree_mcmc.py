"""Pedigree model gates: trio pmf values + normalisation, validation
kernels, and MCMC posterior vs exact enumeration (the regime of
reference test_pedigree/test_pedigree_classes.py:17-120)."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.models.pedigree import PedigreeCallingMCMC
from mchap_tpu.numerics.combinadics import enumerate_genotypes
from mchap_tpu.ops import pedigree_mcmc as K
from mchap_tpu.ops.exact import genotype_likelihoods
from mchap_tpu.testing import simulate_reads

HAPS = np.array([[0, 0], [0, 1], [1, 1]], dtype=np.int8)


def _pad(vec, maxp):
    out = np.full(maxp, -1, np.int32)
    out[: len(vec)] = vec
    return out


# reference gamete pmf value table (test_pedigree_prior.py:145-172)
@pytest.mark.parametrize(
    "parent_dosage, parent_ploidy, gamete_dosage, gamete_ploidy, lambda_, expect",
    [
        ([2, 0], 2, [1, 0], 1, 0.0, 1.0),
        ([1, 1], 2, [1, 0], 1, 0.0, 0.5),
        ([0, 2], 2, [1, 0], 1, 0.0, 0.0),
        ([1, 1], 2, [1, 1], 2, 0.0, 1.0),
        ([1, 1], 2, [1, 1], 2, 0.2, 0.8),
        ([1, 1], 2, [0, 2], 2, 0.5, 0.25),
        ([4, 0, 0, 0], 4, [2, 0, 0, 0], 2, 0.0, 1.0),
        ([0, 1, 3, 0], 4, [0, 0, 2, 0], 2, 0.0, 0.5),
        ([0, 2, 2, 0], 4, [0, 1, 1, 0], 2, 0.0, 8 / 12),
        ([0, 2, 0, 1], 4, [0, 1, 1, 0], 2, 0.0, 0.0),
        ([2, 0, 0, 0], 4, [2, 0, 0, 0], 2, 0.5, (2 / 12 + 0.5 * 4 / 12)),
        ([1, 3, 0, 0], 4, [0, 2, 0, 0], 2, 0.5, (6 / 12 + 0.5 * 3 / 12)),
        ([1, 1, 1, 1, 1, 1], 6, [0, 0, 0, 1, 1, 1], 3, 0.0, 6 / 120),
        ([2, 2, 1, 1, 0, 0], 6, [2, 1, 0, 0, 0, 0], 3, 0.0, 12 / 120),
    ],
)
def test_gamete_log_pmf_values(
    parent_dosage, parent_ploidy, gamete_dosage, gamete_ploidy, lambda_, expect
):
    got = K._gamete_log_pmf(
        jnp.asarray([gamete_dosage]),
        jnp.asarray(gamete_ploidy),
        jnp.asarray(parent_dosage),
        jnp.asarray(parent_ploidy),
        jnp.asarray(lambda_),
        jnp.asarray(K._COMB_LUT),
    )
    np.testing.assert_almost_equal(np.exp(float(got[0])), expect)


@pytest.mark.parametrize("tau_p,tau_q", [(2, 2), (1, 3)])
@pytest.mark.parametrize("errs", [(0.0, 0.0), (0.01, 0.01), (1.0, 0.5)])
@pytest.mark.parametrize("lams", [(0.0, 0.0), (0.2, 0.0)])
def test_trio_log_pmf_sums_to_one(tau_p, tau_q, errs, lams):
    """Sum over all progeny genotypes of the trio pmf must be 1 (the
    mixture of the four parental-validity branches is a distribution)."""
    if lams[0] > 0 and tau_p != 2:
        pytest.skip("lambda requires diploid gamete")
    maxp = tau_p + tau_q
    n_haps = 3
    rng = np.random.default_rng(0)
    parent_p = _pad(rng.integers(0, n_haps, 4), maxp)
    parent_q = _pad(rng.integers(0, n_haps, 4), maxp)
    log_freqs = jnp.log(jnp.asarray([0.5, 0.3, 0.2]))
    tables, valid = K.composition_tables(maxp)
    total = 0.0
    for progeny in enumerate_genotypes(n_haps, maxp):
        lp = K.trio_log_pmf(
            jnp.asarray(_pad(progeny, maxp)),
            jnp.asarray(parent_p),
            jnp.asarray(parent_q),
            jnp.asarray(4),
            jnp.asarray(4),
            jnp.asarray(tau_p),
            jnp.asarray(tau_q),
            jnp.asarray(lams[0]),
            jnp.asarray(lams[1]),
            jnp.asarray(errs[0]),
            jnp.asarray(errs[1]),
            log_freqs,
            jnp.asarray(tables),
            jnp.asarray(valid),
            jnp.asarray(K._COMB_LUT),
        )
        total += np.exp(float(lp))
    assert total == pytest.approx(1.0, rel=1e-8)


def test_duo_trio_valid():
    # progeny [0,0,1,1] from parents [0,0,1,1] x [0,0,1,1] with tau 2,2: valid
    progeny = np.array([[0, 0, 1, 1]])
    parent = np.array([[0, 0, 1, 1]])
    assert K.trio_valid(progeny, parent, parent, 2, 2, 0.0, 0.0)[0]
    # progeny [2,2,2,2] cannot derive from parents without allele 2
    bad = np.array([[2, 2, 2, 2]])
    assert not K.trio_valid(bad, parent, parent, 2, 2, 0.0, 0.0)[0]
    assert K.duo_valid(progeny, parent, 2, 0.0)[0]
    assert not K.duo_valid(bad, parent, 2, 0.0)[0]
    # double reduction rescues a duplicated allele that only one parent
    # carries (both copies must come from the same parental chromosome)
    progeny_dr = np.array([[1, 1, 0, 0]])
    single = np.array([[1, 0, 0, 0]])
    no_one = np.array([[0, 0, 0, 0]])
    assert not K.trio_valid(progeny_dr, single, no_one, 2, 2, 0.0, 0.0)[0]
    assert K.trio_valid(progeny_dr, single, no_one, 2, 2, 0.5, 0.0)[0]


def _exact_pedigree_posterior(sample_reads, sample_counts, ploidy, parents,
                              tau, lam, err, haplotypes, log_freqs):
    """Brute-force joint over all genotype combinations (oracle)."""
    n_samples = len(parents)
    n_haps = len(haplotypes)
    table = enumerate_genotypes(n_haps, ploidy)
    G = len(table)
    maxp = ploidy
    tables, valid = K.composition_tables(maxp)
    llks = np.stack(
        [
            np.asarray(
                genotype_likelihoods(
                    sample_reads[i], ploidy, haplotypes, sample_counts[i]
                )
            )
            for i in range(n_samples)
        ]
    )  # [S, G]

    def trio(i, combo):
        p, q = parents[i]
        has_p, has_q = p >= 0, q >= 0
        return float(
            K.trio_log_pmf(
                jnp.asarray(_pad(table[combo[i]], maxp)),
                jnp.asarray(_pad(table[combo[p]] if has_p else [], maxp)),
                jnp.asarray(_pad(table[combo[q]] if has_q else [], maxp)),
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
    joint_logs = []
    combos = list(itertools.product(range(G), repeat=n_samples))
    for combo in combos:
        lp = sum(llks[i, combo[i]] for i in range(n_samples))
        lp += sum(trio(i, combo) for i in range(n_samples))
        joint_logs.append(lp)
    joint = np.exp(np.array(joint_logs) - max(joint_logs))
    joint /= joint.sum()
    for idx, combo in enumerate(combos):
        for i in range(n_samples):
            marginals[i, combo[i]] += joint[idx]
    return marginals


@pytest.mark.parametrize("step_type", ["Gibbs", "Metropolis-Hastings"])
@pytest.mark.parametrize("swap", [True, False])
def test_pedigree_mcmc_matches_exact(swap, step_type):
    """Joint Gibbs/MH posterior ≈ exact enumeration for a diploid trio
    (reference implements both slot updates, pedigree/mcmc.py:15-142,
    dispatch at :240-306)."""
    ploidy = 2
    n_samples = 3
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    tau = np.full((3, 2), 1)
    lam = np.zeros((3, 2))
    err = np.full((3, 2), 0.01)
    truths = [HAPS[[0, 1]], HAPS[[1, 2]], HAPS[[0, 2]]]
    reads = []
    for i, t in enumerate(truths):
        reads.append(simulate_reads(t, n_alleles=2, n_reads=4, qual=(14, 18), seed=i))
    max_reads = max(len(r) for r in reads)
    sample_reads = np.full((n_samples, max_reads, 2, 2), np.nan)
    sample_counts = np.zeros((n_samples, max_reads))
    for i, r in enumerate(reads):
        sample_reads[i, : len(r)] = r
        sample_counts[i, : len(r)] = 1

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
        swap_parental_alleles=swap,
        step_type=step_type,
    )
    trace = model.fit(sample_reads, sample_counts).burn(500)

    log_freqs = np.log(np.full(3, 1 / 3))
    want = _exact_pedigree_posterior(
        sample_reads, sample_counts, ploidy, parents, tau, lam, err, HAPS, log_freqs
    )
    for i in range(n_samples):
        got = trace.individual(i).posterior().as_array(len(HAPS))
        np.testing.assert_allclose(got, want[i], atol=0.05)


def test_pedigree_incongruence_detects_impossible_child():
    """PEDERR ≈ 1 for a child whose alleles cannot derive from parents."""
    trace = np.zeros((1, 10, 3, 2), np.int16)
    trace[:, :, 0, :] = 0  # parent p: [0, 0]
    trace[:, :, 1, :] = 1  # parent q: [1, 1]
    trace[:, :, 2, :] = 2  # child: [2, 2] — impossible
    from mchap_tpu.models.pedigree import PedigreeAllelesMultiTrace

    t = PedigreeAllelesMultiTrace(trace, n_allele=3)
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    out = t.incongruence(
        np.full(3, 2), parents, np.full((3, 2), 1), np.zeros((3, 2))
    )
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0])


def test_chromatic_colors_biparental():
    """Bi-parental design: founders isolated, all progeny share a color."""
    n = 22
    parents = np.full((n, 2), -1, int)
    parents[2:] = [0, 1]
    colors = K.chromatic_colors(parents)
    assert sorted(map(tuple, colors)) == sorted(
        [(0,), (1,), tuple(range(2, n))]
    )


def test_chromatic_colors_are_valid():
    """No two same-color samples may share a Markov-blanket edge."""
    rng = np.random.default_rng(0)
    # three-generation pedigree with half-sibs and an unrelated sample
    parents = np.array(
        [
            [-1, -1],  # 0 founder
            [-1, -1],  # 1 founder
            [0, 1],    # 2
            [0, 1],    # 3 full sib of 2
            [-1, -1],  # 4 founder
            [2, 4],    # 5 grandchild
            [2, -1],   # 6 half-sib of 5 (single known parent)
            [-1, -1],  # 7 unrelated
        ]
    )
    colors = K.chromatic_colors(parents)
    assert sorted(i for c in colors for i in c) == list(range(len(parents)))
    # build the moral graph and check every color is an independent set
    n = len(parents)
    adj = np.zeros((n, n), bool)
    for i, (p, q) in enumerate(parents):
        for r in (p, q):
            if r >= 0:
                adj[i, r] = adj[r, i] = True
        if p >= 0 and q >= 0:
            adj[p, q] = adj[q, p] = True
    for c in colors:
        for a in c:
            for b in c:
                assert a == b or not adj[a, b]


def test_pedigree_f32_matches_f64_posterior(monkeypatch):
    """The f32 fast path (used on accelerators, where f64 is emulated)
    must reproduce the f64 reference-parity posterior."""
    ploidy = 2
    n_samples = 3
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

    def run(dtype_env):
        monkeypatch.setenv("MCHAP_PEDIGREE_DTYPE", dtype_env)
        model = PedigreeCallingMCMC(
            sample_ploidy=np.full(3, ploidy),
            sample_parents=parents,
            gamete_tau=tau,
            gamete_lambda=lam,
            gamete_error=err,
            haplotypes=HAPS,
            steps=2500,
            chains=2,
            random_seed=7,
        )
        trace = model.fit(sample_reads, sample_counts).burn(500)
        return np.stack(
            [
                trace.individual(i).posterior().as_array(len(HAPS))
                for i in range(n_samples)
            ]
        )

    p64 = run("f64")
    p32 = run("f32")
    np.testing.assert_allclose(p32, p64, atol=0.05)
