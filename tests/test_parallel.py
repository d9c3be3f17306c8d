"""Multi-chip execution of the real fit paths on the 8-device CPU mesh.

Sharding the (locus, sample) problem batch over a ``jax.sharding.Mesh``
is a placement decision only (parallel/sharding.py): every per-problem
program and PRNG key is unchanged, so sharded results must equal the
single-device run element-wise.  The population INFO reductions that the
reference computes in the parent process (baseclass.py:245-301) are
validated as psum collectives against the host formulas.
"""

import numpy as np
import jax
import pytest

from mchap_tpu.models.assemble import fit_denovo_multi
from mchap_tpu.models.calling import fit_calling_multi
from mchap_tpu.parallel.pools import (
    pooled_info_collectives,
    shard_pool_problems,
)
from mchap_tpu.parallel.sharding import problem_mesh, shard_problems
from mchap_tpu.testing import simulate_reads


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


def test_problem_mesh_respects_disable(monkeypatch):
    monkeypatch.setenv("MCHAP_SHARD", "0")
    assert problem_mesh(16) is None
    monkeypatch.setenv("MCHAP_SHARD", "auto")
    assert problem_mesh(16) is not None
    assert problem_mesh(1) is None


def test_shard_problems_pads_and_places():
    mesh = problem_mesh(3)
    n, a, b = shard_problems(
        mesh, 3, np.arange(6).reshape(3, 2), np.arange(3.0)
    )
    assert n == 8
    assert a.shape == (8, 2)
    # padding repeats the final row
    assert np.asarray(a)[3:].tolist() == [[4, 5]] * 5
    assert np.asarray(b)[-1] == 2.0
    # placed over all 8 devices
    assert len(a.sharding.device_set) == 8


def _calling_problems():
    haps1 = np.array([[0, 0, 0], [0, 1, 1], [1, 1, 1]], np.int8)
    haps2 = np.array([[0, 0], [1, 1], [0, 1], [1, 0]], np.int8)
    problems = []
    for i in range(5):
        haps = haps1 if i % 2 == 0 else haps2
        truth = haps[np.array([0, 1, 1, len(haps) - 1])]
        reads = simulate_reads(
            truth, n_alleles=2, n_reads=8 + 4 * i, errors=False, seed=i
        )
        problems.append(
            dict(reads=reads, counts=np.ones(len(reads)), haplotypes=haps)
        )
    return problems


def test_fit_calling_multi_sharded_matches_single_device(monkeypatch):
    problems = _calling_problems()
    monkeypatch.setenv("MCHAP_SHARD", "0")
    single = fit_calling_multi(problems, ploidy=4, steps=60, chains=2,
                               random_seed=11)
    monkeypatch.setenv("MCHAP_SHARD", "auto")
    sharded = fit_calling_multi(problems, ploidy=4, steps=60, chains=2,
                                random_seed=11)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.genotypes, b.genotypes)
        np.testing.assert_allclose(a.llks, b.llks, rtol=1e-12)


def test_fit_denovo_multi_sharded_matches_single_device(monkeypatch):
    truth1 = np.array([[0, 0], [0, 1], [1, 1], [0, 0]], np.int8)
    truth2 = np.array([[0, 1, 2], [0, 0, 0], [2, 1, 0], [0, 1, 2]], np.int8)
    problems = [
        dict(
            reads=simulate_reads(truth1, n_alleles=2, n_reads=10, errors=False,
                                 seed=1),
            counts=np.ones(10), n_alleles=[2, 2],
        ),
        dict(
            reads=simulate_reads(truth2, n_alleles=3, n_reads=8, errors=False,
                                 seed=2),
            counts=np.ones(8), n_alleles=[3, 2, 3],
        ),
        dict(
            reads=simulate_reads(truth1, n_alleles=2, n_reads=14, errors=False,
                                 seed=3),
            counts=np.ones(14), n_alleles=[2, 2],
        ),
    ]
    monkeypatch.setenv("MCHAP_SHARD", "0")
    single = fit_denovo_multi(problems, ploidy=4, steps=40, chains=2,
                              random_seed=5)
    monkeypatch.setenv("MCHAP_SHARD", "auto")
    sharded = fit_denovo_multi(problems, ploidy=4, steps=40, chains=2,
                               random_seed=5)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.genotypes, b.genotypes)
        np.testing.assert_allclose(a.llks, b.llks, rtol=1e-12)


class _MultiControllerJax:
    """Proxy for the ``jax`` module that reports >1 processes.

    Confines the fake to parallel/sharding.py so the real jax runtime
    (still single-process) is untouched; everything else delegates.

    Invariant the proxy maintains: it presents a *self-consistent*
    process-0-of-n view — ``process_count() == n`` while
    ``process_index() == 0`` — so any future use of process-identity
    APIs in sharding.py sees coherent values rather than the real
    runtime's single-process answers leaking through.
    """

    def __init__(self, real, n=2):
        self._real = real
        self._n = n

    def process_count(self):
        return self._n

    def process_index(self):
        return 0

    def __getattr__(self, name):
        return getattr(self._real, name)


def test_shard_problems_multicontroller_branch(monkeypatch):
    """The multi-controller assembly path (make_array_from_callback from
    per-process addressable shards) must produce the same global array
    as the single-controller device_put path."""
    import mchap_tpu.parallel.sharding as sharding_mod

    mesh = problem_mesh(5)
    data = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    n1, placed1 = shard_problems(mesh, 5, data)

    monkeypatch.setattr(sharding_mod, "jax", _MultiControllerJax(jax))
    n2, placed2 = shard_problems(mesh, 5, data)

    assert n1 == n2 == 8
    np.testing.assert_array_equal(np.asarray(placed1), np.asarray(placed2))
    assert placed2.sharding == placed1.sharding
    assert len(placed2.sharding.device_set) == 8


def test_gather_result_multicontroller_branch(monkeypatch):
    """gather_result's cross-host all-gather branch returns the full
    array (trivially, with one real process) instead of raising.

    Known coverage gap: only the sharding module sees the faked
    process_count; ``multihost_utils.process_allgather`` still runs
    against the real single-process runtime, so the genuinely
    non-fully-addressable cross-host case cannot be exercised on this
    rig — it needs a real ``jax.distributed`` two-process launch (see
    scripts/launch_multihost.py for the documented procedure)."""
    import mchap_tpu.parallel.sharding as sharding_mod
    from mchap_tpu.parallel.sharding import gather_result

    mesh = problem_mesh(4)
    _, placed = shard_problems(mesh, 8, np.arange(8.0))
    expect = np.asarray(placed)

    monkeypatch.setattr(sharding_mod, "jax", _MultiControllerJax(jax))
    got = gather_result(placed)
    np.testing.assert_array_equal(got, expect)


def test_pallas_denovo_shard_map_matches_single_device():
    """The de novo pallas fast path composed with shard_map over the
    lane mesh (the exact multi-chip program) equals the single-device
    launch element-wise.  Interpret mode: the kernel interpreter is
    deterministic, so placement cannot change results."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mchap_tpu.models.assemble import _fit_denovo_batch_pallas
    from mchap_tpu.ops.likelihood import prepare_reads

    ploidy, nb, n_a = 4, 3, 2
    rng = np.random.default_rng(0)
    n_samples, chains, steps = 3, 2, 3
    truths = rng.integers(0, n_a, size=(n_samples, ploidy, nb)).astype(np.int8)
    reads = np.stack(
        [
            simulate_reads(t, n_alleles=n_a, n_reads=8, errors=False, seed=i)
            for i, t in enumerate(truths)
        ]
    )
    counts = np.ones((n_samples, reads.shape[1]))
    log_reads = np.asarray(prepare_reads(reads, dtype=jnp.float32))
    init = rng.integers(
        0, n_a, size=(n_samples, chains, ploidy, nb)
    ).astype(np.int32)
    nall = np.full((n_samples, nb), n_a, np.int32)
    break_dist = np.zeros((n_samples, nb))
    break_dist[:, 0] = 1.0
    kwargs = dict(
        seed=7, p_recomb=0.5, p_partial=0.5, p_full=1.0, interpret=True
    )
    single = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, ploidy, steps, chains,
        mesh=None, **kwargs
    )
    # 2-device mesh keeps the interpret-mode lane count (and runtime)
    # small while still exercising sharded specs + per-device seeds
    mesh = Mesh(np.array(jax.devices()[:2]), ("lanes",))
    sharded = _fit_denovo_batch_pallas(
        log_reads, counts, init, nall, break_dist, ploidy, steps, chains,
        mesh=mesh, **kwargs
    )
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.genotypes, b.genotypes)
        np.testing.assert_allclose(a.llks, b.llks, rtol=1e-6)


def test_pallas_calling_shard_map_matches_single_device():
    """The calling pallas fast path composed with shard_map over the
    lane mesh equals the single-device launch element-wise."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mchap_tpu.models.calling import _fit_batch_pallas
    from mchap_tpu.ops.likelihood import prepare_reads, read_hap_loglik

    ploidy, nb, n_a = 4, 3, 2
    panel = np.array([[0, 0, 0], [0, 1, 1], [1, 1, 0]], np.int8)
    rng = np.random.default_rng(1)
    n_samples, chains, steps = 3, 2, 3
    reads = np.stack(
        [
            simulate_reads(
                panel[rng.integers(0, len(panel), ploidy)],
                n_alleles=n_a, n_reads=8, errors=False, seed=i,
            )
            for i in range(n_samples)
        ]
    )
    counts = np.ones((n_samples, reads.shape[1]))
    rh = read_hap_loglik(prepare_reads(reads), jnp.asarray(panel))
    counts_j = jnp.asarray(counts, rh.dtype)
    single = _fit_batch_pallas(
        np.asarray(rh), counts_j, ploidy, steps, chains, 7, len(panel),
        mesh=None, interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("lanes",))
    sharded = _fit_batch_pallas(
        np.asarray(rh), counts_j, ploidy, steps, chains, 7, len(panel),
        mesh=mesh, interpret=True,
    )
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.genotypes, b.genotypes)
        np.testing.assert_allclose(a.llks, b.llks, rtol=1e-6)


def test_pooled_info_collectives_match_host_formulas():
    """psum pooling == the reference's parent-process reductions
    (elementwise sums; AOP as 1 - prod(1 - p); baseclass.py:245-301)."""
    rng = np.random.default_rng(0)
    # 13 problems: NOT a mesh multiple, so pool padding must be inert
    n_problems, n_loci, k = 13, 3, 5
    locus_ids = rng.integers(0, n_loci, n_problems).astype(np.int32)
    acp = rng.uniform(0, 4, (n_problems, k))
    aop = rng.uniform(0, 1, (n_problems, k))
    snvdp = rng.integers(0, 50, (n_problems, k)).astype(float)

    mesh = problem_mesh(n_problems)
    assert mesh is not None
    step = pooled_info_collectives(mesh, n_loci)
    ids_s, acp_s, aop_s, snvdp_s = shard_pool_problems(
        mesh, n_problems, n_loci, locus_ids, acp, aop, snvdp
    )
    got_acp, got_aopsum, got_aop, got_snvdp = [
        np.asarray(x) for x in step(ids_s, acp_s, aop_s, snvdp_s)
    ]

    for locus in range(n_loci):
        sel = locus_ids == locus
        np.testing.assert_allclose(got_acp[locus], acp[sel].sum(0), rtol=1e-9)
        np.testing.assert_allclose(
            got_aopsum[locus], aop[sel].sum(0), rtol=1e-9
        )
        np.testing.assert_allclose(
            got_aop[locus], 1 - np.prod(1 - aop[sel], axis=0), rtol=1e-6
        )
        np.testing.assert_allclose(
            got_snvdp[locus], snvdp[sel].sum(0), rtol=1e-9
        )


def test_fit_pedigree_multi_sharded_matches_single_device(monkeypatch):
    """Placement must not change pedigree results: the XLA pedigree fit
    path sharded over the 8-virtual-device "loci" mesh reproduces the
    single-device traces element-wise (the pedigree analogue of the
    calling/denovo A/B above; reference process-parallelism is uniform
    across tools, baseclass.py:360-394)."""
    from mchap_tpu.models.pedigree import fit_pedigree_multi
    from mchap_tpu.testing import simulate_reads

    haps = np.array([[0, 0], [0, 1], [1, 1]], np.int8)
    parents = np.array([[-1, -1], [-1, -1], [0, 1]])
    rng = np.random.default_rng(5)
    problems = []
    for i in range(5):
        truths = haps[rng.integers(0, len(haps), (3, 2))]
        reads = np.stack(
            [
                simulate_reads(
                    haps[rng.integers(0, len(haps), 2)], n_alleles=2,
                    n_reads=6, errors=False, seed=10 * i + j,
                )
                for j in range(3)
            ]
        )
        problems.append(
            dict(
                sample_reads=reads,
                sample_read_counts=np.ones((3, reads.shape[1]), int),
                haplotypes=haps,
            )
        )
    kwargs = dict(
        sample_ploidy=np.full(3, 2),
        sample_parents=parents,
        gamete_tau=np.full((3, 2), 1),
        gamete_lambda=np.zeros((3, 2)),
        gamete_error=np.full((3, 2), 0.01),
        steps=20,
        chains=2,
        random_seed=11,
    )
    monkeypatch.setenv("MCHAP_SHARD", "0")
    single = fit_pedigree_multi(problems, **kwargs)
    monkeypatch.setenv("MCHAP_SHARD", "auto")
    sharded = fit_pedigree_multi(problems, **kwargs)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a.genotypes, b.genotypes)
