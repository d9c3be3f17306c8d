"""Real multi-controller SPMD integration test (2 local CPU processes).

Unlike the monkeypatched process_count fakes in test_parallel.py, this
launches TWO actual processes connected via ``jax.distributed``: the
global mesh spans both processes' devices, ``shard_problems``'
make_array_from_callback path assembles arrays from per-process
addressable shards, ``gather_result`` all-gathers across hosts, and
only process 0 claims output duty (mchap_tpu/parallel/distributed.py).
Their results must agree with each other AND with an in-process
single-device run (placement cannot change results).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_two_process_distributed_fit_matches_single_device(monkeypatch):
    from launch_multihost import launch_smoke

    results = launch_smoke(port=29519)

    # identical problems, single process, sharding disabled
    monkeypatch.setenv("MCHAP_SHARD", "0")
    from mchap_tpu.models.calling import fit_calling_multi
    from mchap_tpu.testing import simulate_reads

    haps = np.array([[0, 0, 0], [0, 1, 1], [1, 1, 1]], np.int8)
    problems = []
    for i in range(5):
        reads = simulate_reads(
            haps[np.array([0, 1, 1, 2])], n_alleles=2, n_reads=8,
            errors=False, seed=i,
        )
        problems.append(
            dict(reads=reads, counts=np.ones(len(reads)), haplotypes=haps)
        )
    traces = fit_calling_multi(
        problems, ploidy=4, steps=20, chains=2, random_seed=3
    )
    for i, t in enumerate(traces):
        np.testing.assert_array_equal(results[f"g{i}"], t.genotypes)


def test_maybe_initialize_parses_spec(monkeypatch):
    """Spec parsing + idempotence, with the initialize call mocked (the
    real two-process path is covered by the test above)."""
    import mchap_tpu.parallel.distributed as dist

    calls = []

    class _FakeDistributed:
        @staticmethod
        def initialize(**kwargs):
            calls.append(kwargs)

    class _FakeJax:
        distributed = _FakeDistributed()

    monkeypatch.setitem(sys.modules, "jax", sys.modules["jax"])
    monkeypatch.setattr(dist, "_initialized", False)
    monkeypatch.setenv("MCHAP_DISTRIBUTED", "node0:8476,4,2")
    real_jax = sys.modules["jax"]
    try:
        sys.modules["jax"] = _FakeJax()
        assert dist.maybe_initialize()
        assert calls == [
            dict(
                coordinator_address="node0:8476",
                num_processes=4,
                process_id=2,
            )
        ]
        # idempotent: a second call does not re-initialize
        assert dist.maybe_initialize()
        assert len(calls) == 1
    finally:
        sys.modules["jax"] = real_jax
        dist._initialized = False

    monkeypatch.setenv("MCHAP_DISTRIBUTED", "garbage-spec")
    try:
        sys.modules["jax"] = _FakeJax()
        with pytest.raises(ValueError):
            dist.maybe_initialize()
    finally:
        sys.modules["jax"] = real_jax
        dist._initialized = False


def test_maybe_initialize_disabled_by_default(monkeypatch):
    import mchap_tpu.parallel.distributed as dist

    monkeypatch.delenv("MCHAP_DISTRIBUTED", raising=False)
    assert not dist.maybe_initialize()
    monkeypatch.setenv("MCHAP_DISTRIBUTED", "0")
    assert not dist.maybe_initialize()


def test_is_output_process_single_controller():
    from mchap_tpu.parallel.distributed import is_output_process

    assert is_output_process()
