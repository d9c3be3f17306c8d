"""Cross-locus de novo batching: fit_denovo_multi + the assemble tool's
MCHAP_LOCUS_BATCH block streaming (models/assemble.py, application/
assemble.py).  The reference parallelises the locus axis with one
process per locus block (baseclass.py:360-394); here heterogeneous
(locus, sample) problems pad into one device program."""

import numpy as np
import pytest

import mchap_tpu.application.assemble as app_assemble
import mchap_tpu.models.assemble as ma
from mchap_tpu.models.assemble import fit_denovo_batch, fit_denovo_multi
from mchap_tpu.testing import simulate_reads
from tests.golden import data_path, run_stdout_lines


def _problem(truth, n_alleles, n_reads, seed):
    reads = simulate_reads(
        truth, n_alleles=max(n_alleles), n_reads=n_reads, errors=False,
        seed=seed,
    )
    return dict(
        reads=reads, counts=np.ones(len(reads)), n_alleles=list(n_alleles)
    )


def test_multi_heterogeneous_shapes_and_slicing():
    """Problems with different nb/A/R pad into one launch and slice back."""
    p1 = _problem(np.array([[0, 0], [0, 1], [1, 1], [0, 0]], np.int8),
                  [2, 2], 12, 1)
    p2 = _problem(np.array([[0, 1, 2], [0, 0, 0], [2, 1, 0], [0, 1, 2]],
                           np.int8), [3, 2, 3], 6, 2)
    p3 = dict(reads=np.zeros((0, 1, 2)), counts=np.zeros(0), n_alleles=[2])
    traces = fit_denovo_multi([p1, p2, p3], ploidy=4, steps=40, chains=2,
                              random_seed=3)
    assert traces[0].genotypes.shape == (2, 40, 4, 2)
    assert traces[1].genotypes.shape == (2, 40, 4, 3)
    assert traces[2].genotypes.shape == (2, 40, 4, 1)
    # alleles never exceed each problem's per-position allele counts
    for tr, na in zip(traces, ([2, 2], [3, 2, 3], [2])):
        for j, n in enumerate(na):
            assert tr.genotypes[..., j].max() < n
    # zero-read problem is uninformative but valid
    assert np.isfinite(traces[1].llks).all()


def test_multi_buckets_by_padded_shape(monkeypatch):
    """Heterogeneous blocks split into padded-shape buckets (one device
    program each) so a triallelic or deep locus doesn't drag biallelic /
    shallow loci to its shape; problem order is restored."""
    calls = []
    orig = ma._fit_denovo_core

    def spy(reads, counts, n_alleles_mat, *args, **kwargs):
        calls.append(reads.shape)
        return orig(reads, counts, n_alleles_mat, *args, **kwargs)

    monkeypatch.setattr(ma, "_fit_denovo_core", spy)
    small = _problem(np.array([[0, 0], [0, 1], [1, 1], [0, 0]], np.int8),
                     [2, 2], 6, 1)
    big = _problem(np.array([[0, 1, 2], [0, 0, 0], [2, 1, 0], [0, 1, 2]],
                            np.int8), [3, 2, 3], 30, 2)
    small2 = _problem(np.array([[0, 1], [0, 1], [1, 0], [0, 0]], np.int8),
                      [2, 2], 7, 3)
    traces = fit_denovo_multi([small, big, small2], ploidy=4, steps=30,
                              chains=2, random_seed=3)
    # two buckets split on the allele radix (the axis that changes the
    # kernel's math); reads pad to the shared 64 floor and positions to
    # a multiple of 8 (stable compiled shapes across blocks — the
    # coarse-bucket policy keeps device-program compiles rare)
    assert len(calls) == 2
    shapes = sorted(calls, key=lambda s: s[3])
    assert shapes[0][0] == 2 and shapes[0][1] == 64 and shapes[0][3] == 2
    assert shapes[1][0] == 1 and shapes[1][1] == 64 and shapes[1][3] == 3
    # order restored, position counts sliced per problem
    assert traces[0].genotypes.shape[-1] == 2
    assert traces[1].genotypes.shape[-1] == 3
    assert traces[2].genotypes.shape[-1] == 2
    assert traces[1].genotypes.max() <= 2
    assert max(traces[0].genotypes.max(), traces[2].genotypes.max()) <= 1


def test_multi_matches_batch_posterior_mode():
    """On identical high-depth problems the multi path's posterior mode
    agrees with fit_denovo_batch (same target distribution)."""
    truth = np.array([[0, 0], [0, 1], [1, 1], [0, 0]], np.int8)
    reads = simulate_reads(truth, n_alleles=2, n_reads=40, errors=False,
                           seed=5)
    counts = np.ones(len(reads))
    batch = fit_denovo_batch(4, [2, 2], [reads], [counts], steps=150,
                             chains=2, random_seed=7)
    multi = fit_denovo_multi(
        [dict(reads=reads, counts=counts, n_alleles=[2, 2])], 4, steps=150,
        chains=2, random_seed=7,
    )
    mode_b, prob_b = batch[0].burn(50).posterior().mode()
    mode_m, prob_m = multi[0].burn(50).posterior().mode()
    np.testing.assert_array_equal(mode_b, mode_m)
    assert abs(prob_b - prob_m) < 0.15


@pytest.mark.parametrize("block", [2, 8])
def test_assemble_block_mode_matches_golden_decisions(monkeypatch, block):
    monkeypatch.setenv("MCHAP_LOCUS_BATCH", str(block))
    calls = {"n": 0}
    orig = ma.fit_denovo_multi

    def spy(*args, **kwargs):
        calls["n"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(app_assemble, "fit_denovo_multi", spy)
    command = (
        ["mchap", "assemble", "--bam"]
        + [
            data_path(b)
            for b in [
                "simple.sample1.bam",
                "simple.sample2.bam",
                "simple.sample3.bam",
            ]
        ]
        + [
            "--ploidy", "4",
            "--targets", data_path("simple.bed"),
            "--variants", data_path("simple.vcf.gz"),
            "--reference", data_path("simple.fasta"),
            "--mcmc-seed", "11",
            "--mcmc-steps", "500",
            "--mcmc-burn", "100",
        ]
    )
    prog = app_assemble.program.cli(command)
    lines = run_stdout_lines(prog)
    assert calls["n"] >= 1, "block path not taken"
    with open(data_path("simple.output.assemble.vcf")) as f:
        golden = f.readlines()
    recs = [ln.split("\t") for ln in lines if not ln.startswith("#")]
    wants = [ln.split("\t") for ln in golden if not ln.startswith("#")]
    assert len(recs) == len(wants)
    for rec, want in zip(recs, wants):
        assert rec[:5] == want[:5]
        for cell, want_cell in zip(rec[9:], want[9:]):
            assert cell.split(":")[0] == want_cell.split(":")[0]  # GT
