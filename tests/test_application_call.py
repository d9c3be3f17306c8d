"""Application tests for ``mchap call`` (MCMC).

The reference goldens encode numba-RNG-specific sampler trajectories, so
byte equality is impossible by construction; instead (per SURVEY.md §7.3
hard part #1) the *decisions* must match: GT calls, INFO reductions
derived from them (AC/AN/UAN/NS), filters, and allele sequences — while
stochastic posterior summaries (GQ/GPM/SPM/SQ/MECP) must be close.
"""

import pytest

from mchap_tpu.application.call import program
from tests.golden import data_path, run_stdout_lines


def _split_records(lines):
    header = [ln for ln in lines if ln.startswith("#")]
    records = [ln.rstrip("\n").split("\t") for ln in lines if not ln.startswith("#")]
    return header, records


def _gt_calls(records):
    return [[cell.split(":")[0] for cell in rec[9:]] for rec in records]


@pytest.mark.parametrize(
    "input_vcf,bams,cli_extra,output_vcf",
    [
        (
            "simple.output.assemble.vcf",
            ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"],
            [],
            "simple.output.call.vcf",
        ),
        (
            "simple.output.assemble.vcf",
            [
                "simple.sample1.broken.cram",
                "simple.sample2.broken.cram",
                "simple.sample3.broken.cram",
            ],
            ["--reference", data_path("simple.fasta")],
            "simple.output.call.vcf",  # identical results from bam/cram
        ),
        (
            "simple.output.assemble.vcf",
            [
                "simple.sample1.deep.bam",
                "simple.sample2.deep.bam",
                "simple.sample3.deep.bam",
            ],
            [
                "--ploidy", data_path("simple.pools-ploidy"),
                "--sample-pool", data_path("simple.pools"),
            ],
            "simple.output.deep.call.pools.vcf",
        ),
    ],
)
def test_call_decisions_match_golden(input_vcf, bams, cli_extra, output_vcf):
    command = (
        ["mchap", "call", "--bam"]
        + [data_path(b) for b in bams]
        + ["--ploidy", "4", "--haplotypes", data_path(input_vcf)]
        + ["--mcmc-seed", "11", "--mcmc-steps", "500", "--mcmc-burn", "100"]
        + cli_extra
    )
    prog = program.cli(command)
    lines = run_stdout_lines(prog)
    with open(data_path(output_vcf)) as f:
        golden = f.readlines()

    header, records = _split_records(lines)
    golden_header, golden_records = _split_records(golden)
    assert len(records) == len(golden_records)

    for rec, want in zip(records, golden_records):
        # fixed columns must match exactly
        assert rec[:5] == want[:5]  # CHROM POS ID REF ALT
        assert rec[6] == want[6]  # FILTER
        assert rec[8] == want[8]  # FORMAT keys
        # GT decisions must match exactly
        assert _gt_calls([rec]) == _gt_calls([want])
        # INFO reductions that derive from GT must match
        info = dict(kv.split("=") for kv in rec[7].split(";") if "=" in kv)
        want_info = dict(kv.split("=") for kv in want[7].split(";") if "=" in kv)
        for key in ("AN", "UAN", "AC", "NS", "DP", "RCOUNT", "END", "NVAR", "SNVPOS"):
            assert info.get(key) == want_info.get(key), key
        # stochastic posterior summaries must be close
        fmt_keys = rec[8].split(":")
        for cell, want_cell in zip(rec[9:], want[9:]):
            got_vals = dict(zip(fmt_keys, cell.split(":")))
            want_vals = dict(zip(fmt_keys, want_cell.split(":")))
            for key in ("GPM", "SPM"):
                g, w = got_vals[key], want_vals[key]
                if g == "." or w == ".":
                    assert g == w
                else:
                    assert abs(float(g) - float(w)) < 0.1, (key, g, w)
            # deterministic per-sample stats match exactly
            for key in ("DP", "RCOUNT", "RCALLS", "MEC"):
                assert got_vals[key] == want_vals[key], key


def test_call_header_matches_golden():
    command = (
        ["mchap", "call", "--bam"]
        + [data_path(b) for b in
           ("simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam")]
        + ["--ploidy", "4", "--haplotypes", data_path("simple.output.assemble.vcf")]
        + ["--mcmc-seed", "11", "--mcmc-steps", "100", "--mcmc-burn", "50"]
    )
    prog = program.cli(command)
    lines = run_stdout_lines(prog)
    with open(data_path("simple.output.call.vcf")) as f:
        golden = f.readlines()
    header = [ln for ln in lines if ln.startswith("##")]
    golden_header = [ln for ln in golden if ln.startswith("##")]
    for act, exp in zip(header, golden_header):
        if act.split("=")[0] in ("##commandline", "##source", "##fileDate", "##randomseed"):
            assert exp.startswith(act.split("=")[0])
        else:
            assert act == exp


def test_call_locus_batching_matches_per_locus(monkeypatch):
    """MCHAP_LOCUS_BATCH>1 batches (locus, sample) problems across loci
    into one device program per block; decisions must match the
    per-locus path (padding columns are -inf so unsampleable)."""
    command = (
        ["mchap", "call", "--bam"]
        + [data_path(b) for b in
           ("simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam")]
        + ["--ploidy", "4", "--haplotypes", data_path("simple.output.assemble.vcf")]
        + ["--mcmc-seed", "11", "--mcmc-steps", "500", "--mcmc-burn", "100"]
    )
    monkeypatch.delenv("MCHAP_LOCUS_BATCH", raising=False)
    base = run_stdout_lines(program.cli(command))
    monkeypatch.setenv("MCHAP_LOCUS_BATCH", "3")
    blocked = run_stdout_lines(program.cli(command))

    _, base_records = _split_records(base)
    _, blocked_records = _split_records(blocked)
    assert len(blocked_records) == len(base_records)
    for rec, want in zip(blocked_records, base_records):
        assert rec[:7] == want[:7]  # CHROM..FILTER identical
        assert _gt_calls([rec]) == _gt_calls([want])
        info = dict(kv.split("=") for kv in rec[7].split(";") if "=" in kv)
        want_info = dict(kv.split("=") for kv in want[7].split(";") if "=" in kv)
        for key in ("AN", "UAN", "AC", "NS", "DP", "RCOUNT"):
            assert info.get(key) == want_info.get(key), key
        fmt_keys = rec[8].split(":")
        for cell, want_cell in zip(rec[9:], want[9:]):
            got_vals = dict(zip(fmt_keys, cell.split(":")))
            want_vals = dict(zip(fmt_keys, want_cell.split(":")))
            for key in ("GPM", "SPM"):
                g, w = got_vals[key], want_vals[key]
                if g == "." or w == ".":
                    assert g == w
                else:
                    assert abs(float(g) - float(w)) < 0.1, (key, g, w)
            for key in ("DP", "RCOUNT", "RCALLS", "MEC"):
                assert got_vals[key] == want_vals[key], key
