"""Application tests for ``mchap assemble`` (MCMC, decision-level golden
comparison — see test_application_call.py for the rationale)."""

import pytest

from mchap_tpu.application.assemble import program
from tests.golden import data_path, run_stdout_lines


@pytest.mark.parametrize(
    "bams,cli_extra,output_vcf",
    [
        (
            ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"],
            [],
            "simple.output.assemble.vcf",
        ),
        (
            [
                "simple.sample1.broken.cram",
                "simple.sample2.broken.cram",
                "simple.sample3.broken.cram",
            ],
            [],
            "simple.output.assemble.vcf",  # identical results from bam/cram
        ),
        (
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            [],
            "simple.output.mixed_depth.assemble.vcf",
        ),
        (
            [
                "simple.sample1.deep.bam",
                "simple.sample2.deep.bam",
                "simple.sample3.deep.bam",
            ],
            [],
            "simple.output.deep.assemble.vcf",
        ),
    ],
)
def test_assemble_decisions_match_golden(bams, cli_extra, output_vcf):
    command = (
        ["mchap", "assemble", "--bam"]
        + [data_path(b) for b in bams]
        + [
            "--ploidy", "4",
            "--targets", data_path("simple.bed"),
            "--variants", data_path("simple.vcf.gz"),
            "--reference", data_path("simple.fasta"),
            "--mcmc-seed", "11",
            "--mcmc-steps", "500",
            "--mcmc-burn", "100",
        ]
        + cli_extra
    )
    prog = program.cli(command)
    lines = run_stdout_lines(prog)
    with open(data_path(output_vcf)) as f:
        golden = f.readlines()

    records = [ln.rstrip("\n").split("\t") for ln in lines if not ln.startswith("#")]
    golden_records = [
        ln.rstrip("\n").split("\t") for ln in golden if not ln.startswith("#")
    ]
    assert len(records) == len(golden_records)
    for rec, want in zip(records, golden_records):
        # CHROM POS ID REF ALT FILTER: the discovered alleles must match
        assert rec[:5] == want[:5]
        assert rec[6] == want[6]
        # INFO reductions derived from genotype decisions
        info = dict(kv.split("=") for kv in rec[7].split(";") if "=" in kv)
        want_info = dict(kv.split("=") for kv in want[7].split(";") if "=" in kv)
        for key in ("AN", "UAN", "AC", "NS", "DP", "RCOUNT", "END", "NVAR", "SNVPOS"):
            assert info.get(key) == want_info.get(key), key
        # GT decisions
        fmt_keys = rec[8].split(":")
        for cell, want_cell in zip(rec[9:], want[9:]):
            got_vals = dict(zip(fmt_keys, cell.split(":")))
            want_vals = dict(zip(want[8].split(":"), want_cell.split(":")))
            assert got_vals["GT"] == want_vals["GT"]
            for key in ("DP", "RCOUNT", "RCALLS", "MEC"):
                assert got_vals[key] == want_vals[key], key


# ---------------------------------------------------------------------------
# Support-level golden comparisons for NON-DECISIVE configurations.
#
# The decision-level tests above use fixtures whose posteriors are
# decisive, so a correct sampler must reproduce the reference's exact
# calls (SURVEY §7.3).  The configurations below are deliberately not:
# a 12-ploid superpool's dosage has near-tied alternatives, and a
# single mixed-depth pool's allele weights are close enough that the
# ALT emission order (descending pooled weight) can swap under a
# different RNG.  For these the meaningful invariant is the SUPPORT —
# which alleles are discovered and which each sample carries — compared
# under ALT relabeling, plus the dosage-independent INFO fields.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "bams,cli_extra,output_vcf",
    [
        # per-pool ploidy file incl. a 12-ploid superpool
        # (reference test_application_assemble.py:338-353)
        (
            [
                "simple.sample1.deep.bam",
                "simple.sample2.deep.bam",
                "simple.sample3.deep.bam",
            ],
            [
                "--use-dirmul-prior", "0.0",
                "--ploidy", data_path("simple.pools-ploidy"),
                "--sample-pool", data_path("simple.pools"),
            ],
            "simple.output.deep.assemble.pools.vcf",
        ),
        # single-pool mode with reported allele frequencies
        # (reference test_application_assemble.py:313-324)
        (
            ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
            [
                "--use-dirmul-prior", "0.0",
                "--sample-pool", "POOL",
                "--report", "AFP",
            ],
            "simple.output.mixed_depth.assemble.pool.frequencies.vcf",
        ),
    ],
)
def test_assemble_pools_support_matches_golden(bams, cli_extra, output_vcf):
    command = (
        ["mchap", "assemble", "--bam"]
        + [data_path(b) for b in bams]
        + [
            "--ploidy", "4",
            "--targets", data_path("simple.bed"),
            "--variants", data_path("simple.vcf.gz"),
            "--reference", data_path("simple.fasta"),
            "--mcmc-seed", "11",
            "--mcmc-steps", "500",
            "--mcmc-burn", "100",
        ]
        + cli_extra
    )
    prog = program.cli(command)
    lines = run_stdout_lines(prog)
    with open(data_path(output_vcf)) as f:
        golden = f.readlines()

    records = [ln.rstrip("\n").split("\t") for ln in lines if not ln.startswith("#")]
    golden_records = [
        ln.rstrip("\n").split("\t") for ln in golden if not ln.startswith("#")
    ]
    assert len(records) == len(golden_records)
    for rec, want in zip(records, golden_records):
        assert rec[:4] == want[:4]  # CHROM POS ID REF
        assert rec[6] == want[6]  # FILTER
        # ALT as a SET (emission order ranks near-tied pooled weights)
        alts = rec[4].split(",") if rec[4] != "." else []
        want_alts = want[4].split(",") if want[4] != "." else []
        assert sorted(alts) == sorted(want_alts)
        # allele-index remap: ours -> golden (0 = REF maps to 0)
        remap = {0: 0}
        for i, a in enumerate(alts, start=1):
            remap[i] = want_alts.index(a) + 1
        # dosage-independent INFO
        info = dict(kv.split("=") for kv in rec[7].split(";") if "=" in kv)
        want_info = dict(kv.split("=") for kv in want[7].split(";") if "=" in kv)
        for key in ("AN", "NS", "DP", "RCOUNT", "END", "NVAR", "SNVPOS"):
            assert info.get(key) == want_info.get(key), key
        # per-sample allele SUPPORT under the remap, for calls the
        # REFERENCE itself made decisively (its GPM >= 0.7).  The deep
        # pools fixture contains one genuinely bimodal call (POOL13 at
        # CHR2: GPM = 0.5 with each chain locked to a different mode,
        # MCI flagged) whose mode choice is a literal coin flip between
        # RNGs — no support requirement is meaningful there.
        fmt_keys = rec[8].split(":")
        for cell, want_cell in zip(rec[9:], want[9:]):
            got_vals = dict(zip(fmt_keys, cell.split(":")))
            want_vals = dict(zip(want[8].split(":"), want_cell.split(":")))
            want_gpm = float(want_vals["GPM"]) if want_vals["GPM"] != "." else 1.0
            got_support = {
                remap[int(a)]
                for a in got_vals["GT"].split("/")
                if a != "."
            }
            want_support = {
                int(a) for a in want_vals["GT"].split("/") if a != "."
            }
            if want_gpm >= 0.7:
                assert got_support == want_support
            for key in ("DP", "RCOUNT", "RCALLS"):
                assert got_vals[key] == want_vals[key], key


def test_assemble_nullallele_flags_smoke():
    """The threshold-1.0 partial-call configuration with phred-derived
    error rates (reference test_application_assemble.py:326-337) is a
    deliberately non-decisive posterior regime — allele discovery there
    legitimately diverges between RNGs, so this exercises the flag path
    (null-allele padding, --use-base-phred-scores, --base-error-rate 0)
    and pins the structural record surface only."""
    command = (
        ["mchap", "assemble", "--bam"]
        + [
            data_path(b)
            for b in (
                "simple.sample1.bam",
                "simple.sample2.bam",
                "simple.sample3.bam",
            )
        ]
        + [
            "--ploidy", "4",
            "--targets", data_path("simple.bed"),
            "--variants", data_path("simple.vcf.gz"),
            "--reference", data_path("simple.fasta"),
            "--mcmc-seed", "11",
            "--mcmc-steps", "500",
            "--mcmc-burn", "100",
            "--use-dirmul-prior", "0.0",
            "--haplotype-posterior-threshold", "1.0",
            "--base-error-rate", "0.0",
            "--use-base-phred-scores",
        ]
    )
    prog = program.cli(command)
    lines = run_stdout_lines(prog)
    with open(data_path("simple.output.nullallele.assemble.vcf")) as f:
        golden = f.readlines()
    records = [ln.rstrip("\n").split("\t") for ln in lines if not ln.startswith("#")]
    golden_records = [
        ln.rstrip("\n").split("\t") for ln in golden if not ln.startswith("#")
    ]
    assert len(records) == len(golden_records)
    null_calls = 0
    for rec, want in zip(records, golden_records):
        assert rec[:4] == want[:4]
        assert rec[8].split(":")[0] == "GT"
        null_calls += sum("." in cell.split(":")[0] for cell in rec[9:])
    # threshold 1.0 must actually produce partial (null-padded) calls
    assert null_calls > 0
