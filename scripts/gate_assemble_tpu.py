"""End-to-end golden-decision gate for `mchap assemble` ON the TPU.

Runs the assemble pipeline on the bundled fixtures with the default
backend (TPU -> the full-step pallas de novo kernel is auto-selected)
and applies the same decision-level comparison as
tests/test_application_assemble.py against the reference golden VCFs.

Usage: python scripts/gate_assemble_tpu.py [quick]
"""

import sys

sys.path.insert(0, "/root/repo")

CONFIGS = [
    (
        ["simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam"],
        "simple.output.assemble.vcf",
    ),
    (
        ["simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam"],
        "simple.output.mixed_depth.assemble.vcf",
    ),
    (
        [
            "simple.sample1.deep.bam",
            "simple.sample2.deep.bam",
            "simple.sample3.deep.bam",
        ],
        "simple.output.deep.assemble.vcf",
    ),
]


def main():
    import jax

    from mchap_tpu.application.assemble import program
    from tests.golden import data_path, run_stdout_lines

    print("backend:", jax.default_backend(), flush=True)
    configs = CONFIGS[:1] if "quick" in sys.argv else CONFIGS

    for bams, output_vcf in configs:
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
        )
        prog = program.cli(command)
        lines = run_stdout_lines(prog)
        with open(data_path(output_vcf)) as f:
            golden = f.readlines()
        records = [
            ln.rstrip("\n").split("\t") for ln in lines if not ln.startswith("#")
        ]
        golden_records = [
            ln.rstrip("\n").split("\t") for ln in golden if not ln.startswith("#")
        ]
        assert len(records) == len(golden_records)
        for rec, want in zip(records, golden_records):
            assert rec[:5] == want[:5], (rec[:5], want[:5])
            assert rec[6] == want[6]
            info = dict(kv.split("=") for kv in rec[7].split(";") if "=" in kv)
            want_info = dict(
                kv.split("=") for kv in want[7].split(";") if "=" in kv
            )
            for key in (
                "AN", "UAN", "AC", "NS", "DP", "RCOUNT", "END", "NVAR",
                "SNVPOS",
            ):
                assert info.get(key) == want_info.get(key), (
                    key, info.get(key), want_info.get(key),
                )
            fmt_keys = rec[8].split(":")
            for cell, want_cell in zip(rec[9:], want[9:]):
                got_vals = dict(zip(fmt_keys, cell.split(":")))
                want_vals = dict(
                    zip(want[8].split(":"), want_cell.split(":"))
                )
                assert got_vals["GT"] == want_vals["GT"], (
                    got_vals["GT"], want_vals["GT"],
                )
                for key in ("DP", "RCOUNT", "RCALLS", "MEC"):
                    assert got_vals[key] == want_vals[key], key
        print(f"  {output_vcf}: decisions match", flush=True)
    print("GATE PASSED", flush=True)


if __name__ == "__main__":
    main()
