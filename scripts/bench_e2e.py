"""End-to-end loci/s benchmark: the 22-sample bi-parental example.

Runs the full ``mchap assemble`` pipeline (indexed BAM IO -> encoding ->
batched de novo sampler -> VCF formatting) over the reference's bundled
realistic config (`/root/reference/docs/example/input`: 22 tetraploid
BAMs, 20 loci, 866 SNVs) and reports wall-clock loci/s.

The example's FASTA is not shipped (only its .fai/.gzi); the reference
sequence over the target regions is reconstructed exactly from the
reads' MD tags (lowercase ref bases at mismatches) cross-checked with
the SNV VCF's REF alleles, and written as an N-padded chr1 FASTA.

Usage:
    python scripts/bench_e2e.py            # time on the current backend
    JAX_PLATFORMS=cpu ... bench_e2e.py     # host-CPU comparison row

Prints one JSON line: {"metric": "e2e_loci_per_s", ...}.
"""

import glob
import io
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

INPUT = pathlib.Path("/root/reference/docs/example/input")
CONTIG = "chr1"
CONTIG_LEN = 21_898_217
LINE = 70


def reconstruct_fasta(out_path, bed_path, bams, vcf_gz):
    """Rebuild the target regions' reference sequence from MD tags."""
    from mchap_tpu.io.bamlite import AlignmentFile
    from mchap_tpu.io.bed import read_bed4
    from mchap_tpu.io.vcflite import VariantFile

    loci = list(read_bed4(bed_path))
    lo = min(l.start for l in loci) - 200
    hi = max(l.stop for l in loci) + 200
    seq = np.full(hi - lo, ord("N"), np.uint8)
    for path in bams:
        af = AlignmentFile(path)
        for locus in loci:
            for read in af.fetch(locus.contig, locus.start, locus.stop):
                for pair in read.get_aligned_pairs(
                    matches_only=True, with_seq=True
                ):
                    read_i, ref_i, char = pair
                    if char is not None and lo <= ref_i < hi:
                        seq[ref_i - lo] = ord(char.upper())
    # authoritative REF alleles from the SNV VCF
    with VariantFile(vcf_gz) as vf:
        for rec in vf.fetch(CONTIG, lo, hi):
            for k, ch in enumerate(rec.ref):
                if lo <= rec.start + k < hi:
                    seq[rec.start + k - lo] = ord(ch.upper())

    with open(out_path, "w") as f:
        f.write(f">{CONTIG}\n")
        full = np.full(CONTIG_LEN, ord("N"), np.uint8)
        full[lo:hi] = seq
        text = full.tobytes().decode()
        for i in range(0, CONTIG_LEN, LINE):
            f.write(text[i : i + LINE])
            f.write("\n")
    # matching .fai: name, length, offset of first base, basesperline,
    # bytes per line
    offset = len(f">{CONTIG}\n")
    with open(str(out_path) + ".fai", "w") as f:
        f.write(f"{CONTIG}\t{CONTIG_LEN}\t{offset}\t{LINE}\t{LINE + 1}\n")


def ensure_fasta(fasta="/tmp/mchap_bench_chr1.fa"):
    """Reconstruct (once) and return the example's reference FASTA."""
    bams = sorted(glob.glob(str(INPUT / "bam" / "*.bam")))
    bed = str(INPUT / "bed" / "targets20.bed")
    vcf = str(INPUT / "vcf" / "snvs.vcf.gz")
    if not os.path.exists(fasta):
        t0 = time.time()
        reconstruct_fasta(fasta, bed, bams, vcf)
        print(f"# reconstructed FASTA in {time.time() - t0:.1f}s",
              file=sys.stderr)
    return bams, bed, vcf, fasta


def run_assemble(steps=1000, burn=500, out_vcf=None):
    """Full ``mchap assemble`` over the realistic 22-sample example;
    returns (wall_seconds, n_loci).  Writes the output VCF to
    ``out_vcf`` when given (feeds the call-pedigree e2e workload)."""
    import contextlib

    bams, bed, vcf, fasta = ensure_fasta()
    from mchap_tpu.application.assemble import program

    command = (
        ["mchap", "assemble", "--bam"]
        + bams
        + [
            "--ploidy", "4",
            "--targets", bed,
            "--variants", vcf,
            "--reference", fasta,
            "--mcmc-steps", str(steps),
            "--mcmc-burn", str(burn),
            "--mcmc-seed", "11",
        ]
    )
    prog = program.cli(command)
    t0 = time.time()
    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        prog.run_stdout()
    dt = time.time() - t0
    lines = buffer.getvalue().splitlines()
    n_records = sum(1 for ln in lines if not ln.startswith("#"))
    n_loci = 20
    assert n_records == n_loci, f"expected {n_loci} records, got {n_records}"
    if out_vcf:
        with open(out_vcf, "w") as f:
            f.write(buffer.getvalue())
    return dt, n_loci


def run_call_pedigree(haplotypes_vcf, steps=1000, burn=500):
    """Full ``mchap call-pedigree`` over the example's bi-parental
    pedigree (22 samples) against a known-haplotypes VCF; returns
    (wall_seconds, n_loci)."""
    import contextlib
    import warnings

    bams, bed, vcf, fasta = ensure_fasta()
    from mchap_tpu.application.call_pedigree import program

    command = (
        ["mchap", "call-pedigree", "--bam"]
        + bams
        + [
            "--ploidy", "4",
            "--haplotypes", haplotypes_vcf,
            "--sample-parents", str(INPUT / "pedigree" / "pedigree.txt"),
            "--mcmc-steps", str(steps),
            "--mcmc-burn", str(burn),
            "--mcmc-seed", "11",
        ]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        prog = program.cli(command)
    t0 = time.time()
    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        prog.run_stdout()
    dt = time.time() - t0
    lines = buffer.getvalue().splitlines()
    n_records = sum(1 for ln in lines if not ln.startswith("#"))
    assert n_records == 20, f"expected 20 records, got {n_records}"
    return dt, n_records


def main():
    import jax

    dt, n_loci = run_assemble(1000, 500)
    print(
        json.dumps(
            {
                "metric": "e2e_loci_per_s",
                "value": round(n_loci / dt, 4),
                "unit": "loci/s (22 samples, 1000 steps, 2 chains)",
                "seconds": round(dt, 1),
                "backend": jax.default_backend(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
