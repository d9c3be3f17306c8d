"""The own-golden regression matrix: one entry per (tool, option
surface) combination, shared by scripts/gen_goldens.py (writes the
files) and tests/test_regression_goldens.py (byte-compares).

Mirrors the role of the reference's checked-in golden matrix
(``mchap/tests/test_application_assemble.py:358-436``) for OUR
deterministic outputs at ``--mcmc-seed 11``: pools, optional report
fields, Dirichlet-multinomial prior, prior frequencies, a temperature
ladder and a pedigree run all get a byte-level regression oracle.
"""

from tests.golden import data_path

BAMS = [
    data_path(b)
    for b in ("simple.sample1.bam", "simple.sample2.bam", "simple.sample3.bam")
]
DEEP_BAMS = [
    data_path(b)
    for b in (
        "simple.sample1.deep.bam",
        "simple.sample2.deep.bam",
        "simple.sample3.deep.bam",
    )
]
MIXED_BAMS = [
    data_path(b)
    for b in ("simple.sample1.bam", "simple.sample2.deep.bam", "simple.sample3.bam")
]
MCMC = ["--mcmc-seed", "11", "--mcmc-steps", "500", "--mcmc-burn", "100"]


def _assemble(bams, extra):
    return (
        ["mchap", "assemble", "--bam"]
        + bams
        + [
            "--ploidy", "4",
            "--targets", data_path("simple.bed"),
            "--variants", data_path("simple.vcf.gz"),
            "--reference", data_path("simple.fasta"),
        ]
        + MCMC
        + extra
    )


def _call(bams, haplotypes, extra):
    return (
        ["mchap", "call", "--bam"]
        + bams
        + ["--ploidy", "4", "--haplotypes", data_path(haplotypes)]
        + MCMC
        + extra
    )


# golden filename -> full CLI command
CONFIGS = {
    "simple.assemble.seed11.vcf": _assemble(BAMS, []),
    "simple.assemble.report.seed11.vcf": _assemble(
        BAMS, ["--report", "ACP", "AFP", "AOP", "AOPSUM", "SNVDP", "GP", "GL"]
    ),
    "simple.assemble.dirmul.seed11.vcf": _assemble(
        BAMS, ["--use-dirmul-prior", "0.1"]
    ),
    "simple.assemble.temps.seed11.vcf": _assemble(
        BAMS, ["--mcmc-temperatures", "0.5", "1.0"]
    ),
    "simple.assemble.mixed.seed11.vcf": _assemble(MIXED_BAMS, []),
    "simple.assemble.pools.seed11.vcf": (
        ["mchap", "assemble", "--bam"]
        + DEEP_BAMS
        + [
            "--ploidy", data_path("simple.pools-ploidy"),
            "--sample-pool", data_path("simple.pools"),
            "--targets", data_path("simple.bed"),
            "--variants", data_path("simple.vcf.gz"),
            "--reference", data_path("simple.fasta"),
        ]
        + MCMC
    ),
    "simple.call.seed11.vcf": _call(BAMS, "simple.output.assemble.vcf", []),
    "simple.call-exact.frequencies.seed11.vcf": (
        ["mchap", "call-exact", "--bam"]
        + MIXED_BAMS
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("mock.input.frequencies.vcf"),
            "--use-dirmul-prior", "0.1", "AFP",
            "--report", "AFPRIOR", "ACP", "AFP", "GP", "GL",
        ]
    ),
    "simple.call.dirmul.seed11.vcf": _call(
        MIXED_BAMS,
        "mock.input.frequencies.vcf",
        ["--use-dirmul-prior", "0.1", "AFP"],
    ),
    "simple.call.pools.seed11.vcf": (
        ["mchap", "call", "--bam"]
        + DEEP_BAMS
        + [
            "--ploidy", data_path("simple.pools-ploidy"),
            "--sample-pool", data_path("simple.pools"),
            "--haplotypes", data_path("simple.output.assemble.vcf"),
        ]
        + MCMC
    ),
    "simple.call-pedigree.seed11.vcf": (
        ["mchap", "call-pedigree", "--bam"]
        + MIXED_BAMS
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("simple.output.mixed_depth.assemble.vcf"),
            "--sample-parents", data_path("simple.pedigree.132.txt"),
        ]
        + MCMC
    ),
    # --- round-5 widening toward the reference's ~51-file breadth ---
    # CRAM inputs must reproduce the BAM pipeline byte-for-byte
    "simple.assemble.cram.seed11.vcf": _assemble(
        [
            data_path(b)
            for b in (
                "simple.sample1.broken.cram",
                "simple.sample2.broken.cram",
                "simple.sample3.broken.cram",
            )
        ],
        [],
    ),
    "simple.assemble.deep.seed11.vcf": _assemble(DEEP_BAMS, []),
    # temperature ladder x Dirichlet-multinomial prior crossing
    "simple.assemble.temps-dirmul.seed11.vcf": _assemble(
        BAMS, ["--mcmc-temperatures", "0.5", "1.0", "--use-dirmul-prior", "0.1"]
    ),
    # aggressive homozygote fixing changes the sampled state space
    "simple.assemble.fixhom.seed11.vcf": _assemble(
        BAMS, ["--mcmc-fix-homozygous", "0.9"]
    ),
    "simple.assemble.phred.seed11.vcf": _assemble(
        BAMS, ["--use-base-phred-scores", "--base-error-rate", "0.01"]
    ),
    # pedigree option surface: gamete error / excess IBD (double
    # reduction) / mixed per-sample gamete ploidies / reported fields
    "simple.call-pedigree.gamerror.seed11.vcf": (
        ["mchap", "call-pedigree", "--bam"]
        + MIXED_BAMS
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("simple.output.mixed_depth.assemble.vcf"),
            "--sample-parents", data_path("simple.pedigree.132.txt"),
            "--gamete-error", "0.5",
        ]
        + MCMC
    ),
    "simple.call-pedigree.lambda.seed11.vcf": (
        ["mchap", "call-pedigree", "--bam"]
        + MIXED_BAMS
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("simple.output.mixed_depth.assemble.vcf"),
            "--sample-parents", data_path("simple.pedigree.132.txt"),
            "--gamete-ibd", "0.1",
        ]
        + MCMC
    ),
    "simple.call-pedigree.tau.seed11.vcf": (
        ["mchap", "call-pedigree", "--bam"]
        + MIXED_BAMS
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("simple.output.mixed_depth.assemble.vcf"),
            "--sample-parents", data_path("simple.pedigree.132.txt"),
            "--gamete-ploidy", data_path("simple.tau.132.txt"),
        ]
        + MCMC
    ),
    "simple.call-pedigree.report.seed11.vcf": (
        ["mchap", "call-pedigree", "--bam"]
        + MIXED_BAMS
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("simple.output.mixed_depth.assemble.vcf"),
            "--sample-parents", data_path("simple.pedigree.132.txt"),
            "--report", "ACP", "AFP", "AOP", "GP", "GL",
        ]
        + MCMC
    ),
    # known-haplotype prior frequencies through the pedigree sampler
    "simple.call-pedigree.frequencies.seed11.vcf": (
        ["mchap", "call-pedigree", "--bam"]
        + MIXED_BAMS
        + [
            "--ploidy", "4",
            "--haplotypes", data_path("mock.input.frequencies.vcf"),
            "--sample-parents", data_path("simple.pedigree.132.txt"),
            "--prior-frequencies", "AFP",
        ]
        + MCMC
    ),
}


def build_program(command):
    tool = command[1]
    if tool == "assemble":
        from mchap_tpu.application.assemble import program
    elif tool == "call":
        from mchap_tpu.application.call import program
    elif tool == "call-exact":
        from mchap_tpu.application.call_exact import program
    elif tool == "call-pedigree":
        from mchap_tpu.application.call_pedigree import program
    else:
        raise ValueError(tool)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)  # EXPERIMENTAL notices
        return program.cli(command)
