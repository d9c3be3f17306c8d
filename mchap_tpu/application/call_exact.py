"""``mchap call-exact``: exact-enumeration genotype calling.

Reference: mchap/application/call_exact.py.  Fully deterministic, so
output is byte-comparable to the reference's golden VCFs.
"""

import argparse
import sys
from dataclasses import dataclass

import numpy as np

from mchap_tpu.application import call_baseclass
from mchap_tpu.application.arguments import (
    CALL_EXACT_PARSER_ARGUMENTS,
    collect_call_exact_program_arguments,
)
from mchap_tpu.application.baseclass import (
    ALT,
    FILTER,
    REF,
    SAMPLE_ASSEMBLY_ERROR,
    SampleAssemblyError,
)
from mchap_tpu.encoding.integer import minimum_error_correction
from mchap_tpu.io import vcf as VCF
from mchap_tpu.io.util import qual_of_prob
from mchap_tpu.numerics.combinadics import index_as_genotype_alleles_np
from mchap_tpu.numerics.logprob import natural_log_to_log10
from mchap_tpu.ops import exact


@dataclass
class program(call_baseclass.program):
    @classmethod
    def cli(cls, command):
        parser = argparse.ArgumentParser("Exact haplotype calling")
        for arg in CALL_EXACT_PARSER_ARGUMENTS:
            arg.add_to(parser)
        if len(command) < 3:
            parser.print_help()
            sys.exit(1)
        args = parser.parse_args(command[2:])
        arguments = collect_call_exact_program_arguments(args)
        return cls(cli_command=command, **arguments)

    def call_sample_genotypes(self, data):
        """Exact posterior call per sample; reference call_exact.py:52-199."""
        haplotypes = data.locus.encode_haplotypes()
        mask_reference_allele = data.locus.mask_reference_allele
        prior_frequencies = data.locus.frequencies

        data.columndata[REF] = data.locus.sequence
        data.columndata[ALT] = data.locus.alts
        data.infodata[VCF.INFO_REFMASKED] = mask_reference_allele
        data.infodata[VCF.INFO_AFPRIOR] = prior_frequencies

        if mask_reference_allele:
            assert (prior_frequencies[0] == 0) or np.isnan(prior_frequencies[0])

        if mask_reference_allele and len(haplotypes) == 1:
            invalid_scenario = True
            data.columndata[FILTER].append(VCF.NOA.id)
        elif np.any(np.isnan(prior_frequencies)):
            invalid_scenario = True
            data.columndata[FILTER].append(VCF.AF0.id)
        else:
            invalid_scenario = False

        if invalid_scenario:
            _fill_invalid_sampledata(data)
            return data

        for sample in data.samples:
            try:
                ploidy = data.sample_ploidy[sample]
                read_calls = data.read_calls[sample]
                read_dists = data.read_dists[sample]
                read_counts = data.read_counts[sample]

                if data.sample_inbreeding is None:
                    prior = None
                else:
                    prior = (data.sample_inbreeding[sample], prior_frequencies)

                if (VCF.FORMAT_GL in data.formatfields) or (
                    VCF.FORMAT_GP in data.formatfields
                ):
                    llks = np.asarray(
                        exact.genotype_likelihoods(
                            read_dists, ploidy, haplotypes, read_counts
                        )
                    )
                    probabilities = np.asarray(
                        exact.genotype_posteriors(
                            llks, ploidy, len(haplotypes), prior=prior
                        )
                    )
                    idx = int(np.argmax(probabilities))
                    alleles = index_as_genotype_alleles_np(idx, ploidy)
                    genotype_prob = probabilities[idx]
                    _, support_probs = exact.alternate_dosage_posteriors(
                        alleles, probabilities
                    )
                    genotype_support_prob = support_probs.sum()
                    if self.require_AFP():
                        freqs, counts, occur = exact.posterior_allele_frequencies(
                            probabilities, ploidy, len(haplotypes)
                        )
                        data.sampledata[VCF.FORMAT_ACP][sample] = np.asarray(counts)
                        data.sampledata[VCF.FORMAT_AFP][sample] = np.asarray(freqs)
                        data.sampledata[VCF.FORMAT_AOP][sample] = np.asarray(occur)
                    if VCF.FORMAT_GL in data.formatfields:
                        data.sampledata[VCF.FORMAT_GL][sample] = np.asarray(
                            natural_log_to_log10(llks)
                        )
                    if VCF.FORMAT_GP in data.formatfields:
                        data.sampledata[VCF.FORMAT_GP][sample] = probabilities
                else:
                    results = exact.posterior_mode(
                        read_dists,
                        ploidy,
                        haplotypes,
                        read_counts=read_counts,
                        prior=prior,
                        return_support_prob=True,
                        return_posterior_frequencies=True,
                        return_posterior_occurrence=True,
                    )
                    alleles, _, genotype_prob, genotype_support_prob = results[0:4]
                    freqs = results[-2]
                    occur = results[-1]
                    data.sampledata[VCF.FORMAT_ACP][sample] = np.asarray(freqs) * ploidy
                    data.sampledata[VCF.FORMAT_AFP][sample] = np.asarray(freqs)
                    data.sampledata[VCF.FORMAT_AOP][sample] = np.asarray(occur)

                data.sampledata[VCF.FORMAT_GT][sample] = np.asarray(alleles)
                data.sampledata[VCF.FORMAT_GQ][sample] = qual_of_prob(genotype_prob)
                data.sampledata[VCF.FORMAT_GPM][sample] = float(genotype_prob)
                data.sampledata[VCF.FORMAT_SPM][sample] = float(genotype_support_prob)
                data.sampledata[VCF.FORMAT_SQ][sample] = qual_of_prob(
                    genotype_support_prob
                )
                data.sampledata[VCF.FORMAT_MCI][sample] = np.nan
                mec = np.sum(
                    minimum_error_correction(read_calls, haplotypes[np.asarray(alleles)])
                )
                mec_denom = np.sum(read_calls >= 0)
                data.sampledata[VCF.FORMAT_MEC][sample] = mec
                data.sampledata[VCF.FORMAT_MECP][sample] = (
                    mec / mec_denom if mec_denom > 0 else np.nan
                )
            except Exception as e:
                message = SAMPLE_ASSEMBLY_ERROR.format(sample=sample)
                raise SampleAssemblyError(message) from e
        return data


def _fill_invalid_sampledata(data):
    """All-nan sample fields for NOA/AF0 loci; reference call_exact.py:91-107."""
    for sample in data.samples:
        ploidy = data.sample_ploidy[sample]
        data.sampledata[VCF.FORMAT_GT][sample] = np.full(ploidy, -1, int)
        for f in (
            VCF.FORMAT_GQ,
            VCF.FORMAT_GPM,
            VCF.FORMAT_SPM,
            VCF.FORMAT_SQ,
            VCF.FORMAT_MCI,
            VCF.FORMAT_MEC,
            VCF.FORMAT_MECP,
        ):
            data.sampledata[f][sample] = np.nan
        for f in (
            VCF.FORMAT_ACP,
            VCF.FORMAT_AFP,
            VCF.FORMAT_AOP,
            VCF.FORMAT_GP,
            VCF.FORMAT_GL,
        ):
            data.sampledata[f][sample] = np.array([np.nan])
