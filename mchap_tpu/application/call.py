"""``mchap call``: MCMC genotype calling over known haplotypes.

Reference: mchap/application/call.py.  The sampler runs as a batched
device program (models/calling.py).
"""

import argparse
import sys
from dataclasses import dataclass

import numpy as np

from mchap_tpu.application import call_baseclass
from mchap_tpu.application.arguments import (
    CALL_MCMC_PARSER_ARGUMENTS,
    collect_call_mcmc_program_arguments,
)
from mchap_tpu.application.baseclass import (
    ALT,
    FILTER,
    REF,
    SAMPLE_ASSEMBLY_ERROR,
    SampleAssemblyError,
)
from mchap_tpu.application.call_exact import _fill_invalid_sampledata
from mchap_tpu.encoding.integer import minimum_error_correction
from mchap_tpu.io import vcf as VCF
from mchap_tpu.io.util import qual_of_prob
from mchap_tpu.models.calling import CallingMCMC, fit_calling_batch
from mchap_tpu.numerics.logprob import natural_log_to_log10
from mchap_tpu.ops import exact


@dataclass
class program(call_baseclass.program):
    mcmc_chains: int = 1
    mcmc_steps: int = 2000
    mcmc_burn: int = 1000
    mcmc_incongruence_threshold: float = 0.60

    @classmethod
    def cli(cls, command):
        parser = argparse.ArgumentParser("MCMC haplotype calling")
        for arg in CALL_MCMC_PARSER_ARGUMENTS:
            arg.add_to(parser)
        if len(command) < 3:
            parser.print_help()
            sys.exit(1)
        args = parser.parse_args(command[2:])
        arguments = collect_call_mcmc_program_arguments(args)
        return cls(cli_command=command, **arguments)

    def call_sample_genotypes(self, data):
        """MCMC call per sample; reference call.py:49-199."""
        haplotypes = data.locus.encode_haplotypes()
        prior_frequencies = data.locus.frequencies
        mask_reference_allele = data.locus.mask_reference_allele
        mask = np.zeros(len(haplotypes), bool)
        mask[0] = mask_reference_allele

        data.columndata[REF] = data.locus.sequence
        data.columndata[ALT] = data.locus.alts
        data.infodata[VCF.INFO_REFMASKED] = mask_reference_allele
        data.infodata[VCF.INFO_AFPRIOR] = prior_frequencies

        # mask zero-frequency haplotypes out of the MCMC
        mask |= prior_frequencies == 0
        if np.any(mask):
            mcmc_haplotypes = haplotypes[~mask]
            mcmc_prior_frequencies = prior_frequencies[~mask]
            mcmc_haplotype_labels = np.where(~mask)[0]
        else:
            mcmc_haplotype_labels = None
            mcmc_prior_frequencies = prior_frequencies
            mcmc_haplotypes = haplotypes

        if len(mcmc_haplotypes) == 0:
            data.columndata[FILTER].append(VCF.NOA.id)
            _fill_invalid_sampledata(data)
            return data
        if (prior_frequencies is not None) and np.any(np.isnan(prior_frequencies)):
            data.columndata[FILTER].append(VCF.AF0.id)
            _fill_invalid_sampledata(data)
            return data

        # one batched device program covers every sample whose ploidy
        # matches the modal ploidy; other ploidies run individually
        ploidies = [data.sample_ploidy[s] for s in data.samples]
        uniform = len(set(ploidies)) == 1
        batch_traces = {}
        if uniform and len(data.samples) > 1:
            traces = fit_calling_batch(
                ploidy=ploidies[0],
                haplotypes=mcmc_haplotypes,
                reads_list=[data.read_dists[s] for s in data.samples],
                counts_list=[data.read_counts[s] for s in data.samples],
                inbreeding_list=(
                    None
                    if data.sample_inbreeding is None
                    else [data.sample_inbreeding[s] for s in data.samples]
                ),
                frequencies=(
                    None if data.sample_inbreeding is None else mcmc_prior_frequencies
                ),
                steps=self.mcmc_steps,
                chains=self.mcmc_chains,
                random_seed=self.random_seed,
            )
            batch_traces = dict(zip(data.samples, traces))

        for sample in data.samples:
            try:
                read_calls = data.read_calls[sample]
                read_dists = data.read_dists[sample]
                read_counts = data.read_counts[sample]
                if sample in batch_traces:
                    trace = batch_traces[sample].burn(self.mcmc_burn)
                else:
                    if data.sample_inbreeding is None:
                        prior = None
                    else:
                        prior = (data.sample_inbreeding[sample], mcmc_prior_frequencies)
                    trace = (
                        CallingMCMC(
                            ploidy=data.sample_ploidy[sample],
                            haplotypes=mcmc_haplotypes,
                            prior=prior,
                            steps=self.mcmc_steps,
                            chains=self.mcmc_chains,
                            random_seed=self.random_seed,
                        )
                        .fit(reads=read_dists, read_counts=read_counts)
                        .burn(self.mcmc_burn)
                    )
                if mcmc_haplotype_labels is not None:
                    trace = trace.relabel(mcmc_haplotype_labels)
                incongruence = trace.replicate_incongruence(
                    threshold=self.mcmc_incongruence_threshold
                )
                posterior = trace.posterior()
                alleles, genotype_prob, genotype_support_prob = posterior.mode(
                    genotype_support=True
                )

                data.sampledata[VCF.FORMAT_GT][sample] = alleles
                data.sampledata[VCF.FORMAT_GQ][sample] = qual_of_prob(genotype_prob)
                data.sampledata[VCF.FORMAT_GPM][sample] = float(genotype_prob)
                data.sampledata[VCF.FORMAT_SPM][sample] = float(genotype_support_prob)
                data.sampledata[VCF.FORMAT_SQ][sample] = qual_of_prob(
                    genotype_support_prob
                )
                data.sampledata[VCF.FORMAT_MCI][sample] = incongruence
                mec = np.sum(minimum_error_correction(read_calls, haplotypes[alleles]))
                mec_denom = np.sum(read_calls >= 0)
                data.sampledata[VCF.FORMAT_MEC][sample] = mec
                data.sampledata[VCF.FORMAT_MECP][sample] = (
                    mec / mec_denom if mec_denom > 0 else np.nan
                )

                if self.require_AFP():
                    frequencies, counts, occurrence = trace.posterior_frequencies()
                    data.sampledata[VCF.FORMAT_ACP][sample] = counts
                    data.sampledata[VCF.FORMAT_AFP][sample] = frequencies
                    data.sampledata[VCF.FORMAT_AOP][sample] = occurrence
                if VCF.FORMAT_GP in data.formatfields:
                    data.sampledata[VCF.FORMAT_GP][sample] = posterior.as_array(
                        len(haplotypes)
                    )
                if VCF.FORMAT_GL in data.formatfields:
                    llks = np.asarray(
                        exact.genotype_likelihoods(
                            read_dists,
                            data.sample_ploidy[sample],
                            haplotypes,
                            read_counts,
                        )
                    )
                    data.sampledata[VCF.FORMAT_GL][sample] = np.asarray(
                        natural_log_to_log10(llks)
                    )
            except Exception as e:
                message = SAMPLE_ASSEMBLY_ERROR.format(sample=sample)
                raise SampleAssemblyError(message) from e
        return data
