"""DenovoMCMC model: de novo haplotype assembly by batched MCMC.

API parity with reference ``mchap/assemble/mcmc.py`` (DenovoMCMC) and
``mchap/assemble/classes.py`` (GenotypeMultiTrace,
PosteriorGenotypeDistribution, GenotypeSupportDistribution), plus
``haplotype_calling.call_posterior_haplotypes``.  The sampler runs as a
single batched device program (ops/assemble_mcmc.py); homozygote-fixed
positions stay in the state with n_alleles = 1 instead of being sliced
out, keeping one compiled shape per (ploidy, n_base, reads) bucket.
"""

from collections import Counter
from dataclasses import dataclass
from functools import reduce

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as _stats

from mchap_tpu import mset

from mchap_tpu.ops import assemble_mcmc as _kernel
from mchap_tpu.utils import fallback as _fallback
from mchap_tpu.utils import timing as _timing
from mchap_tpu.ops.likelihood import prepare_reads


def _point_beta_probabilities(n_base, a=1, b=1):
    """Discretized Beta pmf over break counts; reference mcmc.py:429-452."""
    dist = _stats.beta(a, b)
    points = np.arange(1, n_base + 1) / n_base
    probs = dist.cdf(points)
    probs[1:] = probs[1:] - probs[:-1]
    return probs


def _read_mean_dist(reads):
    """Per-position allele profile for chain initialisation.

    The mean of the observed read distributions at each (position,
    allele) cell; cells no read observed get a uniform share over the
    position's allowed alleles (disallowed slots are all-zero columns
    and keep probability 0).  Matches the initialisation semantics of
    reference mcmc.py:455-491, computed via masked sums instead of
    in-place fills.
    """
    reads = np.asarray(reads, float)
    observed = ~np.isnan(reads)  # [R, nb, A]
    n_obs = observed.sum(axis=0)  # [nb, A]
    total = np.where(observed, reads, 0.0).sum(axis=0)
    mean = total / np.maximum(n_obs, 1)
    # slots disallowed at a position are all-zero across reads (nan-safe:
    # nan != 0 so gap cells still count as allowed)
    allowed = ~np.all(np.nan_to_num(reads, nan=1.0) == 0.0, axis=0)
    uniform = 1.0 / allowed.sum(axis=1, keepdims=True)
    dist = np.where(n_obs > 0, mean, uniform)
    return dist / dist.sum(axis=-1, keepdims=True)


@dataclass
class DenovoMCMC:
    """De novo assembly sampler; attributes as reference mcmc.py:24-100."""

    ploidy: int
    n_alleles: list
    inbreeding: float = None
    steps: int = 1000
    chains: int = 2
    alpha: float = 1.0
    beta: float = 3.0
    n_intervals: int = None
    fix_homozygous: float = 0.999
    recombination_step_probability: float = 0.5
    partial_dosage_step_probability: float = 0.5
    dosage_step_probability: float = 1.0
    temperatures: tuple = (1.0,)
    random_seed: int = None
    llk_cache_threshold: int = 100  # accepted for API parity; no cache here

    def fit(self, reads, read_counts=None, initial=None):
        """Run ``chains`` batched MCMC chains; returns GenotypeMultiTrace.

        Reference semantics: mcmc.py:103-265 (zero-read mock, homozygote
        fixing, read-mean initialisation, all-fixed shortcut).
        """
        reads = np.asarray(reads, float)
        n_reads, n_pos, max_allele = reads.shape
        if n_reads == 0:
            reads = np.full((1, n_pos, max_allele), np.nan)
            n_reads = 1
            read_counts = None
        if read_counts is None:
            read_counts = np.ones(n_reads)

        n_alleles = np.array(self.n_alleles, dtype=np.int8)
        use_prior = self.inbreeding is not None
        inbreeding = float(self.inbreeding) if use_prior else 0.0

        if n_pos == 0:
            genotypes = np.zeros((self.chains, self.steps, self.ploidy, 0), np.int8)
            llks = np.full((self.chains, self.steps), np.nan)
            return GenotypeMultiTrace(genotypes, llks)

        # homozygote fixing (mcmc.py:168-199)
        hom_probs = _kernel.homozygosity_probabilities(
            jnp.asarray(reads),
            n_alleles,
            self.ploidy,
            use_prior=use_prior,
            inbreeding=inbreeding,
            read_counts=jnp.asarray(read_counts),
        )
        fixed = hom_probs >= self.fix_homozygous
        homozygous = np.any(fixed, axis=-1)
        fixed_allele = np.where(homozygous, np.argmax(fixed, axis=-1), 0)

        if homozygous.all():
            # nothing to sample: tile the fixed haplotype
            haplotype = fixed_allele.astype(np.int8)
            genotypes = np.tile(haplotype, (self.chains, self.steps, self.ploidy, 1))
            llks = np.full((self.chains, self.steps), np.nan)
            return GenotypeMultiTrace(genotypes, llks)

        # fixed positions keep their allele and become single-allele sites
        n_alleles_eff = np.where(homozygous, 1, n_alleles).astype(np.int32)
        n_het = int((~homozygous).sum())

        # break-count distribution over het positions (mcmc.py:211-217);
        # padded to n_base so empty tail intervals are no-ops
        if self.n_intervals is None:
            break_dist = np.zeros(n_pos)
            break_dist[:n_het] = _point_beta_probabilities(n_het, self.alpha, self.beta)
        else:
            break_dist = np.zeros(n_pos)
            break_dist[min(self.n_intervals - 1, n_pos - 1)] = 1.0

        temperatures = np.sort(np.asarray(self.temperatures, float))
        assert temperatures[0] >= 0.0
        assert temperatures[-1] == 1.0

        seed = self.random_seed if self.random_seed is not None else 0
        key = jax.random.PRNGKey(seed)
        kinit, krun = jax.random.split(key)

        if initial is None:
            # sample initial genotypes from the read-mean distribution,
            # overwriting fixed positions with their fixed allele
            dist = _read_mean_dist(reads)
            cdf = np.cumsum(dist, axis=-1)
            u = np.asarray(
                jax.random.uniform(
                    kinit, (self.chains, self.ploidy, n_pos, 1), dtype=jnp.float64
                )
            )
            sampled = (u > cdf[None, None]).sum(axis=-1).astype(np.int32)
            init = np.where(homozygous[None, None, :], fixed_allele[None, None, :], sampled)
        else:
            initial = np.asarray(initial)
            if initial.ndim == 2:
                initial = np.tile(initial, (self.chains, 1, 1))
            init = np.where(
                homozygous[None, None, :], fixed_allele[None, None, :], initial
            ).astype(np.int32)

        # fixed positions also overwrite the reads' disallowed alleles? no:
        # log_reads stays full; fixed columns contribute a constant per read.
        log_reads = prepare_reads(reads)

        genotypes, llks = _kernel.denovo_sampler(
            krun,
            jnp.asarray(init, jnp.int32),
            log_reads,
            jnp.asarray(read_counts, jnp.float64),
            jnp.asarray(n_alleles_eff),
            jnp.asarray(break_dist),
            jnp.asarray(temperatures),
            n_steps=self.steps,
            use_prior=use_prior,
            inbreeding=inbreeding,
            recombination_step_probability=self.recombination_step_probability,
            partial_dosage_step_probability=self.partial_dosage_step_probability,
            dosage_step_probability=self.dosage_step_probability,
        )
        return GenotypeMultiTrace(np.asarray(genotypes), np.asarray(llks))


def _fit_denovo_batch_pallas(
    log_reads, counts, init, n_alleles_eff, break_dist, ploidy, steps,
    chains, seed, p_recomb, p_partial, p_full, temperatures=(1.0,),
    alphas=None, burn=0, interpret=False, mesh="auto", tabulate=False,
):
    """Run all samples x chains through the full-step pallas kernel.

    Layout: one 128-wide lane per chain (per-sample reads / allele
    counts / breakpoint rates replicated across that sample's chains;
    dummy zero-count lanes pad to a multiple of 128).  Differences vs
    the XLA path — systematic site order, Bernoulli interval partitions
    capped at NB//4+2 segments — are valid sampler choices covered by
    the exact-posterior gate (scripts/gate_pallas_denovo.py).

    Multi-chip: the lane axis is embarrassingly parallel, so with more
    than one visible device the kernel launch is wrapped in
    ``shard_map`` over a 1-D "lanes" mesh — each device runs its own
    kernel instance on its block of lane tiles (the reference's
    process-per-locus-block scaling, baseclass.py:360-394, mapped onto
    the fast path).  Per-device PRNG seeds are offset by the device's
    global tile index so no two devices share a random stream.
    ``mesh``: "auto" resolves via ``parallel.sharding.lane_mesh``;
    ``None`` forces single-device; an explicit Mesh pins one.
    """
    from mchap_tpu.ops.pallas_denovo import pallas_denovo_sampler
    from mchap_tpu.parallel.sharding import lane_mesh

    if mesh == "auto":
        mesh = lane_mesh()
    n_shards = 1 if mesh is None else mesh.devices.size

    log_reads = np.asarray(log_reads)
    init = np.asarray(init, np.int32)
    n_alleles_eff = np.asarray(n_alleles_eff, np.int32)
    counts = np.asarray(counts)
    break_dist = np.asarray(break_dist)
    n_samples, n_reads, n_pos_full, max_allele = log_reads.shape
    # the Bernoulli breakpoint rate targets the reference's expected
    # break count over the ORIGINAL position axis (mcmc.py:429-452)
    mean_breaks = (break_dist * np.arange(n_pos_full)[None, :]).sum(-1)

    # --- het-position compaction -------------------------------------
    # Homozygote-fixed and padding positions (n_alleles <= 1) are
    # provable no-ops inside the kernel, yet at real-data shapes they
    # dominate the position axis (deep loci fix most SNVs per sample,
    # reference mcmc.py:168-199) and the sweep cost is linear in NB.
    # Compact each sample's het positions to the front (per-sample
    # permutation, stable so relative order is kept), run the kernel on
    # the max-het-width prefix only, and restore the fixed columns on
    # the way out.  Fixed columns add a genotype-independent constant
    # to every rh row, so dropping them shifts each lane's llk by
    # sum_r c_r * sum_{j fixed} lr[r, j, fixed_allele] — added back to
    # the returned llks below.  Row comparison order is unchanged:
    # fixed columns are identical across rows, so lexicographic order
    # is decided by het columns in original relative order either way.
    het = n_alleles_eff > 1  # [S, NB]
    nb_eff = int(het.sum(axis=1).max(initial=1))
    nb_eff = min(n_pos_full, (max(nb_eff, 1) + 7) // 8 * 8)
    restore = None
    fix_llk = np.zeros(n_samples)
    if nb_eff < n_pos_full:
        order = np.argsort(~het, axis=1, kind="stable")  # het first
        sel = order[:, :nb_eff]  # [S, nb_eff]
        # compaction requires every non-het position to carry ONE
        # consistent allele across chains and ploidy rows (guaranteed by
        # _fit_denovo_core's homozygote fixing); a violating caller
        # would get silently wrong restored genotypes, so check cheaply
        if not bool(
            np.all((init == init[:, :1, :1, :]) | het[:, None, None, :])
        ):  # ValueError, not assert: survives python -O
            raise ValueError(
                "het compaction: init differs across chains/rows at a"
                " fixed position"
            )
        fixed_allele_full = init[:, 0, 0, :]  # fixed cols: all rows equal
        lr_fix = np.take_along_axis(
            log_reads, fixed_allele_full[:, None, :, None].astype(np.int64),
            axis=3,
        )[..., 0]  # [S, R, NB]
        # the llk constant covers only positions OUTSIDE the kernel:
        # a sample with fewer het sites than nb_eff carries some fixed
        # positions in-state (frozen no-ops) whose contribution the
        # kernel already accounts
        in_kernel = np.zeros((n_samples, n_pos_full), bool)
        np.put_along_axis(in_kernel, sel, True, axis=1)
        fix_llk = (
            np.where(in_kernel[:, None, :], 0.0, lr_fix).sum(axis=2) * counts
        ).sum(axis=1)
        log_reads = np.take_along_axis(
            log_reads, sel[:, None, :, None], axis=2
        )
        init = np.take_along_axis(init, sel[:, None, None, :], axis=3)
        n_alleles_eff = np.take_along_axis(n_alleles_eff, sel, axis=1)
        restore = (sel, fixed_allele_full)
    n_pos = log_reads.shape[2]

    def _restore_cols(arr, i):
        """Compact [..., nb_eff] positions back to [..., n_pos_full]."""
        if restore is None:
            return arr
        sel_r, fa_full = restore
        inv = np.full(n_pos_full, -1, np.int64)
        inv[sel_r[i]] = np.arange(n_pos)
        gathered = arr[..., np.maximum(inv, 0)]
        return np.where(inv >= 0, gathered, fa_full[i]).astype(arr.dtype)
    b = n_samples * chains
    # pad to chunk_cap lane-tiles PER DEVICE, where chunk_cap mirrors the
    # kernel's own VMEM-driven chunk choice (pallas_denovo_sampler): at
    # small shapes the kernel packs CHUNK=4 chain groups per instance, so
    # lanes pad to 512/device; at real-data shapes the prepared-reads
    # block caps chunk at 1-2 and padding to 512 would only add dummy
    # lanes that run the full kernel for nothing
    if len(temperatures) > 1 or interpret:
        # tempered mode replicates tiles over the ladder; interpret mode
        # (CPU validation only) keeps padding minimal — wide chunk
        # padding multiplies the unrolled interpreter program until its
        # XLA compile takes tens of minutes on a sharded mesh
        chunk_cap = 1
    else:
        chunk_cap = 1
        for c in (4, 2):
            if n_pos * max_allele * n_reads * c * 128 * 4 <= 5 * 1024 * 1024:
                chunk_cap = c
                break
    granule = 128 * chunk_cap * n_shards
    b_pad = ((b + granule - 1) // granule) * granule
    lr_cl = jnp.repeat(
        jnp.transpose(jnp.asarray(log_reads, jnp.float32), (1, 2, 3, 0)),
        chains, axis=3,
    )  # [R, NB, A, S*chains]
    counts_cl = jnp.repeat(
        jnp.transpose(jnp.asarray(counts, jnp.float32), (1, 0)), chains,
        axis=1,
    )
    init_cl = jnp.transpose(
        jnp.asarray(init, jnp.int32), (2, 3, 0, 1)
    ).reshape(ploidy, n_pos, b)  # [P, NB, S*chains]
    nall_cl = np.repeat(
        np.asarray(n_alleles_eff, np.int32).T, chains, axis=1
    )  # [NB, S*chains]
    # per-lane Bernoulli breakpoint rate matching the reference's
    # expected break count E[n_breaks] (discretized Beta; mcmc.py:429-452)
    # spread over the (possibly compacted) kernel position axis
    pbreak = np.repeat(
        (mean_breaks / max(n_pos - 1, 1)).astype(np.float32), chains
    )[None, :]  # [1, S*chains]
    alphas_cl = (
        None
        if alphas is None
        else np.repeat(np.asarray(alphas, np.float32), chains)
    )
    if b_pad != b:
        lr_cl = jnp.pad(lr_cl, ((0, 0),) * 3 + ((0, b_pad - b),))
        counts_cl = jnp.pad(counts_cl, ((0, 0), (0, b_pad - b)))
        init_cl = jnp.pad(init_cl, ((0, 0), (0, 0), (0, b_pad - b)))
        nall_cl = np.pad(
            nall_cl, ((0, 0), (0, b_pad - b)), constant_values=1
        )
        pbreak = np.pad(pbreak, ((0, 0), (0, b_pad - b)))
        if alphas_cl is not None:
            alphas_cl = np.pad(
                alphas_cl, (0, b_pad - b), constant_values=1.0
            )
    temps = np.sort(np.asarray(temperatures, np.float32))
    temps_arr = jnp.asarray(temps) if len(temps) > 1 else None

    def _run(seed_arr, lr, c, g0, na, pb, al):
        return pallas_denovo_sampler(
            seed_arr, lr, c, g0, na, pb, temps_arr,
            al if alphas_cl is not None else None,
            n_steps=steps, ploidy=ploidy, p_recomb=p_recomb,
            p_partial=p_partial, p_full=p_full, packed=True,
            interpret=interpret,
        )

    args = (
        lr_cl, counts_cl, init_cl, jnp.asarray(nall_cl),
        jnp.asarray(pbreak),
        jnp.asarray(alphas_cl)
        if alphas_cl is not None
        else jnp.zeros(b_pad, jnp.float32),
    )
    with _timing.stage("device.kernel"):
        if mesh is None:
            packed, llks = _run(jnp.int32(seed), *args)
        else:
            from jax.sharding import PartitionSpec as P

            local_tiles = (b_pad // n_shards) // 128

            def _body(lr, c, g0, na, pb, al):
                # per-device seed offset = global-first-tile * n_steps,
                # matching the kernel's seed + tile * n_steps + step
                # layout
                d = jax.lax.axis_index("lanes").astype(jnp.int32)
                seed_local = jnp.int32(seed) + d * jnp.int32(
                    local_tiles * steps
                )
                return _run(seed_local, lr, c, g0, na, pb, al)

            lanes_last = lambda a: P(*([None] * (a.ndim - 1) + ["lanes"]))  # noqa: E731
            packed, llks = jax.shard_map(
                _body,
                mesh=mesh,
                in_specs=tuple(lanes_last(a) for a in args),
                out_specs=(P(None, None, "lanes"), P(None, "lanes")),
                check_vma=False,
            )(*args)
        # sync on a tiny slice: separates kernel time from trace
        # transfer in the timing summary (block_until_ready does not
        # block through the remote tunnel)
        np.asarray(llks[-1, :1])
    kept = steps - burn
    if tabulate and kept > 0:
        # device-side posterior tabulation: fetch only the distinct
        # genotype states + multiplicities per chain lane instead of the
        # full kept trace (ops/trace_tab.py; reference tabulation
        # semantics classes.py:307-325 moved on-device)
        from mchap_tpu.ops.pallas_denovo import _next_pow2
        from mchap_tpu.ops.trace_tab import (
            decode_tabulated_states,
            tabulate_packed_trace,
        )

        base = _next_pow2(max(max_allele, 2))
        n_cap = min(kept, 512)
        with _timing.stage("device.tabulate"):
            words, counts_t, first_t, n_uniq, llks_t = tabulate_packed_trace(
                packed, llks, ploidy=ploidy, base=base, n_cap=n_cap,
                burn=burn,
            )
            n_uniq_h = np.asarray(n_uniq)[:b]
        max_u = int(n_uniq_h.max(initial=1))
        if max_u <= n_cap:
            # fetch the smallest pow-2 state prefix covering every lane
            # (pow-2 bucketing keeps the slice-program count bounded)
            k = 1
            while k < max_u:
                k *= 2
            k = min(k, words.shape[0])
            pack_dtype = (
                jnp.uint8
                if float(base) ** ploidy <= 256
                else jnp.int16
                if float(base) ** ploidy <= 32768
                else jnp.int32
            )
            with _timing.stage("device.trace_fetch"):
                # O(n_unique) transfer total: states, multiplicities,
                # first-seen indices, AND per-state llks — nothing
                # O(n_steps) crosses the tunnel on this path
                words_h = np.asarray(words[:k].astype(pack_dtype))[..., :b]
                counts_h = np.asarray(counts_t[:k])[:, :b]
                first_h = np.asarray(first_t[:k])[:, :b]
                llks_h = np.asarray(llks_t[:k])[:, :b]
            with _timing.stage("device.trace_unpack"):
                alleles = decode_tabulated_states(
                    words_h, ploidy, base
                )  # [k, P, NB, b]
            st = alleles.reshape(
                k, ploidy, n_pos, n_samples, chains
            ).transpose(3, 4, 0, 1, 2)  # [S, C, k, P, NB]
            cnts = counts_h.reshape(k, n_samples, chains).transpose(
                1, 2, 0
            )
            firsts = first_h.reshape(k, n_samples, chains).transpose(
                1, 2, 0
            )
            llks_r = llks_h.reshape(k, n_samples, chains).transpose(
                1, 2, 0
            )
            return [
                TabulatedGenotypeTrace(
                    _restore_cols(st[i], i),
                    cnts[i],
                    firsts[i],
                    (llks_r[i] + fix_llk[i]).astype(float),
                    pre_burned=burn,
                    kept=kept,
                )
                for i in range(n_samples)
            ]
        # > n_cap distinct states in some lane (diffuse posterior):
        # fall through to the full-trace fetch below.  Tally it so a
        # real run's timing summary shows how often the cap bites.
        _fallback.note_path("denovo-tabulate", "overflow-full-fetch")

    # pull the base-packed trace (4x less tunnel traffic than unpacked
    # int8 alleles) and decode host-side
    from mchap_tpu.ops.pallas_denovo import unpack_genotype_trace

    # slice the burn-in ON DEVICE: only kept steps cross the link
    with _timing.stage("device.trace_fetch"):
        packed_host = np.asarray(packed[burn:])[..., :b]
        llks = np.asarray(llks[burn:])[:, :b]
    with _timing.stage("device.trace_unpack"):
        genotypes = unpack_genotype_trace(
            packed_host, ploidy, max_allele
        )  # [steps - burn, P, NB, S*chains]
    kept = steps - burn
    genotypes = genotypes.reshape(kept, ploidy, n_pos, n_samples, chains)
    genotypes = genotypes.transpose(3, 4, 0, 1, 2)  # [S, chains, kept, P, NB]
    llks = llks.reshape(kept, n_samples, chains).transpose(1, 2, 0)
    out = []
    for i in range(n_samples):
        t = GenotypeMultiTrace(
            _restore_cols(genotypes[i], i),
            (llks[i] + fix_llk[i]).astype(float),
        )
        t.pre_burned = burn
        out.append(t)
    return out


def fit_denovo_batch(
    ploidy,
    n_alleles,
    reads_list,
    counts_list,
    inbreeding_list=None,
    steps=1000,
    chains=2,
    alpha=1.0,
    beta=3.0,
    fix_homozygous=0.999,
    recombination_step_probability=0.5,
    partial_dosage_step_probability=0.5,
    dosage_step_probability=1.0,
    temperatures=(1.0,),
    random_seed=None,
    burn=0,
):
    """Run the de novo assembler for MANY samples in one device program.

    The reference application loops samples sequentially
    (application/assemble.py:109); here samples are a vmapped batch axis
    of the jitted sampler (per-sample homozygote fixing, break
    distributions, and inbreeding ride along as traced inputs).
    Returns a list of GenotypeMultiTrace, one per sample.
    """
    from mchap_tpu.models.calling import _pad_reads_bucket

    n_samples = len(reads_list)
    n_alleles = np.array(n_alleles, dtype=np.int8)
    n_pos = len(n_alleles)
    use_prior = inbreeding_list is not None
    inbreeding = (
        np.asarray(inbreeding_list, float) if use_prior else np.zeros(n_samples)
    )

    if n_pos == 0:
        return [
            GenotypeMultiTrace(
                np.zeros((chains, steps, ploidy, 0), np.int8),
                np.full((chains, steps), np.nan),
            )
            for _ in range(n_samples)
        ]

    # mock zero-read samples with a single all-gap read (mcmc.py:132-137)
    reads_list = [
        r if len(r) else np.full((1,) + r.shape[1:], np.nan) for r in reads_list
    ]
    counts_list = [c if len(c) else np.ones(1) for c in counts_list]
    reads, counts = _pad_reads_bucket(reads_list, counts_list)
    n_alleles_mat = np.broadcast_to(
        n_alleles[None, :], (n_samples, n_pos)
    ).copy()
    return _fit_denovo_core(
        reads, counts, n_alleles_mat, ploidy, use_prior, inbreeding,
        steps, chains, alpha, beta, fix_homozygous,
        recombination_step_probability, partial_dosage_step_probability,
        dosage_step_probability, temperatures, random_seed, burn=burn,
    )


def _fit_denovo_core(
    reads, counts, n_alleles_mat, ploidy, use_prior, inbreeding,
    steps, chains, alpha, beta, fix_homozygous,
    recombination_step_probability, partial_dosage_step_probability,
    dosage_step_probability, temperatures, random_seed, burn=0,
):
    """Shared batched-assembly core over pre-padded arrays.

    ``n_alleles_mat`` is PER PROBLEM ([S, nb]); positions with
    n_alleles <= 1 (cross-locus padding, fit_denovo_multi) are forced
    homozygous-fixed at allele 0, which the samplers treat as provable
    no-ops.
    """
    n_samples, _, n_pos, _ = reads.shape

    # per-sample homozygote fixing, all samples in one device program
    with _timing.stage("device.homfilter"):
        hom = np.asarray(
            _kernel.homozygosity_probabilities_batch(
                reads,
                n_alleles_mat,
                ploidy,
                use_prior=use_prior,
                inbreeding_b=inbreeding,
                read_counts_b=counts,
            )
        )  # [S, nb, A]
    fixed = hom >= fix_homozygous
    homozygous = np.any(fixed, axis=-1) | (n_alleles_mat <= 1)  # [S, nb]
    fixed_allele = np.where(
        np.any(fixed, axis=-1), np.argmax(fixed, axis=-1), 0
    )
    fixed_allele = np.where(homozygous, fixed_allele, 0)
    n_alleles_eff = np.where(homozygous, 1, n_alleles_mat).astype(np.int32)
    n_het = (~homozygous).sum(axis=-1)

    break_dist = np.zeros((n_samples, n_pos))
    for i in range(n_samples):
        if n_het[i] > 0:
            break_dist[i, : n_het[i]] = _point_beta_probabilities(
                int(n_het[i]), alpha, beta
            )
        else:
            break_dist[i, 0] = 1.0

    temps = np.sort(np.asarray(temperatures, float))
    assert temps[-1] == 1.0

    seed = random_seed if random_seed is not None else 0
    key = jax.random.PRNGKey(seed)
    kinit, krun = jax.random.split(key)

    with _timing.stage("host.chain_init"):
        init = np.zeros((n_samples, chains, ploidy, n_pos), np.int32)
        u_all = np.asarray(
            jax.random.uniform(
                kinit, (n_samples, chains, ploidy, n_pos, 1), dtype=jnp.float64
            )
        )
        for i in range(n_samples):
            dist = _read_mean_dist(reads[i])
            cdf = np.cumsum(dist, axis=-1)
            sampled = (u_all[i] > cdf[None, None]).sum(axis=-1).astype(np.int32)
            init[i] = np.where(
                homozygous[i][None, None, :], fixed_allele[i][None, None, :],
                sampled,
            )

    # fast path: the VMEM-resident full-step pallas kernel covers the
    # flat-prior configuration on TPU, single-temperature or with a
    # tempering ladder of up to 8 rungs (ladder replicas ride the
    # kernel's chunk axis with in-kernel neighbor swaps)
    n_reads_b = reads.shape[1]
    max_allele = reads.shape[-1]
    n_temps = len(temps)
    # the wrapper's real VMEM constraint at its minimum chunk width:
    # the prepared-reads block dominates; genotype/rh scratch ride
    # along.  The wrapper compacts het positions (fixed/padding sites
    # drop out of the kernel), so size against the compacted width
    chunk_min = max(1, n_temps)
    nb_gate = min(n_pos, (max(int(n_het.max(initial=0)), 1) + 7) // 8 * 8)
    vmem_est = 128 * chunk_min * 4 * (
        n_reads_b * nb_gate * max_allele  # lr block
        + 2 * ploidy * (nb_gate + n_reads_b)  # genotype + rh scratch
        + 2 * n_reads_b  # counts
        + 8  # per-lane scalars
    )
    base_pack = 1
    while base_pack < max(max_allele, 2):
        base_pack *= 2
    # Dirichlet-multinomial prior runs in-kernel when every sample is
    # genuinely inbred (F == 0 means the flat-prior branch host-side)
    all_inbred = use_prior and bool(np.all(np.asarray(inbreeding) > 0))
    if (
        (not use_prior or all_inbred)
        and n_temps <= 8
        and jax.default_backend() not in ("cpu",)
        and vmem_est < 10 * 1024 * 1024
        and float(base_pack) ** ploidy <= 2.0 ** 24
    ):
        try:
            if all_inbred:
                log_uh = np.sum(
                    np.log(n_alleles_eff.astype(float)), axis=1
                )  # [S]
                alphas = (
                    (1.0 - np.asarray(inbreeding)) / np.asarray(inbreeding)
                ) * np.exp(-log_uh)
            else:
                alphas = None
            import os as _os

            # host-side numpy read preparation: the jnp version costs an
            # upload (f64 reads) + fetch (f32 logs) through the remote
            # tunnel per block; the math is three elementwise ops
            from mchap_tpu.ops.likelihood import MIN_LOG as _ML

            with np.errstate(divide="ignore", invalid="ignore"):
                lr_host = np.maximum(
                    np.log(np.where(np.isnan(reads), 1.0, reads)), _ML
                ).astype(np.float32)
            traces = _fit_denovo_batch_pallas(
                lr_host,
                counts, init, n_alleles_eff, break_dist, ploidy, steps,
                chains, seed, recombination_step_probability,
                partial_dosage_step_probability, dosage_step_probability,
                temperatures=temps, alphas=alphas, burn=burn,
                tabulate=_os.environ.get("MCHAP_TABULATE", "1") != "0",
            )
            out = []
            kept = steps - burn
            for i in range(n_samples):
                if homozygous[i].all():
                    haplotype = fixed_allele[i].astype(np.int8)
                    g = np.tile(haplotype, (chains, kept, ploidy, 1))
                    t = GenotypeMultiTrace(g, np.full((chains, kept), np.nan))
                    t.pre_burned = burn
                    out.append(t)
                else:
                    out.append(traces[i])
            _fallback.note_path("denovo", "pallas")
            return out
        except Exception as e:  # noqa: BLE001 — reported, strict-gated
            _fallback.note_fallback("denovo", e, to="xla")
    else:
        _fallback.note_path("denovo", "xla")

    def one(key, init_i, lr, c, na, bd, ib):
        return _kernel.denovo_sampler(
            key,
            init_i,
            lr,
            c,
            na,
            bd,
            jnp.asarray(temps),
            n_steps=steps,
            use_prior=use_prior,
            inbreeding=ib,
            recombination_step_probability=recombination_step_probability,
            partial_dosage_step_probability=partial_dosage_step_probability,
            dosage_step_probability=dosage_step_probability,
        )

    # multi-chip: the (locus, sample) problem batch shards over the
    # device mesh (placement only; see parallel.sharding)
    from mchap_tpu.parallel.sharding import problem_mesh, shard_problems

    # f64 prepared reads are an XLA-path input only — computed here, not
    # before the fast-path dispatch (the eager prepare + host fetch cost
    # seconds per block through the remote tunnel and the pallas path
    # re-prepares at f32 itself)
    log_reads = prepare_reads(reads)  # [S, R, nb, A]
    keys = jax.random.split(krun, n_samples)
    mesh = problem_mesh(n_samples)
    _, keys_s, init_s, lr_s, counts_s, na_s, bd_s, ib_s = shard_problems(
        mesh, n_samples, np.asarray(keys), init, np.asarray(log_reads),
        np.asarray(counts, np.float64), n_alleles_eff,
        np.asarray(break_dist), np.asarray(inbreeding, np.float64),
    )
    genotypes, llks = jax.vmap(one)(
        keys_s, init_s, lr_s, counts_s, na_s, bd_s, ib_s
    )
    from mchap_tpu.parallel.sharding import gather_result

    genotypes = gather_result(genotypes)[:n_samples]
    llks = gather_result(llks)[:n_samples]

    out = []
    for i in range(n_samples):
        if homozygous[i].all():
            # all-fixed shortcut semantics (nan llks, constant genotype)
            haplotype = fixed_allele[i].astype(np.int8)
            g = np.tile(haplotype, (chains, steps, ploidy, 1))
            out.append(GenotypeMultiTrace(g, np.full((chains, steps), np.nan)))
        else:
            out.append(GenotypeMultiTrace(genotypes[i], llks[i]))
    return out


def fit_denovo_multi(
    problems,
    ploidy,
    steps=1000,
    chains=2,
    alpha=1.0,
    beta=3.0,
    fix_homozygous=0.999,
    recombination_step_probability=0.5,
    partial_dosage_step_probability=0.5,
    dosage_step_probability=1.0,
    temperatures=(1.0,),
    random_seed=None,
    burn=0,
):
    """Run the de novo assembler for problems from MANY LOCI in one
    device program (cross-locus streaming).

    Each problem is a dict with ``reads`` (float[R, nb_i, A_i]),
    ``counts`` (float[R]), ``n_alleles`` (int[nb_i]) and optionally
    ``inbreeding``.  Problems are padded to a common
    [R_max, nb_max, A_max] bucket; padded positions are all-gap reads
    with n_alleles = 1, which the samplers provably never move (the
    cross-locus analogue of the homozygote-fixed static-shape design).
    The reference parallelises this axis with one process per locus
    (baseclass.py:360-394).  Returns one GenotypeMultiTrace per
    problem, sliced back to its true position count.
    """
    n_prob = len(problems)
    nb_list = [len(p["n_alleles"]) for p in problems]
    a_list = [
        (p["reads"].shape[2] if p["reads"].ndim == 3 and p["reads"].shape[2] else 1)
        for p in problems
    ]
    r_list = [max(len(p["reads"]), 1) for p in problems]

    # partition the block into padded-shape BUCKETS so one worst-case
    # locus doesn't drag every problem to its shape: a single triallelic
    # site would force the whole block off the kernel's biallelic fast
    # path (~A-fold more candidate scoring).  Buckets are deliberately
    # COARSE — allele radix (pow 2) and a two-tier read class (<= 64 /
    # pow-2 above) — because every distinct bucket shape costs fresh
    # device-program compiles (tens of seconds each through the remote
    # tunnel; a finer NB/R key once split a 20-locus block into 18
    # buckets and compile time dwarfed the sampling).  Position width is
    # NOT part of the key: the pallas wrapper compacts het positions to
    # the batch's max het width anyway, so padding NB to the bucket max
    # is stripped before the kernel.  Each bucket runs as its own device
    # program with a distinct derived seed.
    def _bucket_key(i):
        a_b = 2
        while a_b < a_list[i]:
            a_b *= 2
        r_b = 64
        while r_b < r_list[i]:
            r_b *= 2
        return (a_b, r_b)

    buckets = {}
    for i in range(n_prob):
        buckets.setdefault(_bucket_key(i), []).append(i)
    if len(buckets) > 1:
        out = [None] * n_prob
        base_seed = random_seed if random_seed is not None else 0
        for ordinal, key in enumerate(sorted(buckets)):
            idxs = buckets[key]
            sub = fit_denovo_multi(
                [problems[i] for i in idxs],
                ploidy,
                steps=steps,
                chains=chains,
                alpha=alpha,
                beta=beta,
                fix_homozygous=fix_homozygous,
                recombination_step_probability=recombination_step_probability,
                partial_dosage_step_probability=partial_dosage_step_probability,
                dosage_step_probability=dosage_step_probability,
                temperatures=temperatures,
                random_seed=base_seed + 7919 * ordinal,
                burn=burn,
            )
            for i, t in zip(idxs, sub):
                out[i] = t
        return out

    nb_max = max(nb_list + [0])
    if nb_max:
        # round the block's position width to a multiple of 8: stable
        # compiled shapes across blocks (compaction strips the padding
        # before the kernel; padded positions are frozen no-ops)
        nb_max = (nb_max + 7) // 8 * 8
    if nb_max == 0:
        return [
            GenotypeMultiTrace(
                np.zeros((chains, steps, ploidy, 0), np.int8),
                np.full((chains, steps), np.nan),
            )
            for _ in range(n_prob)
        ]
    a_max = max(a_list)
    # power-of-two read bucket with a floor of 64: stable compiled
    # shapes across blocks (matching the bucket key's read classes) and
    # aligned sublane tiles for the pallas kernel (padding reads are
    # all-gap with zero counts)
    r_max = 64
    while r_max < max(r_list):
        r_max *= 2

    use_prior = any(p.get("inbreeding") is not None for p in problems)
    inbreeding = np.array(
        [float(p.get("inbreeding") or 0.0) for p in problems]
    )

    reads = np.full((n_prob, r_max, nb_max, a_max), np.nan)
    counts = np.zeros((n_prob, r_max))
    n_alleles_mat = np.ones((n_prob, nb_max), np.int32)
    for i, p in enumerate(problems):
        r_i, nb_i, a_i = len(p["reads"]), nb_list[i], a_list[i]
        if r_i and nb_i:
            reads[i, :r_i, :nb_i, :a_i] = p["reads"]
            # allele slots beyond the problem's own allele axis are
            # impossible observations (prob 0 -> MIN_LOG), not gaps
            reads[i, :r_i, :nb_i, a_i:] = 0.0
            counts[i, :r_i] = p["counts"]
        else:
            # zero reads: single all-gap mock read (mcmc.py:132-137)
            counts[i, 0] = 1.0
        n_alleles_mat[i, :nb_i] = np.asarray(p["n_alleles"], np.int32)

    traces = _fit_denovo_core(
        reads, counts, n_alleles_mat, ploidy, use_prior, inbreeding,
        steps, chains, alpha, beta, fix_homozygous,
        recombination_step_probability, partial_dosage_step_probability,
        dosage_step_probability, temperatures, random_seed, burn=burn,
    )
    return [tr.truncate_positions(nb_list[i]) for i, tr in enumerate(traces)]


@dataclass
class PosteriorGenotypeDistribution:
    """Posterior over phased genotypes; reference classes.py:54-166."""

    genotypes: np.ndarray  # [n_genotypes, ploidy, n_pos]
    probabilities: np.ndarray

    def mode(self):
        idx = np.argmax(self.probabilities)
        return self.genotypes[idx], self.probabilities[idx]

    def mode_genotype_support(self):
        """Dosage-marginal mode: group genotypes by their allele-support
        set, pick the heaviest group (reference semantics classes.py:87-128).
        """
        # support key = the genotype with duplicate haplotype rows
        # dropped; genotypes here are row-sorted (trace canonicalisation)
        # so equal supports serialize identically
        keys = np.array([mset.unique(g).tobytes() for g in self.genotypes])
        _, first, group = np.unique(keys, return_index=True, return_inverse=True)
        group_probs = np.bincount(group, weights=self.probabilities)
        # argmax with ties resolved to the group appearing earliest in
        # the (descending-probability) posterior ordering
        winner = np.lexsort((first, -group_probs))[0]
        member = group == winner
        return GenotypeSupportDistribution(
            self.genotypes[member], self.probabilities[member]
        )

    def allele_frequencies(self, dosage=False):
        """(haplotypes, frequencies, occurrence); classes.py:130-166."""
        n_gen, ploidy, n_base = self.genotypes.shape
        haps = self.genotypes.reshape(n_gen * ploidy, n_base)
        uhaps = mset.unique(haps)
        freqs = {h.tobytes(): 0.0 for h in uhaps}
        occur = {h.tobytes(): 0.0 for h in uhaps}
        for gen, prob in zip(self.genotypes, self.probabilities):
            counts = Counter(hap.tobytes() for hap in gen)
            for key, dose in counts.items():
                freqs[key] += prob * dose
                occur[key] += prob
        ufreqs = np.array([freqs[h.tobytes()] for h in uhaps])
        uoccur = np.array([occur[h.tobytes()] for h in uhaps])
        if dosage is False:
            ufreqs = ufreqs / ploidy
        return uhaps, ufreqs, uoccur


@dataclass
class GenotypeSupportDistribution:
    """Dosage-alternatives of one allele support; classes.py:169-244."""

    genotypes: np.ndarray
    probabilities: np.ndarray

    def alleles(self):
        return mset.unique(self.genotypes[0])

    def mode_genotype(self):
        idx = np.argmax(self.probabilities)
        return self.genotypes[idx], self.probabilities[idx]

    def call_genotype_support(self, threshold=0.95):
        """Most complete allele set exceeding ``threshold``; pads with
        null alleles when needed (reference semantics classes.py:207-244).

        The smallest probability-descending prefix of dosage alternatives
        whose mass reaches ``threshold`` is intersected (multiset-wise);
        haplotypes shared by every member are called, the rest are null.
        """
        order = np.argsort(-self.probabilities, kind="stable")
        if self.probabilities[order[0]] >= threshold:
            return self.genotypes[order[0]], self.probabilities[order[0]]
        cum = np.cumsum(self.probabilities[order])
        k = min(int(np.searchsorted(cum, threshold)) + 1, len(cum))
        shared = reduce(mset.intercept, list(self.genotypes[order[:k]]))
        _, ploidy, n_pos = self.genotypes.shape
        result = np.full((ploidy, n_pos), -1, dtype=self.genotypes.dtype)
        result[: len(shared)] = shared
        return result, cum[k - 1]


@dataclass
class GenotypeMultiTrace:
    """Multi-chain trace of phased genotypes; classes.py:247-376."""

    genotypes: np.ndarray  # [n_chains, n_steps, ploidy, n_pos]
    llks: np.ndarray

    def __post_init__(self):
        if (self.genotypes is not None) and (self.genotypes.shape[-1] != 0):
            g = np.array(self.genotypes)
            assert g.ndim == 4
            n_chains, n_steps, ploidy, n_pos = g.shape
            # canonical per-step ordering: lexicographic row sort, fully
            # vectorized (replaces the reference's per-step python loop)
            flat = g.reshape(n_chains * n_steps, ploidy, n_pos)
            keys = flat.transpose(2, 0, 1)[::-1]  # [n_pos, N, ploidy]
            order = np.lexsort(tuple(keys))  # [N, ploidy]
            flat = np.take_along_axis(flat, order[..., None], axis=1)
            self.genotypes = flat.reshape(g.shape)
            self.llks = np.array(self.llks)

    def burn(self, n):
        """Drop the first ``n`` steps of the ORIGINAL trace.

        Batched device paths may pre-slice the burn-in on device (less
        device->host traffic) and record it in ``pre_burned``; burning
        by the same n again is then a no-op, so application code calls
        ``.burn(mcmc_burn)`` uniformly either way.
        """
        pre = getattr(self, "pre_burned", 0)
        k = max(n - pre, 0)
        new = type(self)(None, None)
        new.genotypes = self.genotypes[:, k:]
        new.llks = self.llks[:, k:]
        new.pre_burned = max(n, pre)
        return new

    def posterior(self):
        n_chain, n_step, ploidy, n_base = self.genotypes.shape
        if n_base == 0:
            return PosteriorGenotypeDistribution(
                np.zeros((1, ploidy, 0), self.genotypes.dtype), np.ones(1)
            )
        genotypes = self.genotypes.reshape(n_chain * n_step, ploidy * n_base)
        with _timing.stage("host.posterior_tab"):
            states, counts = mset.unique_counts(genotypes)
        probs = counts / counts.sum()
        idx = np.flip(np.argsort(probs, kind="stable"))
        return PosteriorGenotypeDistribution(
            states[idx].reshape(len(states), ploidy, n_base), probs[idx]
        )

    def split(self):
        for genotypes, llks in zip(self.genotypes, self.llks):
            new = type(self)(None, None)
            new.genotypes = genotypes[None]
            new.llks = llks[None]
            yield new

    def truncate_positions(self, n_pos):
        """Trace restricted to the leading ``n_pos`` positions.

        Used to strip cross-locus padding positions, which are frozen
        (n_alleles = 1) and identical across every state, so truncation
        never merges distinct genotypes.
        """
        new = type(self)(None, None)
        new.genotypes = self.genotypes[..., :n_pos]
        new.llks = self.llks
        new.pre_burned = getattr(self, "pre_burned", 0)
        return new

    def replicate_incongruence(self, threshold=0.6):
        """0/1/2 = none / incongruent / putative CNV; classes.py:341-376."""
        return _replicate_incongruence(self, threshold)


def _replicate_incongruence(trace, threshold):
    """Shared MCI computation over any trace with split()/posterior()."""
    out = 0
    posteriors = [chain.posterior() for chain in trace.split()]
    chain_modes = [dist.mode_genotype_support() for dist in posteriors]
    alleles = [
        mode.alleles()
        for mode in chain_modes
        if mode.probabilities.sum() >= threshold
    ]
    mode_count = len({array.tobytes() for array in alleles})
    if mode_count > 1:
        out = 1
        ploidy = len(alleles[0])
        allele_count = len(reduce(mset.union, alleles))
        if allele_count > ploidy:
            out = 2
    return out


class TabulatedGenotypeTrace:
    """Device-tabulated MCMC trace: distinct states + counts per chain.

    The posterior-equivalent summary of a ``GenotypeMultiTrace`` with
    O(n_unique) instead of O(n_steps) host memory and device->host
    traffic (ops/trace_tab.py).  Carries, per chain, the distinct
    genotype states (canonical row order), their multiplicities over
    the kept steps, and each state's first-occurrence step index — the
    exact information ``posterior()`` / ``replicate_incongruence()``
    consume (reference classes.py:307-376), with first-seen ordering
    preserved so probability ties resolve identically to the full-trace
    path.

    ``llks`` here is PER-STATE (each distinct state's log-likelihood at
    its first occurrence, aligned with ``states``/``counts``), not the
    per-step llk sequence of ``GenotypeMultiTrace`` — the VCF pipeline
    never consumes the step sequence (GL/GP come from exact
    enumeration, application/assemble.py:234-258), so fetching it
    through the device link would defeat the O(n_unique) transfer this
    class exists for.
    """

    def __init__(self, states, counts, first, llks, pre_burned=0, kept=None):
        self.states = np.asarray(states)  # [chains, k, ploidy, n_pos] int8
        self.counts = np.asarray(counts)  # [chains, k]
        self.first = np.asarray(first)  # [chains, k] kept-step index
        self.llks = np.asarray(llks)  # [chains, k] per-state llk
        self.pre_burned = pre_burned
        self.kept = int(self.counts.sum(axis=1).max()) if kept is None else kept

    def burn(self, n):
        """No-op when the burn-in was already sliced on device."""
        if max(n - self.pre_burned, 0):
            raise ValueError(
                "tabulated trace cannot burn beyond its device-side "
                f"burn-in ({self.pre_burned} steps)"
            )
        return self

    def truncate_positions(self, n_pos):
        """See GenotypeMultiTrace.truncate_positions."""
        return TabulatedGenotypeTrace(
            self.states[..., :n_pos],
            self.counts,
            self.first,
            self.llks,
            self.pre_burned,
            self.kept,
        )

    def posterior(self):
        n_chains, k, ploidy, n_pos = self.states.shape
        if n_pos == 0:
            return PosteriorGenotypeDistribution(
                np.zeros((1, ploidy, 0), self.states.dtype), np.ones(1)
            )
        mask = self.counts > 0
        flat = self.states[mask]  # [M, ploidy, n_pos]
        cnt = self.counts[mask].astype(float)
        chain_of = np.broadcast_to(
            np.arange(n_chains)[:, None], (n_chains, k)
        )[mask]
        # global first-seen index over the chain-major flattened trace
        # (the order mset.unique_counts sees in the full-trace path)
        seen = chain_of.astype(np.int64) * self.kept + self.first[mask]
        keys = mset._keys(flat.reshape(len(flat), ploidy * n_pos))
        uniq, rep_idx, inverse = np.unique(
            keys, return_index=True, return_inverse=True
        )
        totals = np.bincount(inverse, weights=cnt)
        first_seen = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(first_seen, inverse, seen)
        order = np.argsort(first_seen, kind="stable")
        states_u = flat[rep_idx][order]
        probs = totals[order] / totals.sum()
        idx = np.flip(np.argsort(probs, kind="stable"))
        return PosteriorGenotypeDistribution(states_u[idx], probs[idx])

    def split(self):
        for c in range(self.states.shape[0]):
            yield TabulatedGenotypeTrace(
                self.states[c : c + 1],
                self.counts[c : c + 1],
                self.first[c : c + 1],
                self.llks[c : c + 1],
                self.pre_burned,
                self.kept,
            )

    def replicate_incongruence(self, threshold=0.6):
        """0/1/2 = none / incongruent / putative CNV; classes.py:341-376."""
        return _replicate_incongruence(self, threshold)


def call_posterior_haplotypes(posteriors, threshold=0.01):
    """Pool per-sample posteriors into a population allele panel.

    Every haplotype whose occurrence probability reaches ``threshold``
    in at least one sample enters the panel; alleles are weighted by
    their summed posterior dosage across samples and emitted in VCF
    order — the reference (all-zero) haplotype first, alternates by
    descending pooled weight.  Returns ``(haplotypes, ref_observed)``.
    Output-contract semantics match reference haplotype_calling.py:4-64
    (re-derived on stacked arrays rather than per-haplotype dicts).
    """
    n_base = posteriors[0].genotypes.shape[-1]
    kept = []
    kept_weights = []
    for post in posteriors:
        haps, weights, probs = post.allele_frequencies(dosage=True)
        supported = probs >= threshold
        kept.append(haps[supported])
        kept_weights.append(weights[supported])
    pool = np.concatenate(
        [np.asarray(h).reshape(len(h), n_base) for h in kept], axis=0
    ).astype(np.int8)
    pool_weights = np.concatenate(kept_weights)

    # sum weights over duplicate rows, keeping first-appearance order
    # (the tie-break order of the final sort)
    uniq, first, inverse = np.unique(
        pool, axis=0, return_index=True, return_inverse=True
    )
    totals = np.bincount(inverse, weights=pool_weights, minlength=len(uniq))
    appearance = np.argsort(first, kind="stable")
    uniq, totals = uniq[appearance], totals[appearance]

    # the reference allele is emitted first whether observed or not
    is_ref = np.all(uniq == 0, axis=1)
    ref_observed = bool(is_ref.any())
    alts, alt_weights = uniq[~is_ref], totals[~is_ref]
    panel = np.concatenate([alts, np.zeros((1, n_base), np.int8)], axis=0)
    weights = np.append(alt_weights, alt_weights.max(initial=-1.0) + 1.0)
    order = np.flip(np.argsort(weights, kind="stable"))
    return panel[order], ref_observed
