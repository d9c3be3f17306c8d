"""Pallas TPU kernel: the calling-model Gibbs sampler resident in VMEM.

The XLA version (ops/calling_mcmc.py) streams [chains, R, H] tensors
through HBM on every slot update; profiled on v5e it reaches only ~5% of
HBM bandwidth because the hot arrays are small and oddly shaped (H lanes
<< 128).  This kernel restructures the problem for the hardware:

- the chain batch rides the 128-wide LANE axis (a tile of 128 chains per
  grid row), so every vector op is fully occupied;
- MCMC steps are the inner GRID dimension: sampler state (per-slot
  genotype one-hots and per-read selected log-probs) persists across
  grid iterations in VMEM scratch, so the only HBM traffic per step is
  the [ploidy, 128] trace write;
- per-lane categorical draws use the on-core PRNG
  (pltpu.prng_random_bits) with Gumbel-max selection (exact categorical);
- the genotype trace is row-sorted with a static compare-swap network.

Semantics match the flat-prior Gibbs sampler
(calling_mcmc.calling_sampler with prior_kind=0, step_type=0) except the
slot-visit order is a fixed systematic sweep instead of a fresh random
permutation per step — both are valid scan orders for the same
stationary distribution (each slot update is an exact Gibbs
conditional); verified against exact enumeration.

Mosaic lowering constraints honoured here: no dynamic_update_slice or
scatter on VALUES (per-slot state uses static indices / scratch refs),
no float iota, i32 loop/grid arithmetic (x64 python ints would become
i64, which Mosaic cannot lower).

Reference for the underlying math: mchap/calling/mcmc.py:143-327.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _uniform_from_bits(bits):
    """uint32 random bits -> floats in (0, 1).

    Clamped away from 0 so the Gumbel transform stays finite; with the
    all-zero bits of the CPU interpreter (whose PRNG is a no-op) the
    Gumbel term becomes constant and the sampler degenerates to
    deterministic greedy argmax — exploited by the interpret-mode tests.
    """
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1e-12)


def _make_kernel(n_steps, ploidy, n_reads, n_alleles):
    """Kernel factory; the body is the variant empirically verified to
    compile under the Mosaic toolchain (see module docstring)."""
    STEPS = n_steps
    P = ploidy
    H = n_alleles

    def kern(seed_ref, rh_ref, counts_ref, nvalid_ref, out_g_ref, out_llk_ref,
             g_s, s_s, e_s, m_s, es_s):
        tile = pl.program_id(0)
        step = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + tile * jnp.int32(STEPS) + step)
        rh = rh_ref[:]
        counts = counts_ref[:]
        nv = nvalid_ref[0, :]  # i32[LANES] per-lane real-allele count
        log_p = jnp.log(jnp.float32(P))

        # Linear-domain formulation: with per-read anchors
        # m[r] = max_h rh[r, h] precomputed once per tile, the slot-k
        # Gibbs candidate likelihood is
        #   llks[h] = sum_r counts * (log(S_rest[r] + exp(rh[r,h] - m)) +
        #             m - log P)
        # where S_rest = sum_{i != k} exp(s_i - m) is maintained from
        # cached per-slot exponentials — ONE log pass over [R, H] per
        # slot instead of the logaddexp (exp+log over [R, H]) plus a
        # 3-row logsumexp of the direct form; transcedental-bound on
        # v5e, this is the dominant cost.
        @pl.when(step == 0)
        def _():
            m = rh[:, 0, :]
            for h in range(1, H):
                m = jnp.maximum(m, rh[:, h, :])
            m_s[:, :] = m
            for h in range(H):
                e_s[:, h, :] = jnp.exp(rh[:, h, :] - m)
            onehot0 = (
                jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 0) == 0
            ).astype(jnp.float32)
            for k in range(P):
                g_s[k, :, :] = onehot0
                s0 = jnp.sum(onehot0[None] * rh, axis=1)
                s_s[k, :, :] = s0
                es_s[k, :, :] = jnp.exp(s0 - m)

        m = m_s[:, :]  # [R, LANES]
        e_rh = e_s[:]  # [R, H, LANES]
        llk = jnp.zeros(LANES, jnp.float32)
        dosage = jnp.zeros((H, LANES), jnp.float32)
        for k in range(P):
            s_rest = jnp.zeros((n_reads, LANES), jnp.float32)
            for i in range(P):
                if i != k:
                    s_rest = s_rest + es_s[i, :, :]
            cand = jnp.log(s_rest[:, None, :] + e_rh) + (m - log_p)[:, None, :]
            llks = jnp.sum(counts[:, None, :] * cand, axis=0)
            cnt = jnp.zeros((H, LANES), jnp.float32)
            for i in range(P):
                if i != k:
                    cnt = cnt + g_s[i, :, :]
            logits = llks + jnp.log1p(cnt)
            li = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 0)
            logits = jnp.where(li < nv[None, :], logits, jnp.float32(-1e30))
            u = _uniform_from_bits(
                pltpu.bitcast(pltpu.prng_random_bits((H, LANES)), jnp.uint32)
            )
            scores = logits - jnp.log(-jnp.log(u))
            best = jnp.max(scores, axis=0)
            idx = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 0)
            cand_idx = jnp.where(scores == best[None, :], idx, jnp.int32(H))
            choice_idx = jnp.min(cand_idx, axis=0)
            choice_onehot = (idx == choice_idx[None, :]).astype(jnp.float32)
            g_s[k, :, :] = choice_onehot
            s_new = jnp.sum(choice_onehot[None] * rh, axis=1)
            s_s[k, :, :] = s_new
            es_s[k, :, :] = jnp.sum(choice_onehot[None] * e_rh, axis=1)
            dosage = cnt + choice_onehot
            llk = jnp.sum(llks * choice_onehot, axis=0)
        out_g_ref[0, :, :] = dosage
        out_llk_ref[0, :, :] = llk[None, :]

    return kern


@functools.partial(
    jax.jit, static_argnames=("n_steps", "ploidy", "interpret")
)
def pallas_calling_sampler(seed, read_hap, read_counts, *, n_steps, ploidy,
                           n_valid=None, interpret=False):
    """Run the VMEM-resident Gibbs sampler for many chains.

    Parameters
    ----------
    seed : int32 scalar array
    read_hap : f32[R, H, n_chains] — read x haplotype log-probs, chain-last
        (n_chains must be a multiple of 128)
    read_counts : f32[R, n_chains]
    n_steps, ploidy : static
    n_valid : i32[n_chains] or None — per-chain count of real alleles;
        columns >= n_valid[c] of chain c's panel are cross-locus batch
        padding, masked out of every draw (defaults to H for all chains)

    Returns
    -------
    genotypes : int32[n_steps, ploidy, n_chains] (sorted per step; decoded
        from the kernel's dosage-vector trace)
    llks : f32[n_steps, n_chains]
    """
    n_reads, n_real, n_chains = read_hap.shape
    assert n_chains % LANES == 0
    n_tiles = n_chains // LANES
    # pad the allele axis to a multiple of 8 (f32 sublane tile)
    n_alleles = ((n_real + 7) // 8) * 8
    if n_alleles != n_real:
        pad = jnp.full((n_reads, n_alleles - n_real, n_chains), 0.0, read_hap.dtype)
        read_hap = jnp.concatenate([read_hap, pad], axis=1)
    if n_valid is None:
        n_valid = jnp.full((n_chains,), n_real)
    n_valid = jnp.asarray(n_valid, jnp.int32).reshape(1, n_chains)
    kernel = _make_kernel(n_steps, ploidy, n_reads, n_alleles)
    out_shapes = (
        jax.ShapeDtypeStruct((n_steps, n_alleles, n_chains), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, 1, n_chains), jnp.float32),
    )
    grid = (n_tiles, n_steps)
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (n_reads, n_alleles, LANES),
                lambda i, j: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_reads, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
        ]
    out_specs = (
        pl.BlockSpec(
            (1, n_alleles, LANES),
            lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, LANES), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
        ),
    )
    interp = pltpu.InterpretParams() if interpret else False
    # trace the kernel with x64 disabled: the package enables
    # jax_enable_x64 globally, which promotes literals/counters to
    # 64-bit — types Mosaic cannot legalize
    with jax.enable_x64(False):
        genotypes, llks = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((ploidy, n_alleles, LANES), jnp.float32),
                pltpu.VMEM((ploidy, n_reads, LANES), jnp.float32),
                pltpu.VMEM((n_reads, n_alleles, LANES), jnp.float32),
                pltpu.VMEM((n_reads, LANES), jnp.float32),
                pltpu.VMEM((ploidy, n_reads, LANES), jnp.float32),
            ],
            interpret=interp,
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            read_hap,
            read_counts,
            n_valid,
        )
    # decode dosage counts -> sorted allele indices (slot j holds the
    # smallest allele whose cumulative dosage exceeds j)
    dosage = genotypes.astype(jnp.int32)
    csum = jnp.cumsum(dosage, axis=1, dtype=jnp.int32)  # [steps, H, chains]
    slots = jnp.arange(ploidy, dtype=jnp.int32)
    alleles = jnp.sum(
        (csum[:, None, :, :] <= slots[None, :, None, None]).astype(jnp.int32),
        axis=2,
    )  # [steps, ploidy, chains]
    return alleles, llks[:, 0, :]
