"""Device-mesh scale-out: shard locus x sample problems across chips.

The reference scales by forking one process per locus block
(baseclass.py:360-394) and pools population statistics in the parent.
Here the same data parallelism is a sharded device axis: a batch of
padded (locus, sample) problems shards over a 1-D ``jax.sharding.Mesh``
("loci" axis); each chip runs the batched MCMC for its shard, and the
population reductions that the reference computes in the parent process
(per-sample allele counts -> AFP/ACP, product-of-complements -> AOP;
baseclass.py:245-301) become ``psum`` collectives over ICI.
"""



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mchap_tpu.ops import calling_mcmc as _kernel


def device_mesh(devices=None, axis="loci"):
    """1-D mesh over all (or the given) devices."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def sharded_calling_step(
    mesh,
    *,
    n_steps,
    ploidy,
    step_type=0,
    prior_kind=0,
):
    """Build the jitted multi-chip calling-MCMC step.

    Returns fn(key, initial [B, C, ploidy], read_hap [B, R, H],
    read_counts [B, R]) -> (genotypes [B, C, n_steps, ploidy],
    llks [B, C, n_steps], allele_counts [H]) where B (the problem batch)
    shards over the mesh and ``allele_counts`` is the population-pooled
    posterior allele count (the AFP/ACP reduction) computed with a psum
    over the mesh axis.
    """
    axis = mesh.axis_names[0]
    batched = jax.vmap(
        lambda key, initial, rh, counts: _kernel.calling_sampler(
            key,
            initial,
            rh,
            counts,
            n_steps=n_steps,
            step_type=step_type,
            prior_kind=prior_kind,
        )
    )

    def per_shard(key, initial, read_hap, read_counts):
        b = initial.shape[0]
        keys = jax.random.split(key[0], b)
        genotypes, llks = batched(keys, initial, read_hap, read_counts)
        # population allele-count pooling across ALL problems (the
        # reference's parent-process reduction) via an ICI collective
        n_alleles = read_hap.shape[-1]
        onehot = jax.nn.one_hot(genotypes, n_alleles, dtype=jnp.float32)
        local_counts = jnp.sum(onehot, axis=(0, 1, 2, 3))
        total_counts = jax.lax.psum(local_counts, axis)
        return genotypes, llks, total_counts

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
    )
    return jax.jit(fn)


def make_problem_batch(rng, n_problems, n_chains, ploidy, n_reads, n_pos, n_haps,
                       dtype=np.float32):
    """Synthetic padded problem batch for scale tests and benches."""
    from mchap_tpu.ops.likelihood import prepare_reads, read_hap_loglik

    haplotypes = rng.integers(0, 2, size=(n_haps, n_pos)).astype(np.int8)
    truth = rng.integers(0, n_haps, size=(n_problems, ploidy))
    read_sources = haplotypes[
        truth[:, rng.integers(0, ploidy, size=n_reads)]
    ]  # [B, R, n_pos]
    p_correct = 0.99
    onehot = read_sources[..., None] == np.arange(2)
    reads = np.where(onehot, p_correct, 1 - p_correct).astype(dtype)
    log_reads = prepare_reads(reads, dtype=jnp.dtype(dtype))
    read_hap = read_hap_loglik(log_reads, jnp.asarray(haplotypes))  # [B, R, H]
    read_counts = jnp.ones((n_problems, n_reads), dtype)
    initial = jnp.zeros((n_problems, n_chains, ploidy), jnp.int32)
    return initial, read_hap, read_counts
