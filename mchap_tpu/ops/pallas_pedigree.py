"""Pallas TPU kernel: the pedigree joint Gibbs sampler resident in VMEM.

The XLA formulation (ops/pedigree_mcmc.py) runs ~12 sequential chromatic
stages per compound step, each a chain of small tensor dispatches; at 64
lanes the device is latency-bound (~28 ms/compound step, <1% VPU — see
BASELINE.md round-4 analysis).  This kernel restructures the problem the
same way ops/pallas_denovo.py restructured the de novo sampler (which
bought 180x over its XLA formulation):

- the (locus x chain) batch rides the 128-wide LANE axis — every vector
  op in the trio/llk math serves 128 independent problems;
- MCMC steps are the inner GRID dimension: all samples' genotypes
  persist across grid iterations in VMEM scratch, so per-step HBM
  traffic is one [S*ploidy, 128] trace write plus the per-sample
  read-hap fetches;
- the read-hap matrices (too large for VMEM all at once: S x R x H x
  128 floats) stay in HBM and are DMA'd per sample-update into a VMEM
  buffer (pltpu.make_async_copy), ~1 MB per fetch against ~100 us of
  trio math per sample — bandwidth is not the bound;
- the trio transition pmf (reference mchap/pedigree/prior.py:484-722)
  is evaluated for ALL H candidate alleles of a slot at once in LINEAR
  probability space: the gamete-dosage enumeration over the static
  composition tables becomes, per static table row, a handful of
  vector ops on [H, 128] planes, with all candidate-independent factors
  (the fixed co-parent's side, the error-branch unknown-dosage priors)
  automatically remaining [128]-narrow through broadcasting;
- per-lane categorical draws use the on-core PRNG with Gumbel-max
  selection, as in ops/pallas_calling.py.

Scheduling: samples update sequentially in a fixed order (slots in a
fixed systematic sweep) — a valid Gibbs scan order for the same
stationary distribution as the reference's shuffled sweep
(mchap/pedigree/mcmc.py:362-412); verified against exact enumeration by
scripts/gate_pallas_pedigree.py on TPU (the CPU interpreter PRNG is a
no-op, so CPU tests cover the deterministic greedy limit, see
tests/test_pallas_pedigree.py).  Samples with identical static
configuration (ploidy, parent presence, gamete tau/error, and
config-uniform child classes) share ONE traced update program and loop
over a member list held in SMEM — the traced program size stays
bounded by the number of distinct configurations, not by pedigree size.

Supported statically (else the caller falls back to the XLA path):
- gamete_lambda == 0 everywhere (double reduction falls back; the
  linear-domain comb() zero-semantics used here assume no DR mixture);
- tau_p + tau_q == ploidy for two-parent samples;
- step_type == "Gibbs" (the reference default).

The four-branch error mixture, dosage bookkeeping and gamete pmf match
reference mchap/pedigree/prior.py:329-722; the parental-pair allele
swap matches mchap/pedigree/mcmc.py:503-655.
"""

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mchap_tpu.ops.pallas_calling import _uniform_from_bits

LANES = 128
NEG = -1e30


class UnsupportedPedigree(ValueError):
    """Pedigree configuration outside the kernel's static support."""


def _compositions(total, slots):
    """All vectors of non-negative ints over ``slots`` summing to ``total``
    (the reference's increment_dosage walk, prior.py:230-294, enumerated
    statically at kernel-build time)."""
    if slots == 1:
        return [(total,)]
    out = []
    for first in range(total + 1):
        for rest in _compositions(total - first, slots - 1):
            out.append((first,) + rest)
    return out


# ---------------------------------------------------------------------------
# static plan: group samples by update configuration
# ---------------------------------------------------------------------------


class _SampleCfg(tuple):
    """(ploidy, has_p, has_q, tau_p, tau_q, err_p, err_q,
    ploidy_p, ploidy_q) — static per-sample trio configuration."""

    __slots__ = ()


class _ChildClass(tuple):
    """(side, child_cfg) — static config of a (parent, child) edge:
    ``side`` is which parental slot of the child the updating sample
    occupies (0 or 1); ``child_cfg`` is the child's _SampleCfg."""

    __slots__ = ()


def _sample_cfg(i, ploidy, parents, tau, err):
    p, q = int(parents[i, 0]), int(parents[i, 1])
    has_p, has_q = p >= 0, q >= 0
    return _SampleCfg(
        (
            int(ploidy[i]),
            has_p,
            has_q,
            int(tau[i, 0]),
            int(tau[i, 1]),
            # a missing parent forces the error branch (prior.py:556-557)
            float(err[i, 0]) if has_p else 1.0,
            float(err[i, 1]) if has_q else 1.0,
            int(ploidy[p]) if has_p else 0,
            int(ploidy[q]) if has_q else 0,
        )
    )


class _Plan:
    """Static schedule for one pedigree: update groups + swap pairs.

    groups: list of (cfg, members[G], parents[G,2], child_classes) where
    child_classes is a list of (class_cfg, children[G, Cmax],
    other_parent[G, Cmax]) padded with -1.
    pairs: list of (p, q, cfg_p, cfg_q, parents_p, parents_q,
    child_classes) for the parental-pair swap move, where child_classes
    lists the pair's shared children grouped by config.
    """

    def __init__(self, sample_ploidy, sample_parents, gamete_tau,
                 gamete_lambda, gamete_error, swap_parental_alleles):
        ploidy = np.asarray(sample_ploidy, int)
        parents = np.asarray(sample_parents, int)
        tau = np.asarray(gamete_tau, int)
        lam = np.asarray(gamete_lambda, float)
        err = np.asarray(gamete_error, float)
        n = len(ploidy)
        self.n_samples = n
        self.max_ploidy = int(ploidy.max())
        self.sample_ploidy = ploidy.copy()

        if np.any(lam != 0.0):
            raise UnsupportedPedigree("gamete_lambda != 0 (double reduction)")
        for i in range(n):
            p, q = parents[i]
            if p >= 0 and q >= 0 and tau[i, 0] + tau[i, 1] != ploidy[i]:
                raise UnsupportedPedigree(
                    f"tau sum != ploidy for sample {i}"
                )
            for j, r in enumerate((p, q)):
                if r >= 0 and tau[i, j] < 1:
                    raise UnsupportedPedigree(f"tau < 1 for sample {i}")
                if r >= 0 and tau[i, j] > self.max_ploidy:
                    raise UnsupportedPedigree(f"tau > max ploidy, sample {i}")
            if ploidy[i] < 1:
                raise UnsupportedPedigree(f"ploidy < 1 for sample {i}")

        cfgs = [_sample_cfg(i, ploidy, parents, tau, err) for i in range(n)]
        children = [[] for _ in range(n)]
        for i in range(n):
            seen = set()
            for side in range(2):
                r = parents[i, side]
                if r >= 0 and r not in seen:
                    children[int(r)].append((i, side))
                    seen.add(int(r))

        # group samples by (own cfg, multiset of child-edge classes)
        def child_class(i, side):
            return _ChildClass((side, cfgs[i]))

        group_key = {}
        for i in range(n):
            classes = tuple(
                sorted(
                    (child_class(c, side) for c, side in children[i]),
                    key=lambda t: (t[0], t[1]),
                )
            )
            # two samples share a group only if they have the SAME
            # multiset of child classes (so the padded child matrices
            # line up); differing child counts of the same class are
            # fine (padding masks them)
            key = (cfgs[i], tuple(sorted(set(classes))))
            group_key.setdefault(key, []).append(i)

        self.groups = []
        for (cfg, class_set), members in sorted(
            group_key.items(), key=lambda kv: kv[1][0]
        ):
            members = np.asarray(sorted(members), np.int32)
            par = parents[members].astype(np.int32)
            ccls = []
            for cc in class_set:
                side, ccfg = cc
                rows = []
                for m in members:
                    lst = [
                        (c, parents[c, 1 - side])
                        for c, s in children[int(m)]
                        if s == side and cfgs[c] == ccfg
                    ]
                    rows.append(lst)
                cmax = max(len(r) for r in rows)
                if cmax == 0:
                    continue
                ch = np.full((len(members), cmax), -1, np.int32)
                op = np.full((len(members), cmax), -1, np.int32)
                for gi, lst in enumerate(rows):
                    for ci, (c, o) in enumerate(lst):
                        ch[gi, ci] = c
                        op[gi, ci] = o
                ccls.append((ccfg, int(side), ch, op))
            self.groups.append((cfg, members, par, ccls))

        # parental pairs + blankets (reference mcmc.py:460-500)
        self.pairs = []
        if swap_parental_alleles:
            seen_pairs = set()
            for i in range(n):
                p, q = int(parents[i, 0]), int(parents[i, 1])
                if p < 0 or q < 0:
                    continue
                key = (min(p, q), max(p, q))
                if key in seen_pairs:
                    continue
                seen_pairs.add(key)
                p, q = key
                # children of either parent, grouped by (cfg, which of
                # p/q occupies which parental slot) — the reference's
                # pair blanket (mcmc.py:460-500) spans children of
                # EITHER parent, including half-sibs with a third
                # co-parent (tracked via ``other``)
                kids = sorted(
                    {c for c, _ in children[p]} | {c for c, _ in children[q]}
                )
                kcls = {}
                for c in kids:
                    side_p = side_q = -1
                    other = -1
                    for s2 in range(2):
                        if parents[c, s2] == p:
                            side_p = s2
                        elif parents[c, s2] == q:
                            side_q = s2
                        else:
                            other = int(parents[c, s2])
                    key = (cfgs[c], side_p, side_q)
                    kcls.setdefault(key, []).append((c, other))
                kid_classes = [
                    (
                        key,
                        np.asarray([c for c, _ in cs], np.int32),
                        np.asarray([o for _, o in cs], np.int32),
                    )
                    for key, cs in sorted(
                        kcls.items(), key=lambda kv: kv[1][0][0]
                    )
                ]
                self.pairs.append(
                    (
                        p,
                        q,
                        cfgs[p],
                        cfgs[q],
                        parents[p].astype(np.int32),
                        parents[q].astype(np.int32),
                        kid_classes,
                    )
                )


# ---------------------------------------------------------------------------
# traced math helpers (all linear-domain, f32, broadcast over [H?, LANES])
# ---------------------------------------------------------------------------


def _comb_static(n, g):
    """comb(n, g) for a static small integer g as a polynomial in the
    (integer-valued) tensor n — exactly 0 whenever n < g, which encodes
    the reference's gamete-within-parent constraint for free
    (prior.py:175-202: dosage_permutations)."""
    if g == 0:
        return jnp.ones_like(n)
    out = n
    for d in range(1, g):
        out = out * (n - float(d))
    return out * (1.0 / float(math.factorial(g)))


def _comb_dyn(n, k, kmax):
    """comb(n, k) with k a small-integer tensor in [0, kmax]; values for
    k < 0 are don't-care (callers mask those rows) and return 1."""
    out = jnp.ones_like(n)
    for d in range(1, kmax + 1):
        out = jnp.where(k == float(d), _comb_static(n, d), out)
    return out


def _select_small(s, values):
    """values[int(s)] for an integer-valued tensor s in [0, len-1];
    s < 0 is don't-care (returns values[0])."""
    out = jnp.broadcast_to(jnp.asarray(values[0], jnp.float32), s.shape)
    for d in range(1, len(values)):
        v = values[d]
        out = jnp.where(s == float(d), v, out)
    return out


def _trio_lin(dosage, pdose_p, pdose_q, fr, cfg):
    """Linear-domain trio transition probability, candidates batched.

    Per-slot lists (length = progeny ploidy) of f32 tensors, broadcast
    compatible with each other ([LANES] scalars and/or [H, LANES]
    candidate planes):
      dosage[j]  — progeny allelic dosage credited to slot j (0 at
                   non-first duplicate slots),
      pdose_p[j] — copies of the slot-j allele within parent p,
      pdose_q[j] — within parent q,
      fr[j]      — prior frequency of the slot-j allele.
    cfg: static _SampleCfg.  Returns the linear probability tensor.

    Mirrors reference trio_log_pmf (prior.py:484-722) with lambda == 0:
    the four-way error mixture A (both parents correct), B (p correct),
    C (q correct), D (neither); gamete splits enumerated over the static
    composition tables; comb() == 0 encodes the parental-copy
    constraints, an explicit mask encodes gamete <= progeny dosage.
    """
    P, has_p, has_q, tau_p, tau_q, err_p, err_q, pl_p, pl_q = cfg
    use_p = has_p and err_p < 1.0
    use_q = has_q and err_q < 1.0

    # per-slot frequency powers f^e (e = 0..P), feeding the UN table
    needs_fpow = (err_p > 0.0 and err_q > 0.0) or (
        use_p and err_q > 0.0) or (use_q and err_p > 0.0)
    if needs_fpow:
        fpow = []
        for j in range(P):
            row = [jnp.ones_like(fr[j]), fr[j]]
            for _ in range(P - 1):
                row.append(row[-1] * fr[j])
            fpow.append(row)

    # unknown-branch table UN[j][d] = f^(dosage_j - d) / (dosage_j - d)!
    # — the per-slot factor of the multinomial unknown-dosage prior
    # (prior.py:121-144) for a gamete taking d copies from slot j
    need_d = err_p > 0.0 and err_q > 0.0
    max_tau = max(
        [0]
        + ([tau_p] if use_p and err_q > 0.0 else [])
        + ([tau_q] if use_q and err_p > 0.0 else [])
    )
    if need_d or max_tau > 0:
        un = []
        for j in range(P):
            entries = [
                fpow[j][e] * (1.0 / math.factorial(e)) for e in range(P + 1)
            ]
            un.append(
                [_select_small(dosage[j] - float(d), entries)
                 for d in range(max_tau + 1)]
            )
    # dosage >= g masks (gamete cannot exceed the progeny's dosage)
    if use_p or use_q:
        g_hi = max(tau_p if use_p else 1, tau_q if use_q else 1)
        mge = [
            [None] + [(dosage[j] >= float(g)).astype(jnp.float32)
                      for g in range(1, g_hi + 1)]
            for j in range(P)
        ]

    total = 0.0
    # D: both parents in error — unknown-dosage prior of the full dosage
    if err_p > 0.0 and err_q > 0.0:
        d_term = float(math.factorial(P)) * err_p * err_q
        prod = un[0][0]
        for j in range(1, P):
            prod = prod * un[j][0]
        total = total + d_term * prod

    # A + B: enumeration of parent-p gametes (static composition rows)
    if use_p:
        denom_p = math.comb(pl_p, tau_p)
        w_a = ((1.0 - err_p) * (1.0 - err_q)
               / (denom_p * math.comb(pl_q, tau_q))) if use_q else 0.0
        w_b = ((1.0 - err_p) * err_q
               * math.factorial(P - tau_p) / denom_p) if err_q > 0 else 0.0
        # comb tables hoisted across rows: CP[j][g] = comb(pdose_p_j, g)
        cp = [
            [None] + [_comb_static(pdose_p[j], g) for g in range(1, tau_p + 1)]
            for j in range(P)
        ]
        # CQ[j][d] = comb(pdose_q_j, dosage_j - d) for the complementary
        # gamete of a row taking d copies from slot j
        if use_q:
            cq = [
                [_comb_dyn(pdose_q[j], dosage[j] - float(d), P)
                 for d in range(tau_p + 1)]
                for j in range(P)
            ]
        for row in _compositions(tau_p, P):
            common = None
            for j in range(P):
                if row[j] > 0:
                    f = mge[j][row[j]] * cp[j][row[j]]
                    common = f if common is None else common * f
            if common is None:  # tau_p == 0 cannot happen (checked)
                continue
            if use_q and w_a > 0.0:
                prod = cq[0][row[0]]
                for j in range(1, P):
                    prod = prod * cq[j][row[j]]
                total = total + w_a * common * prod
            if w_b > 0.0:
                prod = un[0][row[0]]
                for j in range(1, P):
                    prod = prod * un[j][row[j]]
                total = total + w_b * common * prod

    # C: parent-q gametes with p in error
    if use_q and err_p > 0.0:
        denom_q = math.comb(pl_q, tau_q)
        w_c = err_p * (1.0 - err_q) * math.factorial(P - tau_q) / denom_q
        cqs = [
            [None] + [_comb_static(pdose_q[j], g) for g in range(1, tau_q + 1)]
            for j in range(P)
        ]
        for row in _compositions(tau_q, P):
            common = None
            for j in range(P):
                if row[j] > 0:
                    f = mge[j][row[j]] * cqs[j][row[j]]
                    common = f if common is None else common * f
            if common is None:
                continue
            prod = un[0][row[0]]
            for j in range(1, P):
                prod = prod * un[j][row[j]]
            total = total + w_c * common * prod

    return total


def _log_or_neg(x):
    return jnp.where(x > 0.0, jnp.log(jnp.maximum(x, 1e-30)), NEG)


def _onehot(idx, n):
    """[LANES] i32 -> [n, LANES] f32 one-hot (all-zero for idx < 0)."""
    io = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)
    return (io == idx[None, :]).astype(jnp.float32)


def _gather_h(oh, plane):
    """sum_h oh[h] * plane[h] -> [LANES]."""
    return jnp.sum(oh * plane, axis=0)


def _dose_of(g_rows, ploidy, n_alleles):
    """[H, LANES] allele-copy counts of a genotype's first ``ploidy``
    slot rows."""
    d = _onehot(g_rows[0], n_alleles)
    for j in range(1, ploidy):
        d = d + _onehot(g_rows[j], n_alleles)
    return d


def _self_slot_inputs(g_rows, k, cfg, dose_p, dose_q, fr_plane, n_alleles):
    """Per-slot trio inputs for updating slot k of the sample itself:
    slot k spans all H candidates ([H, LANES] entries), other slots'
    entries go wide only where the candidate changes their dosage."""
    P = cfg[0]
    oh = [_onehot(g_rows[j], n_alleles) for j in range(P)]
    dosage, pdp, pdq, fr = [], [], [], []
    zero = jnp.zeros((LANES,), jnp.float32)
    for j in range(P):
        if j == k:
            cnt = 1.0
            for i in range(P):
                if i != k:
                    cnt = cnt + oh[i]
            first = 1.0
            for i in range(k):
                first = first * (1.0 - oh[i])
            if isinstance(first, float):
                dosage.append(jnp.full((LANES,), cnt)
                              if isinstance(cnt, float) else cnt)
            else:
                dosage.append(first * cnt)
            pdp.append(dose_p if dose_p is not None else zero)
            pdq.append(dose_q if dose_q is not None else zero)
            fr.append(fr_plane)
        else:
            base_cnt = jnp.zeros((LANES,), jnp.float32)
            for i in range(P):
                if i != k and i != j:
                    base_cnt = base_cnt + (
                        g_rows[i] == g_rows[j]
                    ).astype(jnp.float32)
            base_first = jnp.ones((LANES,), jnp.float32)
            for i in range(j):
                if i != k:
                    base_first = base_first * (
                        g_rows[i] != g_rows[j]
                    ).astype(jnp.float32)
            cnt = base_cnt + 1.0 + oh[j]  # +1 self, +candidate match
            first = base_first * (1.0 - oh[j]) if k < j else base_first
            dosage.append(first * cnt)
            pdp.append(_gather_h(oh[j], dose_p) if dose_p is not None else zero)
            pdq.append(_gather_h(oh[j], dose_q) if dose_q is not None else zero)
            fr.append(_gather_h(oh[j], fr_plane))
    return dosage, pdp, pdq, fr


def _fixed_slot_inputs(g_rows, ploidy, dose_p, dose_q, fr_plane, n_alleles,
                       cand_side=None, cand_base=None):
    """Per-slot trio inputs for a sample at a FIXED genotype.

    With cand_side/cand_base set, the parent on that side is being
    updated over all H candidates: its per-slot copy count becomes
    base + onehot(slot allele) — a [H, LANES] plane — while everything
    else stays [LANES]-narrow (reference prior.py:38-70 parental_copies
    as a function of one changing parental slot)."""
    oh = [_onehot(g_rows[j], n_alleles) for j in range(ploidy)]
    dosage, pdp, pdq, fr = [], [], [], []
    zero = jnp.zeros((LANES,), jnp.float32)
    for j in range(ploidy):
        cnt = jnp.ones((LANES,), jnp.float32)
        first = jnp.ones((LANES,), jnp.float32)
        for i in range(ploidy):
            if i != j:
                eq = (g_rows[i] == g_rows[j]).astype(jnp.float32)
                cnt = cnt + eq
                if i < j:
                    first = first * (1.0 - eq)
        dosage.append(first * cnt)
        if cand_side == 0:
            # candidate copy count: row h of oh[j] is exactly the
            # "+1 if the candidate allele equals this slot's allele"
            pdp.append(_gather_h(oh[j], cand_base) + oh[j])
        else:
            pdp.append(_gather_h(oh[j], dose_p) if dose_p is not None else zero)
        if cand_side == 1:
            pdq.append(_gather_h(oh[j], cand_base) + oh[j])
        else:
            pdq.append(_gather_h(oh[j], dose_q) if dose_q is not None else zero)
        fr.append(_gather_h(oh[j], fr_plane))
    return dosage, pdp, pdq, fr


# ---------------------------------------------------------------------------
# kernel factory
# ---------------------------------------------------------------------------


def _flatten_smem(plan):
    """Pack every dynamically-indexed id table (group members/parents,
    child matrices, pair child lists) into ONE i32 SMEM vector; returns
    (buffer, group_meta, pair_meta) with static offsets."""
    buf = []

    def push(arr):
        off = len(buf)
        buf.extend(int(v) for v in np.asarray(arr).ravel())
        return off

    groups = []
    for cfg, members, par, ccls in plan.groups:
        meta = {"cfg": cfg, "n": len(members), "multi": len(members) > 1}
        if meta["multi"]:
            meta["members"] = push(members)
            meta["parents"] = push(par)
        else:
            meta["s"] = int(members[0])
            meta["p"] = int(par[0, 0])
            meta["q"] = int(par[0, 1])
        meta["classes"] = [
            {"cfg": ccfg, "side": side, "cmax": ch.shape[1],
             "ch": push(ch), "op": push(op)}
            for ccfg, side, ch, op in ccls
        ]
        groups.append(meta)
    pairs = []
    for p, q, cfg_p, cfg_q, par_p, par_q, kid_classes in plan.pairs:
        pairs.append(
            {
                "p": p, "q": q, "cfg_p": cfg_p, "cfg_q": cfg_q,
                "par_p": (int(par_p[0]), int(par_p[1])),
                "par_q": (int(par_q[0]), int(par_q[1])),
                "classes": [
                    {"cfg": key[0], "side_p": key[1], "side_q": key[2],
                     "n": len(kids), "kids": push(kids),
                     "other": push(others)}
                    for key, kids, others in kid_classes
                ],
            }
        )
    if not buf:
        buf = [0]
    return np.asarray(buf, np.int32), groups, pairs


def _make_kernel(plan, n_steps, n_reads, n_alleles, s_rows):
    """Build the kernel body for one static (plan, shapes) combination."""
    maxp = plan.max_ploidy
    S = plan.n_samples
    R = n_reads
    H = n_alleles
    plan_buf, group_meta, pair_meta = _flatten_smem(plan)
    STEPS = n_steps

    def kern(seed_ref, plan_ref, rh_hbm, counts_ref, fr_ref, nv_ref,
             init_ref, out_ref, g_s, rh_b, m_b, es_s, sem):
        tile = pl.program_id(0)
        step = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + tile * jnp.int32(STEPS) + step)

        @pl.when(step == 0)
        def _():
            g_s[:, :] = init_ref[:, :]

        fr_plane = fr_ref[:, :]
        nv = nv_ref[0, :]
        h_iota = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 0)

        def read_rows(base, n):
            rows = g_s[pl.ds(base, n), :]
            return [rows[j] for j in range(n)]

        def fetch_rh(s):
            """DMA sample s's read-hap block HBM -> VMEM, then convert
            in place to exp(rh - m) with the per-read anchor in m_b."""
            cp = pltpu.make_async_copy(rh_hbm.at[tile, s], rh_b, sem)
            cp.start()
            cp.wait()
            m = jnp.max(rh_b[:, :, :], axis=1)
            m_b[:, :] = m
            rh_b[:, :, :] = jnp.exp(rh_b[:, :, :] - m[:, None, :])

        def counts_of(s):
            return counts_ref[pl.ds(s, 1), :, :].reshape(R, LANES)

        def init_es(g_rows, ploidy):
            erh = rh_b[:, :, :]
            for j in range(ploidy):
                oh = _onehot(g_rows[j], H)
                es_s[j, :, :] = jnp.sum(erh * oh[None, :, :], axis=1)

        def llk_candidates(counts_s, ploidy, k):
            s_rest = jnp.zeros((R, LANES), jnp.float32)
            for j in range(ploidy):
                if j != k:
                    s_rest = s_rest + es_s[j, :, :]
            cand = jnp.log(
                jnp.maximum(s_rest[:, None, :] + rh_b[:, :, :], 1e-30)
            ) + (m_b[:, :] - jnp.float32(np.log(ploidy)))[:, None, :]
            return jnp.sum(counts_s[:, None, :] * cand, axis=0)

        def gumbel_choice(logits):
            u = _uniform_from_bits(
                pltpu.bitcast(pltpu.prng_random_bits((H, LANES)), jnp.uint32)
            )
            scores = logits - jnp.log(-jnp.log(u))
            best = jnp.max(scores, axis=0)
            cand_idx = jnp.where(scores == best[None, :], h_iota, jnp.int32(H))
            return jnp.min(cand_idx, axis=0)

        def parent_dose(pid, ploidy):
            if ploidy == 0:
                return None
            return _dose_of(read_rows(pid * maxp, ploidy), ploidy, H)

        def child_trio_cands(c_id, o_id, ccfg, side, dose_minus):
            """log trio pmf of (fixed) child c over all H candidate
            alleles of the updating parent's open slot."""
            pc = ccfg[0]
            gc = read_rows(c_id * maxp, pc)
            has_other = ccfg[2] if side == 0 else ccfg[1]
            opl = ccfg[8] if side == 0 else ccfg[7]
            dose_o = parent_dose(o_id, opl) if has_other else None
            if side == 0:
                inputs = _fixed_slot_inputs(
                    gc, pc, None, dose_o, fr_plane, H,
                    cand_side=0, cand_base=dose_minus,
                )
            else:
                inputs = _fixed_slot_inputs(
                    gc, pc, dose_o, None, fr_plane, H,
                    cand_side=1, cand_base=dose_minus,
                )
            return _log_or_neg(_trio_lin(*inputs, ccfg))

        def update_member(s, p_id, q_id, meta, gi):
            """Full slot sweep of one sample (reference sample_step,
            mcmc.py:307-359, with a systematic slot order)."""
            cfg = meta["cfg"]
            P = cfg[0]
            fetch_rh(s)
            counts_s = counts_of(s)
            g_rows = read_rows(s * maxp, P)
            init_es(g_rows, P)
            dose_p = parent_dose(p_id, cfg[7]) if cfg[1] else None
            dose_q = parent_dose(q_id, cfg[8]) if cfg[2] else None
            for k in range(P):
                g_rows = read_rows(s * maxp, P)
                llk = llk_candidates(counts_s, P, k)
                prior = _log_or_neg(
                    _trio_lin(
                        *_self_slot_inputs(
                            g_rows, k, cfg, dose_p, dose_q, fr_plane, H
                        ),
                        cfg,
                    )
                )
                if meta["classes"]:
                    dm = None
                    for j in range(P):
                        if j != k:
                            o = _onehot(g_rows[j], H)
                            dm = o if dm is None else dm + o
                    if dm is None:
                        dm = jnp.zeros((H, LANES), jnp.float32)
                    for cl in meta["classes"]:
                        cmax = cl["cmax"]
                        ch_base = cl["ch"] + gi * cmax
                        op_base = cl["op"] + gi * cmax
                        ccfg, side = cl["cfg"], cl["side"]

                        def body(ci, acc, ch_base=ch_base, op_base=op_base,
                                 ccfg=ccfg, side=side, dm=dm):
                            c = plan_ref[ch_base + ci]
                            o = plan_ref[op_base + ci]
                            contrib = child_trio_cands(
                                jnp.maximum(c, 0), jnp.maximum(o, 0),
                                ccfg, side, dm,
                            )
                            return acc + jnp.where(c >= 0, contrib, 0.0)

                        prior = jax.lax.fori_loop(0, cmax, body, prior)
                # multiset multiplicity of each candidate among the
                # other slots (same Jacobian as the calling sampler)
                cnt_other = jnp.zeros((H, LANES), jnp.float32)
                for j in range(P):
                    if j != k:
                        cnt_other = cnt_other + _onehot(g_rows[j], H)
                logits = llk + prior + jnp.log1p(cnt_other)
                logits = jnp.where(
                    h_iota < nv[None, :], logits, jnp.float32(NEG)
                )
                choice = gumbel_choice(logits)
                g_s[pl.ds(s * maxp + k, 1), :] = choice[None, :]
                oh_c = _onehot(choice, H)
                es_s[k, :, :] = jnp.sum(
                    rh_b[:, :, :] * oh_c[None, :, :], axis=1
                )

        # ---- parental-pair allele swap (reference mcmc.py:503-655) ----
        def _pair_swap(pm):
            p, q = pm["p"], pm["q"]
            cfg_p, cfg_q = pm["cfg_p"], pm["cfg_q"]
            pp, pq = cfg_p[0], cfg_q[0]
            gp = read_rows(p * maxp, pp)
            gq = read_rows(q * maxp, pq)
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((8, LANES)), jnp.uint32
            )
            idx_p = ((bits[0] >> 1).astype(jnp.int32)) % jnp.int32(pp)
            idx_q = ((bits[1] >> 1).astype(jnp.int32)) % jnp.int32(pq)
            u = _uniform_from_bits(bits[2:3])[0]  # bitcast needs >= 2-D

            def pick(rows, idx):
                a = rows[0]
                for j in range(1, len(rows)):
                    a = jnp.where(idx == j, rows[j], a)
                return a

            allele_p = pick(gp, idx_p)
            allele_q = pick(gq, idx_q)
            proposes = allele_p != allele_q

            def count_of(rows, a):
                c = jnp.zeros((LANES,), jnp.float32)
                for r in rows:
                    c = c + (r == a).astype(jnp.float32)
                return c

            proposal = count_of(gp, allele_p) * count_of(gq, allele_q)
            reversal = (1.0 + count_of(gp, allele_q)) * (
                1.0 + count_of(gq, allele_p)
            )
            lproposal = jnp.log(reversal) - jnp.log(
                jnp.maximum(proposal, 1.0)
            )
            gp_prop = [
                jnp.where(idx_p == j, allele_q, gp[j]) for j in range(pp)
            ]
            gq_prop = [
                jnp.where(idx_q == j, allele_p, gq[j]) for j in range(pq)
            ]

            def llk_delta(s, rows, idx, new_allele):
                fetch_rh(s)
                counts_s = counts_of(s)
                erh = rh_b[:, :, :]
                e_all = [
                    jnp.sum(erh * _onehot(r, H)[None, :, :], axis=1)
                    for r in rows
                ]
                s_rest = jnp.zeros((R, LANES), jnp.float32)
                e_old = jnp.zeros((R, LANES), jnp.float32)
                for j, e in enumerate(e_all):
                    sel = (idx == j).astype(jnp.float32)[None, :]
                    s_rest = s_rest + (1.0 - sel) * e
                    e_old = e_old + sel * e
                e_new = jnp.sum(
                    erh * _onehot(new_allele, H)[None, :, :], axis=1
                )
                d = jnp.log(jnp.maximum(s_rest + e_new, 1e-30)) - jnp.log(
                    jnp.maximum(s_rest + e_old, 1e-30)
                )
                return jnp.sum(counts_s * d, axis=0)

            dllk = llk_delta(p, gp, idx_p, allele_q) + llk_delta(
                q, gq, idx_q, allele_p
            )

            oh_ap = _onehot(allele_p, H)
            oh_aq = _onehot(allele_q, H)
            dose_p_cur = _dose_of(gp, pp, H)
            dose_q_cur = _dose_of(gq, pq, H)
            dose_p_prop = dose_p_cur - oh_ap + oh_aq
            dose_q_prop = dose_q_cur - oh_aq + oh_ap

            def dose_lookup(sid, ploidy, proposed):
                if ploidy == 0:
                    return None
                if sid == p:
                    return dose_p_prop if proposed else dose_p_cur
                if sid == q:
                    return dose_q_prop if proposed else dose_q_cur
                return parent_dose(sid, ploidy)

            def self_trio(sid, cfg, par, rows, proposed):
                dp = dose_lookup(par[0], cfg[7], proposed) if cfg[1] else None
                dq = dose_lookup(par[1], cfg[8], proposed) if cfg[2] else None
                return _log_or_neg(
                    _trio_lin(
                        *_fixed_slot_inputs(
                            rows, cfg[0], dp, dq, fr_plane, H
                        ),
                        cfg,
                    )
                )

            dpr = (
                self_trio(p, cfg_p, pm["par_p"], gp_prop, True)
                - self_trio(p, cfg_p, pm["par_p"], gp, False)
                + self_trio(q, cfg_q, pm["par_q"], gq_prop, True)
                - self_trio(q, cfg_q, pm["par_q"], gq, False)
            )

            for cl in pm["classes"]:
                ccfg = cl["cfg"]
                side_p, side_q = cl["side_p"], cl["side_q"]
                pc = ccfg[0]

                def kid_body(ci, acc, cl=cl, ccfg=ccfg, side_p=side_p,
                             side_q=side_q, pc=pc):
                    c = plan_ref[cl["kids"] + ci]
                    o = plan_ref[cl["other"] + ci]
                    gc = read_rows(jnp.maximum(c, 0) * maxp, pc)

                    def side_dose(slot, proposed):
                        # which sample occupies parental slot ``slot``
                        # of this child: p, q, or a fixed third party
                        if side_p == slot:
                            return dose_p_prop if proposed else dose_p_cur
                        if side_q == slot:
                            return dose_q_prop if proposed else dose_q_cur
                        opl = ccfg[7] if slot == 0 else ccfg[8]
                        has = ccfg[1] if slot == 0 else ccfg[2]
                        if not has:
                            return None
                        return parent_dose(jnp.maximum(o, 0), opl)

                    def val(proposed):
                        return _log_or_neg(
                            _trio_lin(
                                *_fixed_slot_inputs(
                                    gc, pc,
                                    side_dose(0, proposed),
                                    side_dose(1, proposed),
                                    fr_plane, H,
                                ),
                                ccfg,
                            )
                        )

                    delta = val(True) - val(False)
                    return acc + jnp.where(c >= 0, delta, 0.0)

                dpr = jax.lax.fori_loop(0, cl["n"], kid_body, dpr)

            log_acc = jnp.minimum(0.0, dllk + dpr + lproposal)
            accept = proposes & (u < jnp.exp(log_acc))
            for j in range(pp):
                g_s[pl.ds(p * maxp + j, 1), :] = jnp.where(
                    accept, gp_prop[j], gp[j]
                )[None, :]
            for j in range(pq):
                g_s[pl.ds(q * maxp + j, 1), :] = jnp.where(
                    accept, gq_prop[j], gq[j]
                )[None, :]

        # ---- the compound step: every group, then every pair swap ----
        for meta in group_meta:
            if not meta["multi"]:
                update_member(meta["s"], meta["p"], meta["q"], meta, 0)
            else:
                mem_off = meta["members"]
                par_off = meta["parents"]

                def g_body(gi, _, meta=meta, mem_off=mem_off,
                           par_off=par_off):
                    s = plan_ref[mem_off + gi]
                    p_id = plan_ref[par_off + 2 * gi]
                    q_id = plan_ref[par_off + 2 * gi + 1]
                    update_member(
                        s, jnp.maximum(p_id, 0), jnp.maximum(q_id, 0),
                        meta, gi,
                    )
                    return 0

                jax.lax.fori_loop(0, meta["n"], g_body, 0)

        for pm in pair_meta:
            _pair_swap(pm)

        out_ref[0, :, :] = g_s[:, :]

    return kern, plan_buf


# ---------------------------------------------------------------------------
# public wrapper
# ---------------------------------------------------------------------------


def make_plan(sample_ploidy, sample_parents, gamete_tau, gamete_lambda,
              gamete_error, swap_parental_alleles=True):
    """Static plan for ``pallas_pedigree_sampler`` (hashable: jit-static).

    Raises UnsupportedPedigree for configurations outside the kernel's
    static support — callers fall back to the XLA sampler.
    """
    plan = _Plan(sample_ploidy, sample_parents, gamete_tau, gamete_lambda,
                 gamete_error, swap_parental_alleles)
    plan._key = (
        tuple(int(x) for x in np.asarray(sample_ploidy).ravel()),
        tuple(int(x) for x in np.asarray(sample_parents).ravel()),
        tuple(int(x) for x in np.asarray(gamete_tau).ravel()),
        tuple(float(x) for x in np.asarray(gamete_error).ravel()),
        bool(swap_parental_alleles),
    )
    return plan


def _plan_hash(self):
    return hash(self._key)


def _plan_eq(self, other):
    return isinstance(other, _Plan) and self._key == getattr(
        other, "_key", None
    )


_Plan.__hash__ = _plan_hash
_Plan.__eq__ = _plan_eq


@functools.partial(
    jax.jit, static_argnames=("plan", "n_steps", "interpret")
)
def pallas_pedigree_sampler(seed, rh, counts, freqs, n_valid, initial, *,
                            plan, n_steps, interpret=False):
    """Run the VMEM-resident joint pedigree Gibbs sampler.

    Parameters
    ----------
    seed : int32 scalar array
    rh : f32[S, R, H, n_chains] — per-sample read x haplotype log-probs,
        lane-last (n_chains must be a multiple of 128); panel padding
        columns hold a large negative value
    counts : f32[S, R, n_chains] — read multiplicities (0 = padding)
    freqs : f32[H, n_chains] — LINEAR prior allele frequencies per lane
        (padding columns 0)
    n_valid : i32[n_chains] — per-lane real-panel size
    initial : i32[S, max_ploidy, n_chains] — initial genotypes (-1 pads
        the slots of lower-ploidy samples)
    plan : static, from ``make_plan``
    n_steps : static int

    Returns
    -------
    genotypes : i32[n_steps, S, max_ploidy, n_chains] — raw slot alleles
        after each compound step (unsorted, exactly as the reference's
        in-loop state; sort/roll host-side as mcmc.py:807-813 does)
    """
    S, R0, H0, n_chains = rh.shape
    maxp = plan.max_ploidy
    if S != plan.n_samples:
        raise ValueError(f"rh has {S} samples, plan has {plan.n_samples}")
    if n_chains % LANES != 0:
        raise ValueError(f"n_chains {n_chains} not a multiple of {LANES}")
    n_tiles = n_chains // LANES
    R = ((R0 + 7) // 8) * 8
    H = ((H0 + 7) // 8) * 8
    if R != R0:
        rh = jnp.concatenate(
            [rh, jnp.full((S, R - R0, H0, n_chains), NEG, rh.dtype)], axis=1
        )
        counts = jnp.concatenate(
            [counts, jnp.zeros((S, R - R0, n_chains), counts.dtype)], axis=1
        )
    if H != H0:
        rh = jnp.concatenate(
            [rh, jnp.full((S, R, H - H0, n_chains), NEG, rh.dtype)], axis=2
        )
        freqs = jnp.concatenate(
            [freqs, jnp.zeros((H - H0, n_chains), freqs.dtype)], axis=0
        )
    # contiguous per-(tile, sample) HBM blocks for the in-kernel DMA
    rh_t = jnp.transpose(
        rh.reshape(S, R, H, n_tiles, LANES), (3, 0, 1, 2, 4)
    ).astype(jnp.float32)
    s_rows = ((S * maxp + 7) // 8) * 8
    init_rows = jnp.concatenate(
        [
            initial.reshape(S * maxp, n_chains),
            jnp.full((s_rows - S * maxp, n_chains), -1, initial.dtype),
        ],
        axis=0,
    ).astype(jnp.int32)

    kernel, plan_buf = _make_kernel(plan, n_steps, R, H, s_rows)
    grid = (n_tiles, n_steps)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),  # plan ids
        pl.BlockSpec(memory_space=pl.ANY),  # rh stays in HBM
        pl.BlockSpec(
            (S, R, LANES), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (H, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (s_rows, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
    ]
    out_spec = pl.BlockSpec(
        (1, s_rows, LANES), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n_steps, s_rows, n_chains), jnp.int32)
    interp = pltpu.InterpretParams() if interpret else False
    with jax.enable_x64(False):
        trace = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((s_rows, LANES), jnp.int32),  # genotypes
                pltpu.VMEM((R, H, LANES), jnp.float32),  # exp(rh - m)
                pltpu.VMEM((R, LANES), jnp.float32),  # anchors m
                pltpu.VMEM((maxp, R, LANES), jnp.float32),  # slot exps
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interp,
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(plan_buf),
            rh_t,
            counts.astype(jnp.float32),
            freqs.astype(jnp.float32),
            jnp.asarray(n_valid, jnp.int32).reshape(1, n_chains),
            init_rows,
        )
    return trace[:, : S * maxp, :].reshape(n_steps, S, maxp, n_chains)
