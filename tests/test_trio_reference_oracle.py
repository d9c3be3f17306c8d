"""Fuzz the trio transition pmf against the REFERENCE implementation.

The reference's pedigree prior (mchap/pedigree/prior.py) is pure Python
under ``@numba.njit`` decorators; with numba stubbed to the identity the
original function bodies execute directly and serve as a value-level
oracle — stronger than the sum-to-one property tests, which cannot
detect a consistently mis-weighted branch.  This pins our fixed-shape
masked-enumeration redesign (ops/pedigree_mcmc.trio_log_pmf) to the
reference's exact values across the four-branch error mixture,
double-reduction (lambda > 0) and mixed gamete-ploidy (tau) configs.
"""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.ops import pedigree_mcmc as K

REF = "/root/reference/mchap"


@pytest.fixture(scope="module")
def ref_prior():
    if "numba" not in sys.modules or not hasattr(
        sys.modules.get("numba"), "__mchap_stub__"
    ):
        numba = types.ModuleType("numba")
        numba.__mchap_stub__ = True

        def njit(*a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        numba.njit = njit
        numba.vectorize = lambda *a, **k: (lambda f: np.vectorize(f))
        numba.guvectorize = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba

    def load(name, path):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    if "mchap" not in sys.modules:
        pkg = types.ModuleType("mchap")
        pkg.__path__ = [REF]
        sys.modules["mchap"] = pkg
    load("mchap.jitutils", f"{REF}/jitutils.py")
    if "mchap.pedigree" not in sys.modules:
        ped = types.ModuleType("mchap.pedigree")
        ped.__path__ = [f"{REF}/pedigree"]
        sys.modules["mchap.pedigree"] = ped
    return load("mchap.pedigree.prior", f"{REF}/pedigree/prior.py")


@pytest.mark.parametrize(
    "tau_pair,lam_pair",
    [
        ((2, 2), (0.0, 0.0)),
        ((2, 2), (0.1, 0.0)),
        ((2, 2), (0.3, 0.2)),
        ((3, 1), (0.0, 0.0)),
        ((1, 3), (0.0, 0.0)),
    ],
)
def test_trio_log_pmf_matches_reference_values(ref_prior, tau_pair, lam_pair):
    maxp = 4
    tables, valid = K.composition_tables(maxp)
    rng = np.random.default_rng(hash(tau_pair + lam_pair) % (2**31))
    n_haps = 3
    log_freqs = np.log(np.array([0.5, 0.3, 0.2]))
    tau_p, tau_q = tau_pair
    lam_p, lam_q = lam_pair
    for trial in range(20):
        prog = np.sort(rng.integers(0, n_haps, maxp))
        p = np.sort(rng.integers(0, n_haps, maxp))
        q = np.sort(rng.integers(0, n_haps, maxp))
        err_p = float(rng.choice([0.01, 0.2, 0.9]))
        err_q = float(rng.choice([0.01, 0.2]))
        ours = float(
            K.trio_log_pmf(
                jnp.asarray(prog), jnp.asarray(p), jnp.asarray(q),
                jnp.asarray(4), jnp.asarray(4),
                jnp.asarray(tau_p), jnp.asarray(tau_q),
                jnp.asarray(lam_p), jnp.asarray(lam_q),
                jnp.asarray(err_p), jnp.asarray(err_q),
                jnp.asarray(log_freqs), jnp.asarray(tables),
                jnp.asarray(valid), jnp.asarray(K._COMB_LUT),
            )
        )
        z = lambda: np.zeros(maxp, dtype=np.int64)  # noqa: E731
        want = float(
            ref_prior.trio_log_pmf(
                progeny=np.asarray(prog, np.int64),
                parent_p=np.asarray(p, np.int64),
                parent_q=np.asarray(q, np.int64),
                ploidy_p=4, ploidy_q=4,
                tau_p=tau_p, tau_q=tau_q,
                lambda_p=lam_p, lambda_q=lam_q,
                error_p=err_p, error_q=err_q,
                log_frequencies=np.asarray(log_freqs),
                dosage=z(), dosage_p=z(), dosage_q=z(),
                gamete_p=z(), gamete_q=z(),
                constraint_p=z(), constraint_q=z(),
                dosage_log_frequencies=np.zeros(maxp),
            )
        )
        np.testing.assert_allclose(ours, want, rtol=1e-8, atol=1e-10)
