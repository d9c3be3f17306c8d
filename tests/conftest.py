"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The session environment pre-imports jax with a remote-TPU ("axon")
backend via sitecustomize at interpreter startup, so env-var platform
selection is too late by the time pytest loads this file.  Backends are
initialized lazily, though, so switching to CPU through jax.config here
(before any computation) keeps unit tests entirely off the TPU
(single-client grant, slow remote compiles).  The 8 virtual CPU devices
validate sharding/pjit paths; the driver separately dry-runs multi-chip
compilation and benches run on the real TPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DATA = pathlib.Path("/root/reference/mchap/tests/test_io/data")


@pytest.fixture(scope="session")
def fixture_data_dir():
    """Bundled MCHap fixture data (read-only reference inputs/goldens)."""
    return REFERENCE_DATA
