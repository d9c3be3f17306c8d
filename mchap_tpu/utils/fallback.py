"""Loud fallback handling for the fast-path dispatch sites.

The fit paths try a pallas fast path first and fall back to the XLA
sampler when it is unavailable (wrong backend, VMEM budget, Mosaic
compile failure); the batched application blocks similarly fall back to
per-locus calling.  A silent fallback can degrade throughput 10-100x
with zero diagnostics, so every dispatch site reports through here:

- ``note_path(site, path)`` records which implementation actually ran;
  the timing summary (``utils.timing``) prints the tally so a run's
  stderr shows e.g. ``paths: denovo=pallas x12``.
- ``note_fallback(site, exc, to=...)`` is called with the captured
  exception when a fast path fails.  It emits a once-per-(site, error)
  stderr warning carrying the exception, and under ``MCHAP_STRICT=1``
  re-raises instead (CI / statistical gates run strict so a Mosaic
  regression fails the build rather than silently switching paths).

The reference has no equivalent (its failure story is per-locus error
wrapping, mchap/application/baseclass.py:26-39); this module exists
because the TPU build adds the fast-path/fallback axis the reference
does not have.
"""

import os
import sys
from collections import Counter

#: tally of (site, path) -> count for the timing summary
PATHS = Counter()

_warned = set()


class FallbackError(RuntimeError):
    """A fast path failed while ``MCHAP_STRICT=1`` forbids falling back."""


def strict():
    return os.environ.get("MCHAP_STRICT", "0").strip() not in (
        "", "0", "false", "False"
    )


def note_path(site, path):
    """Record that dispatch site ``site`` executed implementation ``path``."""
    PATHS[(site, path)] += 1


def note_fallback(site, exc, to="xla"):
    """A fast path failed: warn once (stderr), raise under MCHAP_STRICT=1."""
    note_path(site, f"{to}-after-failure")
    if strict():
        raise FallbackError(
            f"{site}: fast path failed and MCHAP_STRICT=1 forbids the"
            f" {to} fallback ({type(exc).__name__}: {exc})"
        ) from exc
    key = (site, type(exc).__name__, str(exc)[:200])
    if key not in _warned:
        _warned.add(key)
        sys.stderr.write(
            f"[mchap-tpu] WARNING: {site} fast path failed"
            f" ({type(exc).__name__}: {exc}); falling back to {to}."
            f" Set MCHAP_STRICT=1 to make this fatal.\n"
        )


def summary_lines():
    """Path tally lines for the timing summary (empty when nothing ran)."""
    if not PATHS:
        return []
    parts = [
        f"{site}={path} x{count}"
        for (site, path), count in sorted(PATHS.items())
    ]
    return ["paths: " + ", ".join(parts)]


def reset():
    """Clear tallies and warn-once state (tests)."""
    PATHS.clear()
    _warned.clear()
