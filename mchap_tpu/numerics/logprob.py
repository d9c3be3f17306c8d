"""Log-space probability arithmetic (JAX).

Device-native equivalents of the reference's scalar log-space helpers
(``mchap/jitutils.py:6-92``): instead of pairwise ``add_log_prob`` loops we
use vectorized ``logsumexp`` reductions, and instead of inverse-CDF
``random_choice`` we use ``jax.random.categorical`` directly on logits
(which avoids the exp/normalise round-trip entirely).
"""

import jax
import jax.numpy as jnp


def logsumexp(a, axis=None, where=None):
    """Numerically stable log(sum(exp(a))) supporting -inf entries.

    Equivalent to reference ``sum_log_probs`` (jitutils.py:29-47) over an
    axis, but computed as a single vectorized reduction.
    """
    return jax.scipy.special.logsumexp(a, axis=axis, where=where)


def normalise_log_probs(llks, axis=-1):
    """Normalised probabilities from log-probabilities.

    Reference: ``normalise_log_probs`` (jitutils.py:50-74).
    """
    llks = jnp.asarray(llks)
    return jnp.exp(llks - logsumexp(llks, axis=axis)[..., None])


def random_choice_log(key, logits):
    """Categorical draw from unnormalised log-probabilities.

    Replaces reference ``random_choice`` over normalised probabilities
    (jitutils.py:77-92); sampling from logits is both cheaper and more
    numerically robust on device.
    """
    return jax.random.categorical(key, logits)


def random_choice(key, probabilities):
    """Categorical draw from (already normalised) probabilities.

    Matches reference ``random_choice`` (jitutils.py:77-92) semantics via
    inverse-CDF on the cumulative sum, so that zero-probability options are
    never selected even under float rounding.
    """
    cdf = jnp.cumsum(probabilities, axis=-1)
    u = jax.random.uniform(key, shape=probabilities.shape[:-1], dtype=cdf.dtype)
    return jnp.sum(cdf <= u[..., None] * cdf[..., -1:], axis=-1, dtype=jnp.int32)


def natural_log_to_log10(x):
    """Reference: jitutils.py:174-177."""
    return x * jnp.log10(jnp.exp(1.0))
