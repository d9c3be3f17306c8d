"""Structural-move enumeration against hand-worked label cases.

Same expectations as reference test_assemble/test_structural.py:241-347
— my masked fixed-size enumerations must produce exactly the reference's
valid option sets (order-insensitively, since the masked table interleaves
invalid slots).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mchap_tpu.ops import assemble_mcmc as K


def _interval_mask(n, interval):
    if interval is None:
        return jnp.ones(n, bool)
    mask = np.zeros(n, bool)
    mask[interval[0] : interval[1]] = True
    return jnp.asarray(mask)


def _valid_options(fn, labels):
    options, valid = fn(jnp.asarray(labels))
    return np.asarray(options)[np.asarray(valid)]


def _as_set(options):
    return {o.tobytes() for o in np.asarray(options, np.int64)}


@pytest.mark.parametrize(
    "labels,answer",
    [
        ([[0, 0], [1, 0]], np.empty((0, 2, 2), int)),
        ([[0, 0], [1, 1]], [[[1, 0], [0, 1]]]),
        ([[0, 0], [0, 1], [0, 1], [0, 0]], np.empty((0, 4, 2), int)),
        ([[0, 0], [0, 1], [2, 1], [0, 0]], [[[2, 0], [0, 1], [0, 1], [0, 0]]]),
        (
            [[0, 0], [0, 1], [2, 1], [3, 0]],
            [
                [[2, 0], [0, 1], [0, 1], [3, 0]],
                [[0, 0], [3, 1], [2, 1], [0, 0]],
                [[0, 0], [0, 1], [3, 1], [2, 0]],
            ],
        ),
        (
            [[0, 0], [1, 1], [2, 2], [3, 3]],
            [
                [[1, 0], [0, 1], [2, 2], [3, 3]],
                [[2, 0], [1, 1], [0, 2], [3, 3]],
                [[3, 0], [1, 1], [2, 2], [0, 3]],
                [[0, 0], [2, 1], [1, 2], [3, 3]],
                [[0, 0], [3, 1], [2, 2], [1, 3]],
                [[0, 0], [1, 1], [3, 2], [2, 3]],
            ],
        ),
    ],
)
def test_recombination_options(labels, answer):
    got = _valid_options(K.recombination_options, labels)
    answer = np.asarray(answer, int).reshape(-1, len(labels), 2)
    assert len(got) == len(answer)
    assert _as_set(got) == _as_set(answer)
    # the count function must agree with the enumeration
    assert int(K.recombination_n_options(jnp.asarray(labels))) == len(answer)


@pytest.mark.parametrize(
    "labels,answer",
    [
        ([[0, 0], [0, 0]], np.empty((0, 2, 2), int)),
        ([[0, 0], [1, 0]], np.empty((0, 2, 2), int)),
        (
            [[0, 0], [0, 0], [0, 0], [3, 0]],
            [[[3, 0], [0, 0], [0, 0], [3, 0]]],
        ),
        (
            [[0, 0], [0, 1], [2, 0], [2, 0]],
            [
                [[2, 0], [0, 1], [2, 0], [2, 0]],
                [[0, 0], [2, 1], [2, 0], [2, 0]],
                [[0, 0], [0, 1], [0, 0], [2, 0]],
            ],
        ),
        (
            [[0, 0], [0, 1], [2, 2], [2, 3], [4, 4], [4, 5]],
            [
                [[2, 0], [0, 1], [2, 2], [2, 3], [4, 4], [4, 5]],
                [[4, 0], [0, 1], [2, 2], [2, 3], [4, 4], [4, 5]],
                [[0, 0], [2, 1], [2, 2], [2, 3], [4, 4], [4, 5]],
                [[0, 0], [4, 1], [2, 2], [2, 3], [4, 4], [4, 5]],
                [[0, 0], [0, 1], [0, 2], [2, 3], [4, 4], [4, 5]],
                [[0, 0], [0, 1], [4, 2], [2, 3], [4, 4], [4, 5]],
                [[0, 0], [0, 1], [2, 2], [0, 3], [4, 4], [4, 5]],
                [[0, 0], [0, 1], [2, 2], [4, 3], [4, 4], [4, 5]],
                [[0, 0], [0, 1], [2, 2], [2, 3], [0, 4], [4, 5]],
                [[0, 0], [0, 1], [2, 2], [2, 3], [2, 4], [4, 5]],
                [[0, 0], [0, 1], [2, 2], [2, 3], [4, 4], [0, 5]],
                [[0, 0], [0, 1], [2, 2], [2, 3], [4, 4], [2, 5]],
            ],
        ),
    ],
)
def test_dosage_options(labels, answer):
    got = _valid_options(K.dosage_options, labels)
    answer = np.asarray(answer, int).reshape(-1, len(labels), 2)
    assert len(got) == len(answer)
    assert _as_set(got) == _as_set(answer)
    assert int(K.dosage_n_options(jnp.asarray(labels))) == len(answer)


@pytest.mark.parametrize(
    "genotype,interval,answer",
    [
        # all identical within interval -> single label
        ([[0, 0, 1], [0, 0, 1]], (0, 2), [[0, 0], [0, 0]]),
        # differ inside interval, identical outside
        ([[0, 1, 1], [0, 0, 1]], (1, 2), [[0, 0], [1, 0]]),
        # full-length labels with no interval (second column zeros)
        ([[0, 1], [1, 1], [0, 1]], None, [[0, 0], [1, 0], [0, 0]]),
    ],
)
def test_segment_labels(genotype, interval, answer):
    genotype = jnp.asarray(genotype)
    mask = _interval_mask(genotype.shape[1], interval)
    got = np.asarray(K.segment_labels(genotype, mask))
    np.testing.assert_array_equal(got, answer)
