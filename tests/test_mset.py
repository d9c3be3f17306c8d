"""Multiset-algebra tests (regime of reference test_mset.py)."""

import numpy as np

from mchap_tpu import mset


A = np.array([[0, 1], [0, 1], [1, 1], [2, 0]])
B = np.array([[0, 1], [2, 0], [2, 0]])


def test_unique_counts_first_seen_order():
    rows, counts = mset.unique_counts(A)
    np.testing.assert_array_equal(rows, [[0, 1], [1, 1], [2, 0]])
    np.testing.assert_array_equal(counts, [2, 1, 1])


def test_unique_and_idx():
    np.testing.assert_array_equal(mset.unique(A), [[0, 1], [1, 1], [2, 0]])
    np.testing.assert_array_equal(mset.unique_idx(A), [0, 2, 3])


def test_count_contains_within():
    np.testing.assert_array_equal(mset.count(A, B), [2, 1, 1])
    np.testing.assert_array_equal(mset.contains(A, np.array([[9, 9]])), [False])
    np.testing.assert_array_equal(mset.within(B, A), [True, True, True])


def test_equal():
    assert mset.equal(A, A[::-1])
    assert not mset.equal(A, B)
    assert not mset.equal(A, np.vstack([A[:3], [[9, 9]]]))


def test_add_subtract():
    s = mset.add(A, B)
    assert len(s) == len(A) + len(B)
    d = mset.subtract(A, B)
    # removes one [0,1] and one [2,0]
    rows, counts = mset.unique_counts(d)
    np.testing.assert_array_equal(rows, [[0, 1], [1, 1]])
    np.testing.assert_array_equal(counts, [1, 1])


def test_intercept_union():
    i = mset.intercept(A, B)
    rows, counts = mset.unique_counts(i)
    np.testing.assert_array_equal(rows, [[0, 1], [2, 0]])
    np.testing.assert_array_equal(counts, [1, 1])
    u = mset.union(A, B)
    rows, counts = mset.unique_counts(u)
    np.testing.assert_array_equal(rows, [[0, 1], [1, 1], [2, 0]])
    np.testing.assert_array_equal(counts, [2, 1, 2])


def test_categorize():
    cats = np.array([[2, 0], [0, 1]])
    np.testing.assert_array_equal(mset.categorize(A, cats), [1, 1, -1, 0])


def test_repeat():
    r = mset.repeat(np.array([[1, 2], [3, 4]]), np.array([2, 1]))
    np.testing.assert_array_equal(r, [[1, 2], [1, 2], [3, 4]])
