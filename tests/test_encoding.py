"""Encoding-layer tests (regimes of reference test_encoding/*)."""

import numpy as np
import pytest

from mchap_tpu.encoding import character, integer


def test_as_probabilistic_basic():
    array = np.array([[0, 1, -1]])
    got = integer.as_probabilistic(array, n_alleles=2, p=0.9, error_factor=1)
    want = np.array([[[0.9, 0.1], [0.1, 0.9], [np.nan, np.nan]]])
    np.testing.assert_allclose(got[..., :2], want, rtol=1e-12)


def test_as_probabilistic_allele_constraint():
    array = np.array([[0, 0]])
    got = integer.as_probabilistic(array, n_alleles=np.array([2, 3]), p=0.97, error_factor=3)
    # column beyond n_alleles zeroed
    assert got[0, 0, 2] == 0.0
    assert got[0, 1, 2] == pytest.approx(0.01)
    assert got[0, 0, 0] == pytest.approx(0.97)
    assert got[0, 0, 1] == pytest.approx(0.01)


def test_strings_roundtrip():
    array = integer.from_strings(["012-", "1102"])
    np.testing.assert_array_equal(array, [[0, 1, 2, -1], [1, 1, 0, 2]])
    strings = integer.as_strings(array)
    np.testing.assert_array_equal(strings, ["012-", "1102"])


def test_as_characters_with_alleles():
    array = np.array([[0, 1], [1, -1]])
    chars = integer.as_characters(array, alleles=[("A", "C"), ("G", "T")])
    np.testing.assert_array_equal(chars, [["A", "T"], ["C", "-"]])


def test_sort_lexicographic():
    array = np.array([[1, 0], [0, 2], [0, 1]])
    np.testing.assert_array_equal(integer.sort(array), [[0, 1], [0, 2], [1, 0]])


def test_depth_with_counts():
    array = np.array([[0, -1], [1, 1]])
    np.testing.assert_array_equal(integer.depth(array), [2, 1])
    np.testing.assert_array_equal(integer.depth(array, counts=np.array([3, 2])), [5, 2])


def test_kmer_counts_and_frequency():
    reads = np.array([[0, 0, 1], [0, 0, 1], [0, 1, 1], [0, -1, 1]])
    kmers, counts = integer.kmer_counts(reads, k=2)
    # read 4 has a gap in the middle: contributes no kmers at position 0/1
    np.testing.assert_array_equal(
        kmers, [[0, 0, -1], [-1, 0, 1], [0, 1, -1], [-1, 1, 1]]
    )
    np.testing.assert_array_equal(counts, [2, 2, 1, 1])
    freqs = integer.kmer_frequency(kmers, counts)
    np.testing.assert_allclose(freqs, [2 / 3, 2 / 3, 1 / 3, 1 / 3])
    np.testing.assert_array_equal(integer.kmer_positions(kmers, end="start"), [0, 1, 0, 1])


def test_minimum_error_correction():
    genotype = np.array([[0, 0, 0], [1, 1, 1]])
    reads = np.array([[0, 0, 0], [1, 1, 0], [-1, -1, -1]])
    np.testing.assert_array_equal(
        integer.minimum_error_correction(reads, genotype), [0, 1, 0]
    )


def test_read_assignment_ties_split():
    haplotypes = np.array([[0, 0], [1, 1]])
    reads = np.array([[0, 0], [0, 1]])
    got = integer.read_assignment(reads, haplotypes)
    np.testing.assert_allclose(got, [[1.0, 0.0], [0.5, 0.5]])


def test_kmer_representation_all_present():
    genotype = np.array([[0, 0, 1], [1, 1, 1]])
    reads = np.tile(genotype, (3, 1))
    got = integer.kmer_representation(reads, genotype, k=3)
    np.testing.assert_allclose(got, [1.0, 1.0, 1.0])


def test_kmer_representation_novel_kmer():
    genotype = np.array([[0, 0, 0]])
    reads = np.array([[0, 0, 0], [0, 1, 0]])
    got = integer.kmer_representation(reads, genotype, k=3)
    np.testing.assert_allclose(got, [0.5, 0.5, 0.5])


def test_min_kmer_coverage():
    genotype = np.array([[0, 0, 0]])
    reads = np.array([[0, 0, 0], [0, 1, 0]])
    got = integer.min_kmer_coverage(reads, genotype, ks=[1, 3, 5])
    assert got[1] == pytest.approx(0.5)
    assert np.isnan(got[2])  # k longer than sequence


def test_character_as_allelic():
    chars = np.array([["A", "T"], ["C", "-"]])
    got = character.as_allelic(chars, alleles=[("A", "C"), ("G", "T")])
    np.testing.assert_array_equal(got, [[0, 1], [1, -1]])


def test_character_depth():
    chars = np.array([["A", "-"], ["C", "T"]])
    np.testing.assert_array_equal(character.depth(chars), [2, 1])
