"""Tests for alphabets and the k-mer codec (SURVEY.md §7.1 invariant #5)."""

import numpy as np
import pytest

from ipk_tpu.seq import (AA, DNA, decode_kmer, dense_index_to_key, encode_kmer,
                         get_traits, key_to_dense_index)


def test_dna_order():
    # DNA code order A,C,G,T mirrors ar.cpp:222-225
    assert [DNA.key_to_code(c) for c in "ACGT"] == [0, 1, 2, 3]
    assert DNA.key_to_code("a") == 0
    assert DNA.key_to_code("U") == 3  # RNA alias
    assert DNA.alphabet_size == 4
    assert DNA.bits_per_symbol == 2
    assert DNA.max_kmer_length == 31


def test_aa_order():
    # i2l/RAPPAS amino order, ar.cpp:227-234
    assert AA.letters == "RHKDESTNQCGPAILMFWYV"
    assert AA.key_to_code("R") == 0
    assert AA.key_to_code("V") == 19
    assert AA.alphabet_size == 20
    assert AA.bits_per_symbol == 5


def test_encode_msb_first():
    # key = sum(code_i << (bits * (k-1-i))): pk_compute.cpp:96-105
    # "ACGT" -> 0b00011011 = 27
    assert encode_kmer("ACGT", DNA) == 0b00011011
    assert decode_kmer(27, 4, DNA) == "ACGT"
    # AA uses 5-bit strides (base 32), not base 20
    assert encode_kmer("RH", AA) == (0 << 5) | 1
    assert encode_kmer("VV", AA) == (19 << 5) | 19


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    for traits, k in [(DNA, 8), (DNA, 12), (AA, 4), (AA, 6)]:
        for _ in range(20):
            codes = rng.integers(0, traits.alphabet_size, size=k)
            kmer = "".join(traits.letters[c] for c in codes)
            key = encode_kmer(kmer, traits)
            assert decode_kmer(key, k, traits) == kmer


def test_dense_index_key_conversion():
    # DNA: identity
    idx = np.arange(0, 256, dtype=np.uint64)
    np.testing.assert_array_equal(dense_index_to_key(idx, 4, DNA), idx)
    # AA: base-20 index <-> base-32 packed key
    k = 3
    idx = np.arange(0, 20 ** k, dtype=np.uint64)
    keys = dense_index_to_key(idx, k, AA)
    # spot check: index of "RHK" (digits MSB-first 0,1,2) = 0*400+1*20+2 = 22
    assert keys[22] == encode_kmer("RHK", AA)
    back = key_to_dense_index(keys, k, AA)
    np.testing.assert_array_equal(back, idx)


def test_gap_and_ambiguity():
    assert DNA.is_gap("-") and DNA.is_gap(".")
    assert not DNA.is_gap("A")
    assert DNA.is_ambiguous("N")
    assert AA.is_ambiguous("X")


def test_get_traits():
    assert get_traits("nucl") is DNA
    assert get_traits("amino") is AA
    with pytest.raises(ValueError):
        get_traits("rna")


def test_lut():
    lut = DNA.codes_lut()
    assert lut[ord("A")] == 0 and lut[ord("t")] == 3
    assert lut[ord("-")] == -1
