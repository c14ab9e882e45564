"""Sequence core tests: vectorized ops vs scalar oracles, mirroring the
reference's dual-implementation pattern (ref: sequence/sequence_test.go)."""
import numpy as np
import pytest

from downpore_tpu.core import (
    Sequence, encode_bases, decode_bases, reverse_complement,
    rolling_kmers, short_kmers, count_seed_kmers, write_segments,
    kmer_value, kmer_string, kmer_reverse_complement,
)

RNG = np.random.default_rng(42)
BASES = "ACGT"


def random_seq(n):
    return "".join(BASES[i] for i in RNG.integers(0, 4, n))


def scalar_encode(s):
    m = {"A": 0, "C": 1, "G": 2, "T": 3}
    return np.array([m[c] for c in s], dtype=np.uint8)


def scalar_kmers(codes, k):
    out = []
    for i in range(len(codes) - k + 1):
        v = 0
        for c in codes[i:i + k]:
            v = (v << 2) | int(c)
        out.append(v)
    return np.array(out, dtype=np.int64 if 2 * k > 31 else np.int32)


def test_encode_decode_roundtrip():
    s = random_seq(997)
    codes = encode_bases(s)
    assert np.array_equal(codes, scalar_encode(s))
    assert decode_bases(codes) == s


def test_encode_lowercase_and_u():
    # the bit trick maps lowercase the same way
    assert np.array_equal(encode_bases("acgt"), encode_bases("ACGT"))


def test_reverse_complement():
    s = "ACGGTTAC"
    rc = decode_bases(reverse_complement(encode_bases(s)))
    assert rc == "GTAACCGT"
    # involution
    codes = encode_bases(random_seq(101))
    assert np.array_equal(reverse_complement(reverse_complement(codes)), codes)


@pytest.mark.parametrize("k", [1, 3, 6, 8, 11, 16])
def test_rolling_kmers(k):
    codes = encode_bases(random_seq(200))
    assert np.array_equal(rolling_kmers(codes, k), scalar_kmers(codes, k))


def test_rolling_kmers_short_input():
    assert rolling_kmers(encode_bases("ACG"), 6).size == 0


def test_short_kmers_collapse():
    # scalar oracle of ShortKmers (ref: sequence/sequence.go:456-480)
    def oracle(codes, k, collapse):
        ks = scalar_kmers(codes, k)
        if not collapse:
            return ks.astype(np.uint16)
        out = []
        prev = None
        for v in ks:
            if prev is None or v != prev:
                out.append(v)
                prev = v
        return np.array(out, dtype=np.uint16)

    for _ in range(5):
        codes = encode_bases(random_seq(150))
        for k in (4, 6):
            for collapse in (False, True):
                assert np.array_equal(short_kmers(codes, k, collapse),
                                      oracle(codes, k, collapse))


def test_homopolymer_collapse_example():
    codes = encode_bases("AAAAAAAACGT")
    ks = short_kmers(codes, 6, True)
    # first 3 6-mers are AAAAAA: collapsed to one
    assert ks[0] == 0
    assert (ks[1:] != ks[:-1]).all()


def test_write_segments_matches_scalar():
    # scalar oracle of WriteSegments (ref: sequence/sequence.go:308-324)
    def oracle(codes, k, table):
        ks = scalar_kmers(codes, k)
        segments = []
        prev = 0
        for idx, v in enumerate(ks):
            if table[v]:
                segments.append(idx - prev)
                segments.append(v)
                prev = idx + k
        segments.append(len(codes) - prev)
        return segments

    k = 6
    table = np.zeros(4 ** k, dtype=bool)
    table[RNG.integers(0, 4 ** k, 300)] = True
    for _ in range(10):
        codes = encode_bases(random_seq(300))
        gaps, seeds = write_segments(codes, k, table)
        seg = []
        for g, s in zip(gaps[:-1], seeds):
            seg.extend([int(g), int(s)])
        seg.append(int(gaps[-1]))
        assert seg == oracle(codes, k, table)
        assert count_seed_kmers(codes, k, table) == len(seeds)


def test_write_segments_no_hits():
    k = 6
    table = np.zeros(4 ** k, dtype=bool)
    codes = encode_bases(random_seq(50))
    gaps, seeds = write_segments(codes, k, table)
    assert seeds.size == 0 and gaps.tolist() == [50]


def test_kmer_string_roundtrip():
    for k in (3, 6, 10):
        v = int(RNG.integers(0, 4 ** k))
        assert kmer_value(kmer_string(v, k)) == v


def test_kmer_reverse_complement():
    k = 6
    v = kmer_value("ACGGTA")
    assert kmer_string(kmer_reverse_complement(v, k), k) == "TACCGT"


def test_subsequence_offsets():
    s = Sequence.from_string(random_seq(100), id=7)
    sub = s.subsequence(10, 80)
    assert len(sub) == 70 and sub.offset == 10 and sub.inset == 20
    sub2 = sub.subsequence(5, 60)
    assert sub2.offset == 15 and sub2.inset == 30
    rc = sub2.reverse_complement()
    assert rc.offset == sub2.inset and rc.inset == sub2.offset


def test_quality_slicing():
    q = np.arange(100, dtype=np.uint8)
    s = Sequence.from_string(random_seq(100), quality=q)
    sub = s.subsequence(10, 20)
    assert np.array_equal(sub.quality, q[10:20])
    rc = s.reverse_complement()
    assert np.array_equal(rc.quality, q[::-1])
