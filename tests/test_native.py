"""Native C++ kernels vs the numpy oracles (the reference's
dual-implementation pattern, applied to our native layer)."""
import numpy as np
import pytest

from downpore_tpu import native
from downpore_tpu.core.sequence import (encode_bases, rolling_kmers,
                                        write_segments)

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="no native toolchain")

RNG = np.random.default_rng(3)


def rand_seq(n):
    return bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[
        RNG.integers(0, 4, n)])


def test_native_encode_matches_numpy():
    raw = rand_seq(10001)
    got = native.encode_bases(raw)
    assert np.array_equal(got, encode_bases(raw))


def test_native_write_segments_matches_numpy():
    k = 6
    table = np.zeros(4 ** k, dtype=bool)
    table[RNG.integers(0, 4 ** k, 500)] = True
    for _ in range(5):
        codes = encode_bases(rand_seq(400))
        got = native.write_segments(codes, k, table)
        gaps, seeds = write_segments(codes, k, table)
        assert np.array_equal(got[0], gaps)
        assert np.array_equal(got[1], seeds)


def test_native_index_fastq():
    buf = b"@read1 desc\nACGTACGT\n+\nIIIIIIII\n@read2\nTTTT\n+\n!!!!\n"
    res = native.index_fastq(buf)
    assert res is not None
    seq_off, seq_len, name_off, name_len, qual_off = res
    assert len(seq_off) == 2
    assert buf[seq_off[0]:seq_off[0] + seq_len[0]] == b"ACGTACGT"
    assert buf[name_off[0]:name_off[0] + name_len[0]] == b"read1 desc"
    assert buf[qual_off[1]:qual_off[1] + seq_len[1]] == b"!!!!"


def test_native_index_fastq_malformed():
    assert native.index_fastq(b">fasta\nACGT\n") is None
