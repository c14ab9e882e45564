"""Regression tests for the k-mer statistics rewrite (round 4).

The histogram-rank ranked_slice and the transpose-view RC permutation
must exactly reproduce the original partition+stable-argsort algorithm
(itself a port of TopOccurrences, ref: util/sequtil/kmers.go:87-112) —
including on tie-heavy count distributions, the k=13 pathology that
motivated the rewrite."""
import numpy as np
import pytest

from downpore_tpu.utils.kmers import (_rc_table, kmer_occurrences,
                                      rc_permute, top_occurrences)


def _oracle_top(counts, k, top_n, bottom_n):
    """The pre-round-4 implementation, kept as the behavioural oracle."""
    merged = counts.astype(np.int64)
    merged = merged + merged[_rc_table(k)]
    n = len(merged)

    def ranked_slice(lo_rank, m):
        if m <= 0:
            return np.empty(0, np.int64)
        hi_rank = min(lo_rank + m - 1, n - 1)
        vs = np.partition(merged, [lo_rank, hi_rank])
        v_lo, v_hi = vs[lo_rank], vs[hi_rank]
        cand = np.flatnonzero((merged >= v_lo) & (merged <= v_hi))
        cand = cand[np.argsort(merged[cand], kind="stable")]
        below = int((merged < v_lo).sum())
        return cand[lo_rank - below : lo_rank - below + m]

    start = int((merged == 0).sum())
    if start > n - bottom_n:
        start = n - bottom_n
    return ranked_slice(start, bottom_n), ranked_slice(n - top_n, top_n)


def test_rc_permute_matches_table():
    for k in (2, 3, 5, 7):
        a = np.random.default_rng(k).integers(0, 1000, 4 ** k)
        assert np.array_equal(rc_permute(a, k), a[_rc_table(k)])


@pytest.mark.parametrize("dist", ["sparse", "ties", "skewed", "zeros"])
def test_top_occurrences_matches_oracle(dist):
    rng = np.random.default_rng(hash(dist) % 2 ** 31)
    k = 6
    n = 4 ** k
    if dist == "sparse":
        c = rng.integers(0, 1000, n)
    elif dist == "ties":            # the k=13 pathology class
        c = rng.integers(0, 3, n)
    elif dist == "skewed":
        c = (rng.random(n) ** 8 * 500).astype(np.int64)
    else:                           # mostly zero counts
        c = np.where(rng.random(n) < 0.95, 0, rng.integers(1, 50, n))
    c = c.astype(np.uint64)
    b0, t0 = _oracle_top(c, k, n // 100, n // 50)
    b1, t1 = top_occurrences(c, k, n // 100, n // 50)
    assert np.array_equal(b0, b1)
    assert np.array_equal(t0, t1)


def test_kmer_occurrences_block_accumulation():
    """Block-batched bincounts must equal per-read accumulation."""
    from downpore_tpu.core import Sequence
    rng = np.random.default_rng(3)
    bases = "ACGT"
    seqs = [Sequence.from_string(
        "".join(bases[i] for i in rng.integers(0, 4, int(rng.integers(
            3, 400)))), id=i) for i in range(300)]
    k = 5
    got = kmer_occurrences(seqs, k)
    want = np.zeros(4 ** k, np.int64)
    for s in seqs:
        ks = s.kmers(k)
        if ks.size:
            want += np.bincount(ks, minlength=4 ** k)
    assert np.array_equal(got, want.astype(np.uint64))
