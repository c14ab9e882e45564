"""Seed index + gapped-seed sequence tests."""
import numpy as np

from downpore_tpu.core import Sequence
from downpore_tpu.seeds import SeedIndex, SeedSequence
from downpore_tpu.seeds.seed_sequence import dynamic_match

RNG = np.random.default_rng(7)
BASES = "ACGT"


def random_seq(n, rng=RNG):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def test_all_seed_sequence_roundtrip():
    idx = SeedIndex(6)
    s = Sequence.from_string("ACGTACGTACGTACGTACGT", id=0, name="a")
    ss = idx.new_all_seed_sequence(s)
    # every k-mer becomes a seed; segments follow the WriteSegments shape
    assert ss.num_seeds == len(s) - 6 + 1
    assert ss.gaps[0] == 0 and ss.gaps[-1] == 0
    assert (ss.gaps[1:-1] == 1 - 6).all()
    # positions are 0..n-k
    assert np.array_equal(ss.seed_positions(6), np.arange(ss.num_seeds))
    assert ss.length == len(s)


def test_new_seed_sequence_uses_only_indexed_kmers():
    idx = SeedIndex(6)
    adapter = Sequence.from_string(random_seq(40), id=0, name="ad")
    idx.new_all_seed_sequence(adapter)
    read = Sequence.from_string(random_seq(500), id=1, name="r")
    ss = idx.new_seed_sequence(read)
    for pos, seed in zip(ss.seed_positions(6), ss.seeds):
        kmer = read.kmer_at(int(pos), 6)
        assert idx.kmer_map[kmer] == seed


def test_seed_offsets_roundtrip():
    ss = SeedSequence.from_segments([5, 10, 3, 11, -2, 12, 7], k=6)
    k = 6
    assert ss.seed_offset(0, k) == 5
    assert ss.seed_offset(1, k) == 5 + 6 + 3
    assert ss.seed_offset(2, k) == 5 + 6 + 3 + 6 - 2
    assert ss.seed_offset_from_end(2, k) == 7
    assert ss.seed_offset_from_end(0, k) == 7 + 6 - 2 + 6 + 3
    # length == front offset + seeds + gaps + back offset
    assert ss.length == ss.seed_offset(2, k) + k + 7
    pos = ss.seed_positions(k)
    for i in range(3):
        assert pos[i] == ss.seed_offset(i, k)


def test_reduced_merges_gaps_and_dedups():
    k = 6
    ss = SeedSequence.from_segments([2, 5, 3, 9, 1, 5, 4, 5, 0, 7, 2], k=k)
    wl = np.zeros(10, dtype=bool)
    wl[5] = True
    red, idx = ss.reduced(wl, k, 1, True)
    # positions 0, 2, 3 hold seed id 5; the reference's `prev` tracks the
    # last *kept* seed, so both later occurrences collapse into the first
    # (ref: seeds/sequence.go:85-123)
    assert red.seeds.tolist() == [5]
    assert idx.tolist() == [0]
    pos = ss.seed_positions(k)
    rpos = red.seed_positions(k)
    assert rpos[0] == pos[0]
    assert red.length == ss.length
    # front/back gaps absorb everything else
    assert int(red.gaps[0]) + k + int(red.gaps[-1]) == ss.length


def test_reduced_min_seeds():
    k = 6
    ss = SeedSequence.from_segments([2, 5, 3, 9, 1], k=k)
    wl = np.zeros(10, dtype=bool)
    wl[5] = True
    red, idx = ss.reduced(wl, k, 2, True)
    assert red is None and idx is None


def test_reverse_complement_seed_sequence():
    idx = SeedIndex(4)
    s = Sequence.from_string("ACGTTGCAACGGTTTTACCG", id=3, name="x")
    rc_read = s.reverse_complement()
    ss = idx.new_all_seed_sequence(s)
    # register the RC twins too (AddSeeds always does; the all-seed adapter
    # path does not, ref: seeds/seeds.go:203)
    idx.new_all_seed_sequence(rc_read)
    rc = ss.reverse_complement(4, idx)
    assert rc.num_seeds == ss.num_seeds
    # RC of RC is identity on seeds
    rc2 = rc.reverse_complement(4, idx)
    assert np.array_equal(rc2.seeds, ss.seeds)
    # seed kmers correspond to the RC read's kmers in order
    expected = idx.new_seed_sequence(rc_read)
    assert np.array_equal(rc.seeds, expected.seeds)
    assert np.array_equal(rc.gaps, ss.gaps[::-1])


def test_dynamic_match_simple_chain():
    k = 6
    # query: 3 seeds with gaps 10, 10; target has same seeds same spacing
    q = SeedSequence.from_segments([0, 1, 10, 2, 10, 3, 0], k=k)
    t = SeedSequence.from_segments([50, 1, 10, 2, 10, 3, 40], k=k)
    ms = dynamic_match(q, t, 2, k)
    assert len(ms) == 1
    assert ms[0].match_a == [0, 1, 2]
    assert ms[0].match_b == [0, 1, 2]
    cov_a, cov_b = ms[0].bases_covered(k)
    assert cov_a == 18 and cov_b == 18


def test_dynamic_match_gap_window_rejects():
    k = 6
    q = SeedSequence.from_segments([0, 1, 10, 2, 0], k=k)
    # same seeds but hugely different gap: chain cannot extend
    t = SeedSequence.from_segments([0, 1, 500, 2, 0], k=k)
    ms = dynamic_match(q, t, 2, k)
    assert ms == []


def test_dynamic_match_with_noise_seeds():
    k = 6
    q = SeedSequence.from_segments([0, 1, 10, 2, 10, 3, 0], k=k)
    # target has extra seeds interleaved; gaps still compatible
    t = SeedSequence.from_segments([9, 1, 2, 9, 2, 2, 2, 8, 2, 3, 5], k=k)
    ms = dynamic_match(q, t, 2, k)
    assert len(ms) >= 1
    best = max(ms, key=lambda m: len(m.match_a))
    assert [int(t.seeds[i]) for i in best.match_b] == \
        [int(q.seeds[i]) for i in best.match_a]
    assert len(best) == 3


def test_index_matches_oracle():
    rng = np.random.default_rng(3)
    idx = SeedIndex(6)
    ref = Sequence.from_string(random_seq(2000, rng), id=0, name="ref")
    ranks = np.ones(4 ** 6)
    idx.add_single_seeds(ref, 40, ranks)
    assert idx.num_seeds > 20
    # index overlapping chunks
    for i, start in enumerate(range(0, 1500, 250)):
        chunk = ref.subsequence(start, start + 500)
        idx.add_sequence(idx.new_seed_sequence(chunk))
    idx.index_sequences()
    # a query drawn from the reference matches the chunks containing it
    q = idx.new_seed_sequence(ref.subsequence(600, 1100))
    hits = idx.matches(q, 0.5)
    assert len(hits) >= 1
    # every hit must genuinely share seeds
    for h in hits:
        shared = np.intersect1d(q.seeds, idx.sequences[h].seeds)
        assert shared.size > 0


def test_matches_matmul_equals_oracle():
    from downpore_tpu.ops import match as match_ops
    rng = np.random.default_rng(11)
    idx = SeedIndex(6)
    ref = Sequence.from_string(random_seq(3000, rng), id=0, name="ref")
    idx.add_single_seeds(ref, 40, np.ones(4 ** 6))
    for start in range(0, 2500, 300):
        idx.add_sequence(idx.new_seed_sequence(ref.subsequence(start, start + 500)))
    idx.index_sequences()
    queries = [idx.new_seed_sequence(ref.subsequence(s, s + 400))
               for s in (0, 700, 1400, 2100)]
    usable = idx._seed_counts < idx.num_sequences
    V, num_sets = match_ops.build_query_matrix(queries, idx.num_seeds, usable)
    counts = np.asarray(match_ops.hit_counts(
        V, idx.membership.astype(np.int8)))
    cands = match_ops.candidates_from_counts(counts, num_sets, 0.25)
    for q, c in zip(queries, cands):
        oracle = idx.matches(q, 0.25)
        assert np.array_equal(np.sort(c), np.sort(oracle))


def test_match_from_to_identical():
    """match_from/match_to chain all seeds of identical sequences."""
    from downpore_tpu.seeds.cluster import match_from, match_to
    gaps = np.array([3, 10, 7, 12, 9, 4], np.int32)
    seeds = np.array([5, 9, 2, 14, 7], np.int32)
    a = SeedSequence(gaps, seeds, id=0, length=100)
    b = SeedSequence(gaps.copy(), seeds.copy(), id=1, length=100)
    mf = match_from(a, b, 0, 0, 0, 6)
    assert mf.match_a == [0, 1, 2, 3, 4]
    assert mf.match_b == [0, 1, 2, 3, 4]
    mb = match_to(a, b, 4, 4, 0, 6)
    assert mb.match_a == [0, 1, 2, 3]
    assert mb.match_b == [0, 1, 2, 3]


def test_match_from_skips_inserted_seed():
    """An extra seed in b is stepped over when gaps stay in ratio."""
    from downpore_tpu.seeds.cluster import match_from
    a = SeedSequence(np.array([0, 20, 20, 20, 0], np.int32),
                     np.array([5, 9, 2, 14], np.int32), id=0, length=110)
    b = SeedSequence(np.array([0, 20, 8, 6, 20, 0], np.int32),
                     np.array([5, 9, 77, 2, 14], np.int32), id=1,
                     length=116)
    mf = match_from(a, b, 0, 0, 0, 6)
    assert mf.match_a == [0, 1, 2, 3]
    assert mf.match_b == [0, 1, 3, 4]


def test_merge_blends_gaps_and_keeps_all_seeds():
    from downpore_tpu.seeds.cluster import match_from, merge
    a = SeedSequence(np.array([0, 10, 30, 0], np.int32),
                     np.array([5, 9, 14], np.int32), id=0, length=80)
    b = SeedSequence(np.array([0, 20, 12, 8, 0], np.int32),
                     np.array([5, 9, 42, 14], np.int32), id=1, length=90)
    m = match_from(a, b, 0, 0, 0, 6)
    assert m.match_a == [0, 1, 2]
    merged, new_idx = merge(m, 6, 0.5)
    # all distinct seeds present, in timeline order
    assert list(merged.seeds) == [5, 9, 42, 14]
    # matched gap 10/20 blends to 15
    assert int(merged.gaps[1]) == 15
    # index map points at the right seeds
    assert [int(merged.seeds[new_idx[i]]) for i in range(3)] == [5, 9, 14]


def test_cluster_consensus_recovers_truth():
    """Noisy copies of a seed sequence -> consensus with full support."""
    from downpore_tpu.seeds.cluster import consensus
    rng = np.random.default_rng(17)
    k = 8
    n = 40
    truth_seeds = rng.choice(5000, n, replace=False).astype(np.int32)
    truth_gaps = rng.integers(5, 40, n + 1).astype(np.int32)

    def noisy_copy(sid):
        keep = rng.random(n) > 0.12          # dropped seeds
        gaps, seeds = [int(truth_gaps[0])], []
        acc = 0
        for i in range(n):
            g = int(truth_gaps[i]) + int(rng.integers(-2, 3))
            if i == 0:
                g = int(truth_gaps[0])
            if keep[i]:
                seeds.append(int(truth_seeds[i]))
                gaps.append(acc + int(rng.integers(-2, 3)) if seeds[:-1]
                            else g)
                acc = 0
            else:
                acc += g + k
        # rebuild gaps properly: distance since previous kept seed
        gaps = [0]
        acc = int(truth_gaps[0])
        for i in range(n):
            if keep[i]:
                gaps.append(acc + int(rng.integers(0, 3)))
                acc = 0
            else:
                acc += int(truth_gaps[i + 1]) + k
                continue
            acc = int(truth_gaps[i + 1])
        gaps = [gaps[1]] + gaps[2:] + [0]
        s = SeedSequence(np.array(gaps, np.int32),
                         np.array(seeds, np.int32), id=sid, length=0)
        s.length = s.seed_offset(s.num_seeds - 1, k) + k
        first = int(np.flatnonzero(keep)[0])
        return s, first

    seqs, anchors = [], []
    for sid in range(8):
        s, first = noisy_copy(sid)
        seqs.append(s)
        anchors.append(0)   # anchor at each copy's first seed
    badness = list(range(8))
    result = consensus(seqs, badness, anchors, [0] * 8, k)
    assert len(result) >= 5          # most members re-align
    target = result[0].seq_a
    # consensus seeds are a subsequence of the truth ordering
    ti = {int(s): i for i, s in enumerate(truth_seeds)}
    order = [ti[int(s)] for s in target.seeds if int(s) in ti]
    assert order == sorted(order)
    assert len(order) >= n // 2      # most truth seeds recovered


def test_native_add_seeds_walk_parity():
    """Native add_seeds_walk must reproduce the Python walk exactly
    (block resets, bounded ascending insert, tie order)."""
    import numpy as np
    from downpore_tpu import native
    from downpore_tpu.seeds import SeedIndex
    from downpore_tpu.core import Sequence

    if native.load() is None:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(5)
    k = 10
    vals = rng.random(4 ** k)
    for trial in range(5):
        seq = Sequence.from_string(
            "".join("ACGT"[i] for i in rng.integers(0, 4, 1000)), id=trial)
        i1, i2 = SeedIndex(k), SeedIndex(k)
        for km in rng.integers(0, 4 ** k, 50):
            i1._add_seed_kmer(int(km))
            i2._add_seed_kmer(int(km))
        i1.add_seeds(seq, 15, vals)
        orig = native.add_seeds_walk
        native.add_seeds_walk = lambda *a, **kw: None
        try:
            i2.add_seeds(seq, 15, vals)
        finally:
            native.add_seeds_walk = orig
        assert i1.seed_map == i2.seed_map


def test_native_add_single_seeds_parity():
    """Native add_single_seeds_walk must reproduce the Python loop's
    live-table window semantics exactly (seed ids, table, map)."""
    import numpy as np
    from downpore_tpu import native
    from downpore_tpu.seeds import SeedIndex
    from downpore_tpu.core import Sequence

    if native.load() is None:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(9)
    k = 11
    vals = rng.random(4 ** k)
    for trial in range(3):
        n = int(rng.integers(5000, 40000))
        seq = Sequence.from_string(
            "".join("ACGT"[i] for i in rng.integers(0, 4, n)), id=trial)
        i1, i2 = SeedIndex(k), SeedIndex(k)
        for km in rng.integers(0, 4 ** k, 20):
            i1._add_seed_kmer(int(km))
            i2._add_seed_kmer(int(km))
        i1.add_single_seeds(seq, 40, vals)
        orig = native.add_single_seeds_walk
        native.add_single_seeds_walk = lambda *a, **kw: None
        try:
            i2.add_single_seeds(seq, 40, vals)
        finally:
            native.add_single_seeds_walk = orig
        assert i1.seed_map == i2.seed_map
        assert (i1.kmer_table == i2.kmer_table).all()
        assert (i1.kmer_map == i2.kmer_map).all()
