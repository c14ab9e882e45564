"""Overlapper + seed-space consensus tests on synthetic reads."""
import numpy as np
import pytest

from downpore_tpu.core import Sequence
from downpore_tpu.seeds import SeedIndex
from downpore_tpu.seeds import msa
from downpore_tpu.overlap import (Overlapper, QUERY_EDGES, build_consensus)

BASES = "ACGT"
K = 10


def rand_bases(n, rng):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def mutate(codes, rate, rng):
    codes = codes.copy()
    mask = rng.random(len(codes)) < rate
    codes[mask] = (codes[mask] + rng.integers(1, 4, int(mask.sum()))) % 4
    return codes


@pytest.fixture(scope="module")
def overlap_setup():
    """Reads drawn from a 20kb genome with 50% overlap between
    neighbours."""
    rng = np.random.default_rng(5)
    genome = Sequence.from_string(rand_bases(20000, rng), id=0, name="g")
    reads = []
    for i, start in enumerate(range(0, 16000, 2000)):
        codes = mutate(genome.codes[start:start + 4000], 0.05, rng)
        reads.append(Sequence(codes, id=i, name=f"read{i}"))
    index = SeedIndex(K)
    ov = Overlapper(index, chunk_size=10000, overlap=1000, min_seeds=10,
                    hit_fraction=0.25)
    values = np.ones(4 ** K)
    queries = ov.prepare_queries(15, 10000, values, iter(reads), QUERY_EDGES)
    ov.add_sequences(iter(reads))
    return genome, reads, index, ov, queries


def test_prepare_queries(overlap_setup):
    genome, reads, index, ov, queries = overlap_setup
    # each read contributes front+back edges, each with fw + rc queries
    assert len(queries) == len(reads) * 4
    assert index.num_seeds > 100
    # rc queries alternate with forward ones and share ids
    assert queries[0].id == queries[1].id
    assert not queries[0].rc and queries[1].rc


def test_find_overlaps(overlap_setup):
    genome, reads, index, ov, queries = overlap_setup
    matches = ov.find_overlaps(queries)
    assert len(matches) > 0
    # group matches by query id; neighbouring reads should overlap
    found = set()
    for m in matches:
        qid = m.query_id
        target_read = m.seq_b.id
        found.add((qid // 2, target_read))
    # read i's edges should hit read i-1 or i+1 (50% overlaps)
    neighbour_hits = 0
    for i in range(len(reads)):
        if any((i, j) in found for j in (i - 1, i + 1)):
            neighbour_hits += 1
    assert neighbour_hits >= len(reads) // 2
    # all matches must be valid seed chains
    for m in matches[:20]:
        assert m.validate()


def test_chunking_covers_read(overlap_setup):
    genome, reads, index, ov, queries = overlap_setup
    # chunks must jointly cover each read's seeds
    by_read = {}
    for c in index.sequences:
        by_read.setdefault(c.id, []).append(c)
    for rid, chunks in by_read.items():
        starts = sorted(c.offset for c in chunks)
        read = reads[rid]
        # coverage from near the start to near the end of the read
        ends = sorted(c.offset + c.length for c in chunks)
        assert starts[0] < 600
        assert ends[-1] > len(read) - 600


def test_msa_consensus_simple():
    k = 10
    rng = np.random.default_rng(9)
    # three identical seed sequences: consensus == the sequence
    seeds = rng.integers(0, 50, 12).astype(np.int32)
    gaps = np.full(13, 20, dtype=np.int32)
    from downpore_tpu.seeds.seed_sequence import SeedSequence
    seqs = [SeedSequence(gaps.copy(), seeds.copy(), id=i) for i in range(3)]
    cons, matches = msa.consensus(seqs, k)
    assert len(matches) == 3
    assert cons.num_seeds >= 10
    # each member matches nearly all consensus seeds in order
    for m in matches:
        assert len(m.match_a) >= 10
        assert m.match_a == sorted(m.match_a)
        got = [int(cons.seeds[a]) for a in m.match_a]
        want = [int(m.seq_b.seeds[b]) for b in m.match_b]
        assert got == want


def test_msa_consensus_with_noise():
    k = 10
    rng = np.random.default_rng(10)
    base_seeds = rng.integers(0, 60, 15).astype(np.int32)
    base_gaps = rng.integers(5, 40, 16).astype(np.int32)
    from downpore_tpu.seeds.seed_sequence import SeedSequence
    seqs = []
    for i in range(5):
        seeds = base_seeds.copy()
        # drop one or two seeds per sequence (sequencing dropouts)
        drop = rng.choice(15, size=2, replace=False)
        keep = np.setdiff1d(np.arange(15), drop)
        pos = np.concatenate([[0], np.cumsum(base_gaps[:-1] + k)])[keep]
        gaps = np.empty(len(keep) + 1, np.int32)
        gaps[0] = pos[0]
        gaps[1:-1] = np.diff(pos) - k
        gaps[-1] = 10
        seqs.append(SeedSequence(gaps, seeds[keep], id=i))
    cons, matches = msa.consensus(seqs, k)
    assert len(matches) >= 3
    # consensus should recover most of the shared seeds
    assert cons.num_seeds >= 8


def test_build_consensus(overlap_setup):
    genome, reads, index, ov, queries = overlap_setup
    matches = ov.find_overlaps(queries)
    by_query = {}
    for m in matches:
        by_query.setdefault(m.query_id, []).append(m)
    built = 0
    for qid, laps in by_query.items():
        if len(laps) < 2:
            continue
        contig = build_consensus(index, laps)
        if contig is not None:
            built += 1
            assert contig.combined.num_seeds > 0
            assert len(contig.parts) == len(contig.offsets)
            for m in contig.matches:
                assert len(m.match_a) >= 3
    assert built >= 1


def test_device_derived_membership_matches_host():
    """When no chunk is truncated, MapEngine derives the membership
    matrix on device from the resident chunk seed tables; it must equal
    the host unique-seed hash scatter bit-for-bit (both the identity and
    the forced-hash bucket regimes)."""
    import numpy as np
    from downpore_tpu.core import Sequence
    from downpore_tpu.seeds import SeedIndex
    from downpore_tpu.ops.map_engine import MapEngine
    from downpore_tpu.ops import match as match_ops

    rng = np.random.default_rng(55)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    k = 8
    index = SeedIndex(k)
    values = np.ones(4 ** k)
    seqs = []
    for i in range(24):
        s = Sequence.from_string(
            bases[rng.integers(0, 4, 3000)].tobytes().decode(), id=i)
        seqs.append(s)
        index.add_seeds(s, 40, values)
    for s in seqs:
        index.add_sequence(index.new_seed_sequence(s))
    index.index_sequences()
    max_ts = max(s.num_seeds for s in index.sequences)
    eng = MapEngine(index, k, nq=64, nt=((max_ts + 127) // 128) * 128)
    got = np.asarray(eng.membership)
    S = index.num_seeds
    H = eng.H
    mem = np.zeros((H, got.shape[1]), np.int8)
    for ci, s in enumerate(index.sequences):
        if s.seeds.size:
            mem[match_ops.hash_ids(np.unique(s.seeds), S, H), ci] = 1
    assert np.array_equal(got, mem)

    # forced-hash regime: H smaller than the seed count
    H2 = 64
    import downpore_tpu.ops.map_engine as ME
    orig = match_ops.choose_hash_size
    match_ops.choose_hash_size = lambda n, max_h=1 << 17: H2
    try:
        eng2 = MapEngine(index, k, nq=64,
                         nt=((max_ts + 127) // 128) * 128)
    finally:
        match_ops.choose_hash_size = orig
    got2 = np.asarray(eng2.membership)
    mem2 = np.zeros((H2, got2.shape[1]), np.int8)
    for ci, s in enumerate(index.sequences):
        if s.seeds.size:
            mem2[match_ops.hash_ids(np.unique(s.seeds), S, H2), ci] = 1
    assert np.array_equal(got2, mem2)


def test_pack_queries_vec_parity():
    """The vectorized query packer must equal the per-query loop on all
    need_buckets=False fields, including empty and sub-k queries."""
    import numpy as np
    from downpore_tpu.core import Sequence
    from downpore_tpu.seeds import SeedIndex
    from downpore_tpu.ops.map_engine import MapEngine

    rng = np.random.default_rng(9)
    B = np.frombuffer(b"ACGT", np.uint8)
    reads = [Sequence.from_string(
        B[rng.integers(0, 4, int(rng.integers(60, 900)))].tobytes()
        .decode(), id=i) for i in range(40)]
    index = SeedIndex(8)
    ones = np.ones(4 ** 8)
    for r in reads[:12]:
        index.add_seeds(r, 12, ones)
    chunks = [index.new_seed_sequence(r) for r in reads]
    for c in chunks:
        index.add_sequence(c)
    index.index_sequences()
    eng = MapEngine(index, 8, nq=64, nt=256)
    queries = [index.new_seed_sequence(r) for r in reads]
    queries.append(index.new_seed_sequence(
        Sequence.from_string("ACG", id=99)))      # sub-k: zero seeds
    a = eng.pack_queries(queries, need_buckets=False)
    b = eng.pack_queries_vec(queries)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
