"""Mapper end-to-end tests on a synthetic genome."""
import numpy as np
import pytest

from downpore_tpu.core import Sequence
from downpore_tpu.mapping import Mapper
from downpore_tpu.utils import kmer_occurrences
from downpore_tpu.utils.kmers import score_seed_values

BASES = "ACGT"
K = 11


def rand_bases(n, rng):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def mutate(codes, rate, rng):
    codes = codes.copy()
    mask = rng.random(len(codes)) < rate
    codes[mask] = (codes[mask] + rng.integers(1, 4, mask.sum())) % 4
    return codes


@pytest.fixture(scope="module")
def genome_and_mapper():
    rng = np.random.default_rng(42)
    genome = Sequence.from_string(rand_bases(60000, rng), id=0, name="chr")
    counts = kmer_occurrences([genome], K)
    values = score_seed_values(counts, K)
    mapper = Mapper(genome, circular=False, k=K, kmer_values=values,
                    seed_rate=40, edge_size=1000, chunk_size=10000)
    return genome, mapper, rng


def test_index_built(genome_and_mapper):
    genome, mapper, _ = genome_and_mapper
    assert mapper.index.num_seeds > 500
    assert mapper.index.num_sequences >= 6


def test_map_exact_read(genome_and_mapper):
    genome, mapper, rng = genome_and_mapper
    read = Sequence(genome.codes[20000:24000].copy(), id=1, name="r")
    maps = mapper.map(read)
    assert len(maps) == 1
    m = maps[0]
    assert not m.rc
    assert abs(m.start - 20000) < 100
    assert abs(m.end - 24000) < 100
    assert m.query_offset < 100 and m.query_inset < 100


def test_map_noisy_read(genome_and_mapper):
    genome, mapper, rng = genome_and_mapper
    codes = mutate(genome.codes[5000:9000], 0.08, rng)
    read = Sequence(codes, id=2, name="noisy")
    maps = mapper.map(read)
    assert len(maps) >= 1
    m = max(maps, key=lambda m: m.ids)
    assert not m.rc
    assert abs(m.start - 5000) < 200
    assert abs(m.end - 9000) < 200


def test_map_rc_read(genome_and_mapper):
    genome, mapper, rng = genome_and_mapper
    read = Sequence(genome.codes[30000:34000].copy(), id=3,
                    name="rcread").reverse_complement()
    read.offset = read.inset = 0
    maps = mapper.map(read)
    assert len(maps) >= 1
    m = max(maps, key=lambda m: m.ids)
    assert m.rc
    assert abs(m.start - 30000) < 200
    assert abs(m.end - 34000) < 200


def test_map_short_read(genome_and_mapper):
    genome, mapper, rng = genome_and_mapper
    read = Sequence(genome.codes[10000:11500].copy(), id=4, name="short")
    maps = mapper.map(read)
    assert len(maps) >= 1
    assert abs(maps[0].start - 10000) < 200


def test_chimeric_read(genome_and_mapper):
    genome, mapper, rng = genome_and_mapper
    codes = np.concatenate([genome.codes[2000:6000],
                            genome.codes[40000:44000]])
    read = Sequence(codes, id=5, name="chimera")
    maps = mapper.map_batch([read])[0]
    # both halves should be reported
    assert len(maps) >= 2
    starts = sorted(m.start for m in maps)
    assert any(abs(s - 2000) < 500 for s in starts)
    assert any(abs(s - 40000) < 500 for s in starts)


def test_unmappable_read(genome_and_mapper):
    genome, mapper, rng = genome_and_mapper
    read = Sequence.from_string(rand_bases(3000, np.random.default_rng(99)),
                                id=6, name="junk")
    maps = mapper.map(read)
    assert maps == []


def test_paf_output(genome_and_mapper):
    genome, mapper, rng = genome_and_mapper
    read = Sequence(genome.codes[20000:24000].copy(), id=7, name="pafread")
    m = mapper.map(read)[0]
    line = mapper.as_string(m)
    fields = line.split("\t")
    assert fields[0] == "pafread"
    assert int(fields[1]) == 4000
    assert fields[4] == "+"
    assert fields[5] == "chr"
    assert int(fields[6]) == 60000
    assert int(fields[11]) == 255


def test_map_batch_multiple(genome_and_mapper):
    genome, mapper, rng = genome_and_mapper
    reads = [Sequence(genome.codes[s:s + 3500].copy(), id=10 + i,
                      name=f"b{i}")
             for i, s in enumerate((1000, 15000, 33000, 50000))]
    all_maps = mapper.map_batch(reads)
    for (read, maps), s in zip(zip(reads, all_maps), (1000, 15000, 33000, 50000)):
        assert len(maps) >= 1
        assert abs(maps[0].start - s) < 200


def test_map_data_parallel_identical(genome_and_mapper):
    """The same mappings when query batches shard over an 8-device data
    mesh (reference index replicated)."""
    from downpore_tpu.parallel.mesh import make_mesh
    genome, mapper, _ = genome_and_mapper
    rng = np.random.default_rng(77)
    counts = kmer_occurrences([genome], K)
    values = score_seed_values(counts, K)
    mesh = make_mesh()
    dp_mapper = Mapper(genome, circular=False, k=K, kmer_values=values,
                       seed_rate=40, edge_size=1000, chunk_size=10000,
                       mesh=mesh)
    reads = []
    for i in range(12):
        start = int(rng.integers(0, 55000))
        ln = int(rng.integers(2000, 4000))
        codes = mutate(genome.codes[start:start + ln].copy(), 0.08, rng)
        reads.append(Sequence(codes, id=i, name=f"r{i}"))
    single = [[mapper.as_string(m) for m in ms]
              for ms in mapper.map_batch(reads)]
    sharded = [[dp_mapper.as_string(m) for m in ms]
               for ms in dp_mapper.map_batch(reads)]
    assert single == sharded
    assert sum(len(ms) for ms in single) >= 10


def test_derived_buckets_match_shipped(genome_and_mapper):
    """The on-device run/distinct bucket derivation (_derive_buckets)
    must reproduce the host-packed q_rb/q_db retrieval counts exactly
    whenever every extracted seed fits the shipped width."""
    import jax
    import jax.numpy as jnp
    from downpore_tpu.ops.map_engine import _derive_buckets, _count_rows

    genome, mapper, rng = genome_and_mapper
    eng = mapper.engine
    windows = []
    for _ in range(32):
        p = int(rng.integers(0, len(genome) - 1000))
        w = genome.subsequence(p, p + 1000)
        windows.append(w)
    packed = eng.pack_query_windows(windows)
    q_seeds, q_pos, q_rb, q_db, num_sets, q_len, num_seeds = packed
    nq = q_seeds.shape[1]
    assert int(num_seeds.max()) <= nq, "fixture must fit the width"
    rb_d, db_d = jax.jit(
        _derive_buckets, static_argnames=("H", "hashed"))(
            jnp.asarray(q_seeds, jnp.int32), eng.usable_dev,
            H=eng.H, hashed=eng._hashed)
    mem = jnp.asarray(np.asarray(eng.membership))
    c_host = np.asarray(_count_rows(mem, jnp.asarray(q_rb, jnp.int32)))
    c_dev = np.asarray(_count_rows(mem, rb_d))
    np.testing.assert_array_equal(c_host, c_dev)
    d_host = np.asarray(_count_rows(mem, jnp.asarray(q_db, jnp.int32)))
    d_dev = np.asarray(_count_rows(mem, db_d))
    np.testing.assert_array_equal(d_host, d_dev)


def test_derived_buckets_hashed_parity():
    """Forced-hash case: device uint32 wrap hash == numpy 64-bit hash
    (H is a power of two) and duplicate-bucket collapse matches."""
    import jax.numpy as jnp
    from downpore_tpu.ops.map_engine import _derive_buckets, _count_rows
    from downpore_tpu.ops import match as match_ops

    rng = np.random.default_rng(3)
    S, H, M, nq, C = 5000, 1024, 16, 24, 8
    usable = rng.random(S) < 0.9
    q_seeds = np.full((M, nq), -1, np.int64)
    for i in range(M):
        n = int(rng.integers(3, nq + 1))
        q_seeds[i, :n] = rng.integers(0, S, n)
    # host derivation (pack_query_windows semantics)
    rb_h = np.full((M, nq), -1, np.int64)
    db_h = np.full((M, nq), -1, np.int64)
    for i in range(M):
        prev = -2
        runs = []
        for s in q_seeds[i]:
            if s < 0:
                break
            if usable[s]:
                if s != prev:
                    runs.append(int(s))
                prev = s
            # NOTE: prev only advances on usable seeds, matching
            # pack_query_windows' maximum.accumulate over usable slots
        rb = match_ops.hash_ids(np.array(runs, np.int64), S, H)
        rb_h[i, :len(rb)] = rb
        db = np.unique(rb)
        db_h[i, :len(db)] = db
    mem = rng.integers(0, 2, (H, C)).astype(np.int8)
    rb_d, db_d = _derive_buckets(
        jnp.asarray(q_seeds, jnp.int32),
        jnp.asarray(usable.astype(np.int8)), H=H, hashed=True)
    c_h = np.asarray(_count_rows(jnp.asarray(mem),
                                 jnp.asarray(rb_h, jnp.int32)))
    c_d = np.asarray(_count_rows(jnp.asarray(mem), rb_d))
    np.testing.assert_array_equal(c_h, c_d)
    d_h = np.asarray(_count_rows(jnp.asarray(mem),
                                 jnp.asarray(db_h, jnp.int32)))
    d_d = np.asarray(_count_rows(jnp.asarray(mem), db_d))
    np.testing.assert_array_equal(d_h, d_d)


def test_sharded_map_batch_identical(monkeypatch):
    """map_batch's two-shard threading must produce identical results to
    the single-shard path (reads are independent; this pins it)."""
    import numpy as np
    from downpore_tpu.mapping import Mapper
    from downpore_tpu.utils import kmer_occurrences
    from downpore_tpu.utils.kmers import score_seed_values
    from downpore_tpu.core import Sequence

    B = np.frombuffer(b"ACGT", np.uint8)
    rng = np.random.default_rng(3)
    genome = B[rng.integers(0, 4, 60000)].tobytes().decode()
    ref = Sequence.from_string(genome, id=0, name="g")
    values = score_seed_values(kmer_occurrences([ref], 11), 11)
    mapper = Mapper(ref, False, 11, values, 40, 1000, 10000)
    reads = []
    for i in range(20):
        p = int(rng.integers(0, 60000 - 4000))
        arr = np.frombuffer(genome[p : p + 3800].encode(), np.uint8).copy()
        m = rng.random(len(arr)) < 0.05
        arr[m] = B[rng.integers(0, 4, int(m.sum()))]
        reads.append(Sequence.from_string(arr.tobytes().decode(), id=i,
                                          name=f"r{i}"))
    single = [[mapper.as_string(m) for m in ms]
              for ms in mapper._map_batch_one(reads)]
    monkeypatch.setattr(Mapper, "_SHARD_MIN", 8)
    sharded = [[mapper.as_string(m) for m in ms]
               for ms in mapper.map_batch(reads)]
    assert single == sharded
    assert sum(1 for ms in single if ms) >= 18
