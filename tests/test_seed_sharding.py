"""Production seed-sharded index: mapping/overlap against a membership
matrix sharded over the mesh's ``seed`` axis must be bit-identical to the
replicated-index path (SURVEY §2.3: index sharded by k-mer bucket with
collective count merges — the genome-scale memory answer)."""
import numpy as np
import pytest

from downpore_tpu.core import Sequence
from downpore_tpu.parallel.mesh import make_mesh

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand(rng, n):
    return BASES[rng.integers(0, 4, n)].tobytes().decode()


def _mut(rng, s, rate=0.05):
    a = np.frombuffer(s.encode(), np.uint8).copy()
    m = rng.random(len(a)) < rate
    a[m] = BASES[rng.integers(0, 4, int(m.sum()))]
    return a.tobytes().decode()


def test_seed_sharded_map_bit_identical():
    from downpore_tpu.mapping import Mapper
    from downpore_tpu.utils import kmer_occurrences
    from downpore_tpu.utils.kmers import score_seed_values

    rng = np.random.default_rng(7)
    genome = _rand(rng, 30000)
    ref = Sequence.from_string(genome, id=0, name="g")
    k = 11
    values = score_seed_values(kmer_occurrences([ref], k), k)
    reads = []
    for i in range(24):
        p = int(rng.integers(0, 30000 - 2500))
        reads.append(Sequence.from_string(
            _mut(rng, genome[p : p + 2400]), id=i, name=f"r{i}"))

    plain = Mapper(ref, False, k, values, 40, 1000, 10000)
    mesh = make_mesh(n_data=4, n_seed=2)
    sharded = Mapper(ref, False, k, values, 40, 1000, 10000, mesh=mesh)
    assert sharded.engine.seed_sharded

    out_a = ["|".join(plain.as_string(m) for m in ms)
             for ms in plain.map_batch(reads)]
    out_b = ["|".join(sharded.as_string(m) for m in ms)
             for ms in sharded.map_batch(reads)]
    assert out_a == out_b


def test_seed_sharded_overlap_bit_identical():
    from downpore_tpu.seeds import SeedIndex
    from downpore_tpu.overlap import Overlapper, QUERY_EDGES
    from downpore_tpu.utils import kmer_occurrences
    from downpore_tpu.utils.kmers import score_seed_values

    rng = np.random.default_rng(8)
    genome = _rand(rng, 20000)
    reads = []
    for i in range(32):
        p = int(rng.integers(0, 20000 - 2600))
        reads.append(Sequence.from_string(
            _mut(rng, genome[p : p + 2500], 0.04), id=i, name=f"o{i}"))
    k = 10
    values = score_seed_values(kmer_occurrences(reads, k), k)

    def run(mesh):
        index = SeedIndex(k)
        ov = Overlapper(index, 10000, 1000, 15, 0.25, mesh=mesh)
        queries = ov.prepare_queries(15, 10000, values, iter(reads),
                                     QUERY_EDGES)
        ov.add_sequences(iter(reads))
        ms = ov.find_overlaps(queries)
        return [(m.query_id, m.seq_b.id, m.rc_query, tuple(m.match_a),
                 tuple(m.match_b)) for m in ms]

    out_a = run(None)
    out_b = run(make_mesh(n_data=4, n_seed=2))
    assert out_a == out_b and len(out_a) > 0


def _shard_elems(arr):
    """Per-device element counts of a sharded array."""
    return [int(np.prod(s.data.shape)) for s in arr.addressable_shards]


def _assert_balanced(counts, tol=0.1):
    """Every device's share within ~10% of the mean (VERDICT: a 90/10
    split must fail, padding-equal splits pass)."""
    assert len(counts) > 1
    mean = sum(counts) / len(counts)
    for c in counts:
        assert abs(c - mean) <= tol * mean + 1, counts


def test_data_parallel_work_balance():
    """Every device array the production -data_parallel map path ships
    must shard evenly across the mesh (shape-level check: a skewed
    batch split would starve devices regardless of timing)."""
    from downpore_tpu.mapping import Mapper
    from downpore_tpu.utils import kmer_occurrences
    from downpore_tpu.utils.kmers import score_seed_values

    rng = np.random.default_rng(17)
    genome = _rand(rng, 30000)
    ref = Sequence.from_string(genome, id=0, name="g")
    k = 11
    values = score_seed_values(kmer_occurrences([ref], k), k)
    reads = []
    for i in range(24):
        p = int(rng.integers(0, 30000 - 2500))
        reads.append(Sequence.from_string(
            _mut(rng, genome[p : p + 2400]), id=i, name=f"r{i}"))
    mesh = make_mesh(n_data=8)
    mapper = Mapper(ref, False, k, values, 40, 1000, 10000, mesh=mesh)
    eng = mapper.engine
    recorded = []
    orig = eng._put_data

    def rec(a):
        d = orig(a)
        recorded.append(d)
        return d

    eng._put_data = rec
    mapper.map_batch(reads)
    assert recorded, "no data-parallel transfers recorded"
    for d in recorded:
        _assert_balanced(_shard_elems(d))


def test_seed_sharded_membership_balance():
    """The seed-sharded membership matrix must give every device an
    equal hash-bucket range."""
    from downpore_tpu.mapping import Mapper
    from downpore_tpu.utils import kmer_occurrences
    from downpore_tpu.utils.kmers import score_seed_values

    rng = np.random.default_rng(18)
    genome = _rand(rng, 30000)
    ref = Sequence.from_string(genome, id=0, name="g")
    k = 11
    values = score_seed_values(kmer_occurrences([ref], k), k)
    mesh = make_mesh(n_data=4, n_seed=2)
    mapper = Mapper(ref, False, k, values, 40, 1000, 10000, mesh=mesh)
    assert mapper.engine.seed_sharded
    # per seed-group shard rows must be equal; every device holds one
    _assert_balanced(_shard_elems(mapper.engine.membership))


def test_balance_check_catches_skew():
    """The balance assertion itself must have teeth: a deliberately
    skewed split (one device holding 7x the others' rows) fails, as does
    a device starved to zero.  (JAX's NamedSharding refuses to CONSTRUCT
    uneven splits — which is itself part of the guarantee — so the skew
    is fed to the checker directly.)"""
    with pytest.raises(AssertionError):
        _assert_balanced([7 * 4, 4, 4, 4, 4, 4, 4, 4])
    with pytest.raises(AssertionError):
        _assert_balanced([2048, 2048, 2048, 2048, 2048, 2048, 2048, 0])
    _assert_balanced([2048] * 8)       # even split passes
