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


def test_native_pack_windows_matches_numpy():
    """The one-pass native packer and the numpy pipeline in
    MapEngine.pack_query_windows must agree bit-for-bit (same seeds,
    positions, run counts, hashed buckets, distinct-bucket layout)."""
    from downpore_tpu.core import Sequence
    from downpore_tpu.mapping import Mapper
    from downpore_tpu.utils import kmer_occurrences
    from downpore_tpu.utils.kmers import score_seed_values

    if native.load() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, 60_000)].tobytes().decode()
    ref = Sequence.from_string(genome, id=0, name="g")
    k = 10
    values = score_seed_values(kmer_occurrences([ref], k), k)
    mapper = Mapper(ref, False, k, values, seed_rate=40, edge_size=500,
                    chunk_size=5000)
    eng = mapper.engine

    windows = []
    for i in range(40):
        p = int(rng.integers(0, 59_000))
        L = int(rng.integers(200, 1000))
        s = genome[p : p + L]
        windows.append(Sequence.from_string(s, id=i))
    # short/degenerate windows too
    windows.append(Sequence.from_string("ACGTACG", id=98))
    windows.append(Sequence.from_string("AAAAAAAAAAAAAAAAAAAAAA", id=99))

    lens_b = np.array([len(w) for w in windows], np.int64)
    nat = eng._pack_windows_native(windows, lens_b)
    assert nat is not None
    try:
        eng_load = native.load
        native.load = lambda: None  # force the numpy pipeline
        ref_out = eng.pack_query_windows(windows)
    finally:
        native.load = eng_load
    names = ["q_seeds", "q_pos", "q_rb", "q_db", "num_sets", "num_seeds"]
    nat_full = (nat[0], nat[1], nat[2], nat[3], nat[4], nat[5])
    ref_full = (ref_out[0], ref_out[1], ref_out[2], ref_out[3],
                ref_out[4], ref_out[6])
    for name, a, b in zip(names, nat_full, ref_full):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_native_walk_candidates_matches_python():
    """The native mapper candidate walk must reproduce the Python
    sequential adaptive-threshold walk exactly (same mappings, same
    order) on a real end-to-end mapping load including RC reads,
    chimeras and repeat-crossing windows."""
    from downpore_tpu.core import Sequence
    from downpore_tpu.mapping import Mapper
    from downpore_tpu.utils import kmer_occurrences
    from downpore_tpu.utils.kmers import score_seed_values

    if native.load() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(1777)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    core = bases[rng.integers(0, 4, 80_000)]
    # plant a tandem repeat so some windows hit multiple chunks
    genome = (core.tobytes() + core[:6000].tobytes()
              + core[40_000:52_000].tobytes()).decode()
    ref = Sequence.from_string(genome, id=0, name="g")
    k = 10
    values = score_seed_values(kmer_occurrences([ref], k), k)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    reads = []
    for i in range(96):
        p = int(rng.integers(0, len(genome) - 7000))
        L = int(rng.integers(2500, 7000))
        arr = np.frombuffer(genome[p : p + L].encode(), np.uint8).copy()
        m = rng.random(len(arr)) < 0.06
        arr[m] = bases[rng.integers(0, 4, int(m.sum()))]
        s = arr.tobytes()
        if i % 2:
            s = s.translate(comp)[::-1]
        reads.append(Sequence.from_string(s.decode(), id=i, name=f"r{i}"))
    # a chimera: two distant segments joined
    chi = genome[1000:4000] + genome[60_000:64_000]
    reads.append(Sequence.from_string(chi, id=96, name="chimera"))

    def run(force_python: bool):
        mapper = Mapper(ref, False, k, values, seed_rate=40,
                        edge_size=1000, chunk_size=10_000)
        if force_python:
            orig = native.walk_candidates
            native.walk_candidates = lambda *a, **kw: None
            try:
                res = mapper.map_batch(reads)
            finally:
                native.walk_candidates = orig
        else:
            res = mapper.map_batch(reads)
        return [[(m.start, m.end, m.query_offset, m.query_inset, m.rc,
                  m.ids) for m in ms] for ms in res]

    nat = run(False)
    py = run(True)
    assert nat == py


def test_new_seed_sequences_batch_matches_per_read():
    """Batched native gapped-seed extraction == the per-read path,
    including sub-k reads and reads with no seeds."""
    from downpore_tpu.core import Sequence
    from downpore_tpu.seeds import SeedIndex

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    k = 8
    index = SeedIndex(k)
    # register a few hundred random seeds
    for km in rng.integers(0, 4 ** k, 400):
        index._add_seed_kmer(int(km))
    seqs = []
    for i in range(37):
        L = int(rng.integers(3, 4000))  # includes < k lengths
        s = bases[rng.integers(0, 4, L)].tobytes().decode()
        seqs.append(Sequence.from_string(s, id=i, name=f"b{i}"))
    batch = index.new_seed_sequences_batch(seqs)
    singles = [index.new_seed_sequence(s) for s in seqs]
    assert len(batch) == len(singles)
    for b, s in zip(batch, singles):
        assert np.array_equal(b.gaps, s.gaps)
        assert np.array_equal(b.seeds, s.seeds)
        assert (b.id, b.name, b.length, b.offset, b.inset) == \
            (s.id, s.name, s.length, s.offset, s.inset)
