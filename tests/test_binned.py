"""Two-level binned retrieval (ops.map_engine binned mode) must be
exactly equivalent to the flat [H, C] gate: bins only *pre-filter*
(bin counts upper-bound chunk counts), BB-escalation restores any
query whose passing bins overflow the selection width, and the
collector restores the reference's chunk-ascending walk order."""
import numpy as np
import pytest

from downpore_tpu.core import Sequence
from downpore_tpu.mapping import Mapper
from downpore_tpu.ops import map_engine
from downpore_tpu.utils import kmer_occurrences
from downpore_tpu.utils.kmers import score_seed_values

BASES = np.frombuffer(b"ACGT", np.uint8)


def _rand_seq(rng, n):
    return BASES[rng.integers(0, 4, n)].tobytes().decode()


def _mutate(rng, s, rate):
    arr = np.frombuffer(s.encode(), np.uint8).copy()
    m = rng.random(len(arr)) < rate
    arr[m] = BASES[rng.integers(0, 4, int(m.sum()))]
    return arr.tobytes().decode()


def _build(genome, k, binned, monkeypatch):
    monkeypatch.setattr(map_engine, "_BINNED_MIN_C",
                        16 if binned else 1 << 30)
    monkeypatch.setattr(map_engine, "_BINNED_CB", 8)
    ref = Sequence.from_string(genome, id=0, name="ref")
    counts = kmer_occurrences([ref], k)
    values = score_seed_values(counts, k)
    return Mapper(ref, False, k, values, seed_rate=40, edge_size=1000,
                  chunk_size=2000)


def _paf(mapper, results):
    return [mapper.as_string(m) for ms in results for m in ms]


def _reads(rng, genome, n, rc_every=3):
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    reads = []
    for i in range(n):
        p = int(rng.integers(0, len(genome) - 6000))
        L = int(rng.integers(3000, 6000))
        s = _mutate(rng, genome[p : p + L], 0.05)
        if i % rc_every == 0:
            s = s.encode().translate(comp)[::-1].decode()
        reads.append(Sequence.from_string(s, id=i, name=f"r{i}"))
    return reads


def test_binned_matches_flat(monkeypatch):
    rng = np.random.default_rng(11)
    genome = _rand_seq(rng, 150_000)
    reads = _reads(np.random.default_rng(12), genome, 24)

    flat = _build(genome, 11, False, monkeypatch)
    binned = _build(genome, 11, True, monkeypatch)
    assert not flat.engine._binned and binned.engine._binned
    assert binned.engine._NB >= 4

    out_f = _paf(flat, flat.map_batch(reads))
    out_b = _paf(binned, binned.map_batch(reads))
    assert out_f == out_b
    assert len(out_b) >= 20


def test_binned_bb_escalation(monkeypatch):
    """A repeat planted at more loci than the bin-selection width BB
    forces n_bin escalation; results must still equal the flat gate."""
    rng = np.random.default_rng(21)
    repeat = _rand_seq(rng, 1500)
    parts = []
    for i in range(12):                      # 12 loci, BB starts at 8
        parts.append(_rand_seq(rng, 18_000))
        parts.append(repeat)
    parts.append(_rand_seq(rng, 18_000))
    genome = "".join(parts)

    flat = _build(genome, 11, False, monkeypatch)
    binned = _build(genome, 11, True, monkeypatch)
    assert binned.engine._binned and binned.engine._NB > 8

    rr = np.random.default_rng(22)
    reads = _reads(rr, genome, 12)
    # a read lying inside the repeat retrieves candidates in >8 bins
    reads.append(Sequence.from_string(
        _mutate(rr, repeat[100:1400], 0.02), id=98, name="rep"))
    out_f = _paf(flat, flat.map_batch(reads))
    out_b = _paf(binned, binned.map_batch(reads))
    assert out_f == out_b


def test_binned_engine_paths(monkeypatch):
    """dispatch_packed parity on both the derive (seeds-only upload) and
    shipped-bucket paths, at the raw head/summary level."""
    rng = np.random.default_rng(31)
    genome = _rand_seq(rng, 120_000)
    flat = _build(genome, 11, False, monkeypatch)
    binned = _build(genome, 11, True, monkeypatch)

    reads = _reads(np.random.default_rng(32), genome, 8)
    windows = []
    for r in reads:
        windows.append(r.subsequence(0, 1000))
        windows.append(r.subsequence(len(r) - 1000, len(r)))

    for strip_derive in (False, True):
        packs = []
        for eng in (flat.engine, binned.engine):
            packed = eng.pack_query_windows(windows)
            base_min = np.maximum(5, packed[6] // 5).astype(np.int32)
            if strip_derive:
                packed = packed[:6]      # no num_seeds -> shipped buckets
            packs.append(eng.collect_arrays(
                eng.dispatch_packed(packed, base_min)))
        (h_f, p_f), (h_b, p_b) = packs
        np.testing.assert_array_equal(h_f, h_b)
        np.testing.assert_array_equal(p_f, p_b)
        assert h_f.shape[0] > 0


def test_binned_hashed_recall(monkeypatch):
    """Forced-hash regime with H1 > H: collision noise must not cost
    recall — every planted read still maps to its true locus (bit parity
    with the flat gate is NOT promised under hashing: noise-only
    candidates may differ; see _derive_bin_mem_direct)."""
    from downpore_tpu.ops import match as match_ops
    rng = np.random.default_rng(41)
    genome = _rand_seq(rng, 200_000)
    orig = match_ops.choose_hash_size

    def forced(n, max_h=1 << 17):
        # level-2 space crushed to 512 buckets (heavy collisions);
        # level-1 keeps a 4096-bucket space
        return orig(n, 512 if max_h == 1 << 17 else 4096)

    monkeypatch.setattr(match_ops, "choose_hash_size", forced)
    mapper = _build(genome, 11, True, monkeypatch)
    eng = mapper.engine
    assert eng._binned and eng._hashed and eng.H == 512
    assert eng.H1 == 4096 and eng._hashed1

    reads = _reads(np.random.default_rng(42), genome, 16)
    results = mapper.map_batch(reads)
    placed = 0
    for r, ms in zip(reads, results):
        ok = any(m.ids > 50 for m in ms)
        placed += bool(ok)
    assert placed >= 15
