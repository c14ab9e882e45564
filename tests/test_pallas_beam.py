"""Parity tests for the fused Pallas beam-consensus kernel.

The XLA device engine (ops.dtw.device_consensus) is the oracle: the
Pallas kernel (ops.pallas_beam) must reproduce its records bit-for-bit
on CPU in interpret mode (the TPU path was additionally verified
bit-identical on 256 bench-shape jobs on a real v5e).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from downpore_tpu.align import SimpleMeasure  # noqa: E402
from downpore_tpu.ops.dtw import (_device_consensus_vmapped,  # noqa: E402
                                  _pad_job)
from downpore_tpu.ops.pallas_beam import (JB, PAD, W,  # noqa: E402
                                          pallas_consensus)

K = 5
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def kmers_of(codes: np.ndarray, k: int = K) -> np.ndarray:
    km = np.zeros(len(codes) - k + 1, np.int64)
    for j in range(k):
        km = (km << 2) | codes[j:j + len(km)]
    return km.astype(np.int32)


def mutate(rng, codes, sub=0.05, ins=0.02, dele=0.02):
    out = []
    for c in codes:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(rng.integers(0, 4))
        if r < dele + ins + sub:
            out.append((int(c) + int(rng.integers(1, 4))) % 4)
        else:
            out.append(int(c))
    return np.array(out, np.uint8)


def run_pair(jobs, t_max, beam=8):
    """Run the XLA engine and the interpreted Pallas kernel on the same
    padded job block; return both (chains, ns) pairs."""
    N = 8
    L = max(max(len(m) for m in j) for j in jobs)
    L = ((L + 127) // 128) * 128
    seqs = np.empty((len(jobs), N, L), np.int32)
    lens = np.zeros((len(jobs), N), np.int32)
    firsts = np.zeros(len(jobs), np.int32)
    for i, j in enumerate(jobs):
        seqs[i], lens[i], firsts[i] = _pad_job(j, N, L)
    table = jnp.asarray(SimpleMeasure(K).pair_table(), jnp.uint16)
    xc, xn = _device_consensus_vmapped(
        jnp.asarray(seqs), jnp.asarray(lens), table, jnp.asarray(firsts),
        K, beam, t_max, 300, 8, K)
    LP = ((L + 2 * W + 127) // 128) * 128
    pseqs = np.full((len(jobs), N, LP), -1, np.int32)
    pseqs[:, :, PAD:PAD + L] = seqs
    pc, pn = pallas_consensus(jnp.asarray(pseqs), jnp.asarray(lens),
                              jnp.asarray(firsts), K, beam, t_max, 300, 8,
                              K, interpret=True)
    return (np.asarray(xc), np.asarray(xn),
            np.asarray(pc), np.asarray(pn))


def check_identical(jobs, t_max):
    xc, xn, pc, pn = run_pair(jobs, t_max)
    for i in range(len(jobs)):
        assert xn[i] == pn[i], f"job {i}: length {xn[i]} vs {pn[i]}"
        assert np.array_equal(xc[i][:xn[i]], pc[i][:pn[i]]), \
            f"job {i}: chains diverge"


def make_jobs(rng, n_jobs, core_len, n_members=4, **err):
    jobs = []
    for _ in range(n_jobs):
        core = rng.integers(0, 4, core_len).astype(np.uint8)
        members = [kmers_of(mutate(rng, core, **err))
                   for _ in range(n_members)]
        jobs.append([m for m in members if len(m) > K])
    return jobs


def test_bit_parity_substitutions():
    rng = np.random.default_rng(10)
    check_identical(make_jobs(rng, JB, 60, sub=0.06, ins=0.0, dele=0.0), 96)


def test_bit_parity_indels():
    rng = np.random.default_rng(11)
    check_identical(make_jobs(rng, JB, 60, sub=0.03, ins=0.03, dele=0.03),
                    96)


def test_bit_parity_deletion_drift():
    """Systematic deletions force drift recentring and window re-basing."""
    rng = np.random.default_rng(12)
    check_identical(make_jobs(rng, JB, 70, sub=0.02, ins=0.0, dele=0.08),
                    128)


def test_bit_parity_long_cores_nonzero_window_base():
    """Cores ~600 bases: L pads to 640, lp = 768 > WINW, so the moving
    128-aligned window base goes NONZERO and the SW=512 roll cascade
    (bit 256) engages — the path every short-core case leaves untested
    (ADVICE r04).  Exact parity against the XLA engine still required."""
    rng = np.random.default_rng(13)
    check_identical(make_jobs(rng, JB, 600, n_members=3,
                              sub=0.04, ins=0.01, dele=0.01), 832)


def test_bulk_path_routes_through_pallas(monkeypatch):
    """consensus_kmers_bulk with DOWNPORE_PALLAS_BEAM=interpret must give
    the same consensus arrays as the XLA engine path."""
    from downpore_tpu.ops.dtw import consensus_kmers_bulk
    rng = np.random.default_rng(14)
    jobs = make_jobs(rng, 5, 50, n_members=5, sub=0.05, ins=0.01,
                     dele=0.01)
    jobs.append([])  # empty job -> empty result
    table = SimpleMeasure(K).pair_table()
    monkeypatch.setenv("DOWNPORE_PALLAS_BEAM", "0")
    ref = consensus_kmers_bulk(jobs, table, K, simple_k=K)
    monkeypatch.setenv("DOWNPORE_PALLAS_BEAM", "interpret")
    out = consensus_kmers_bulk(jobs, table, K, simple_k=K)
    assert len(ref) == len(out)
    for a, b in zip(ref, out):
        assert np.array_equal(a, b)


def test_bit_parity_mixed_member_counts():
    """Jobs with differing member counts inside one padded block, plus a
    padded (empty) job slot."""
    rng = np.random.default_rng(13)
    jobs = make_jobs(rng, JB - 1, 50, sub=0.05, ins=0.01, dele=0.01)
    jobs[2] = jobs[2][:2]
    jobs[4] = jobs[4][:6] + jobs[4][:2]
    jobs.append([np.zeros(0, np.int32)])  # padded slot: no live members
    N = 8
    L = 128
    seqs = np.empty((JB, N, L), np.int32)
    lens = np.zeros((JB, N), np.int32)
    firsts = np.zeros(JB, np.int32)
    for i, j in enumerate(jobs[:-1]):
        seqs[i], lens[i], firsts[i] = _pad_job(j, N, L)
    seqs[-1] = -1
    lens[-1] = 0
    table = jnp.asarray(SimpleMeasure(K).pair_table(), jnp.uint16)
    xc, xn = _device_consensus_vmapped(
        jnp.asarray(seqs), jnp.asarray(lens), table, jnp.asarray(firsts),
        K, 8, 96, 300, 8, K)
    LP = ((L + 2 * W + 127) // 128) * 128
    pseqs = np.full((JB, N, LP), -1, np.int32)
    pseqs[:, :, PAD:PAD + L] = seqs
    pc, pn = pallas_consensus(jnp.asarray(pseqs), jnp.asarray(lens),
                              jnp.asarray(firsts), K, 8, 96, 300, 8, K,
                              interpret=True)
    xc, xn, pc, pn = map(np.asarray, (xc, xn, pc, pn))
    for i in range(JB - 1):  # padded slot excluded: XLA runs it with a
        # live-looking band while the kernel finishes it instantly
        assert xn[i] == pn[i]
        assert np.array_equal(xc[i][:xn[i]], pc[i][:pn[i]])
