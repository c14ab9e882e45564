"""Chain DP tests: device DP vs numpy oracle vs the reference-semantics
greedy walk."""
import numpy as np
import pytest

from downpore_tpu.ops.chain import (chain_batch, chain_pair_np,
                                    run_chain_batch, good_chain_stats)
from downpore_tpu.seeds import SeedSequence
from downpore_tpu.seeds.seed_sequence import dynamic_match

RNG = np.random.default_rng(17)


def random_pair(rng, n_seeds=20, alphabet=12, mutate=0.3):
    """A query and a noisy copy of it with compatible gaps."""
    seeds = rng.integers(0, alphabet, n_seeds).astype(np.int32)
    gaps = rng.integers(0, 30, n_seeds + 1).astype(np.int32)
    q = SeedSequence(gaps, seeds)
    # target: same seeds, gaps jittered by <20%, some seeds replaced
    tseeds = seeds.copy()
    repl = rng.random(n_seeds) < mutate
    tseeds[repl] = rng.integers(alphabet, alphabet * 2, repl.sum())
    tgaps = gaps.copy()
    tgaps[1:-1] = (tgaps[1:-1] * rng.uniform(0.9, 1.1, n_seeds - 1)).astype(np.int32)
    t = SeedSequence(tgaps, tseeds)
    return q, t


def pad_to(v, n, fill):
    out = np.full(n, fill, np.int32)
    out[: len(v)] = v[:n] if len(v) > n else v
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_device_dp_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 6
    q, t = random_pair(rng)
    qp = q.seed_positions(k).astype(np.int32)
    tp = t.seed_positions(k).astype(np.int32)
    out = run_chain_batch([q.seeds], [qp], [t.seeds], [tp], k,
                          nq=32, nt=32, max_anchors=64)
    anchors, f, cov_q, cov_t = chain_pair_np(q.seeds, qp, t.seeds, tp, k)
    n = len(anchors)
    assert np.array_equal(out["f"][0][:n], np.array(f))
    # through-coverage at the best anchor must match fwd cov at chain end
    best = int(np.argmax(out["f"][0][:n]))
    assert out["cov_q"][0][best] >= cov_q[best]


@pytest.mark.parametrize("seed", range(8))
def test_device_dp_at_least_as_long_as_greedy(seed):
    rng = np.random.default_rng(100 + seed)
    k = 6
    q, t = random_pair(rng, n_seeds=15)
    ms = dynamic_match(q, t, 3, k)
    greedy_best = max((len(m) for m in ms), default=0)
    qp = q.seed_positions(k).astype(np.int32)
    tp = t.seed_positions(k).astype(np.int32)
    out = run_chain_batch([q.seeds], [qp], [t.seeds], [tp], k,
                          nq=32, nt=32, max_anchors=128)
    dp_best = int(out["through"][0].max())
    assert dp_best >= greedy_best


def test_identical_sequences_full_chain():
    k = 6
    seeds = np.arange(10, dtype=np.int32)
    gaps = np.full(11, 5, dtype=np.int32)
    s = SeedSequence(gaps, seeds)
    pos = s.seed_positions(k).astype(np.int32)
    out = run_chain_batch([seeds], [pos], [seeds], [pos], k,
                          nq=16, nt=16, max_anchors=32)
    assert int(out["through"][0].max()) == 10
    best, thr, good = good_chain_stats(out, 0, 3)
    assert best == 10
    # the full chain covers 10*k bases (no overlaps)
    assert int(out["cov_q"][0][good].max()) == 10 * k


def test_negative_gaps_allowed():
    """Overlapping seeds (negative gaps) chain when both sides overlap."""
    k = 6
    seeds = np.array([1, 2, 3], dtype=np.int32)
    gaps = np.array([0, -3, -3, 0], dtype=np.int32)  # seeds overlap by 3
    s = SeedSequence(gaps, seeds)
    pos = s.seed_positions(k).astype(np.int32)
    out = run_chain_batch([seeds], [pos], [seeds], [pos], k,
                          nq=8, nt=8, max_anchors=16)
    assert int(out["through"][0].max()) == 3
    # coverage subtracts the overlaps: 3*k - 2*3
    best = np.argmax(out["through"][0])
    assert int(out["cov_q"][0][best]) == 3 * k - 6


def test_incompatible_gap_rejected():
    k = 6
    seeds = np.array([1, 2], dtype=np.int32)
    q = SeedSequence(np.array([0, 10, 0], np.int32), seeds)
    t = SeedSequence(np.array([0, 500, 0], np.int32), seeds)
    out = run_chain_batch([seeds], [q.seed_positions(k).astype(np.int32)],
                          [seeds], [t.seed_positions(k).astype(np.int32)],
                          k, nq=8, nt=8, max_anchors=16)
    assert int(out["through"][0].max()) == 1  # no 2-chain possible


def test_empty_pair():
    out = run_chain_batch([np.empty(0, np.int32)], [np.empty(0, np.int32)],
                          [np.empty(0, np.int32)], [np.empty(0, np.int32)],
                          6, nq=8, nt=8, max_anchors=16)
    assert int(out["through"][0].max()) == 0


def test_extent_propagation():
    """start/end positions of the best chain are the chain's first/last
    anchor positions."""
    k = 6
    seeds = np.arange(5, dtype=np.int32)
    gaps = np.full(6, 10, dtype=np.int32)
    s = SeedSequence(gaps, seeds)
    pos = s.seed_positions(k).astype(np.int32)
    tpos = (pos + 100).astype(np.int32)  # target shifted by 100
    out = run_chain_batch([seeds], [pos], [seeds], [tpos], k,
                          nq=8, nt=8, max_anchors=16)
    a = int(np.argmax(out["through"][0]))
    assert out["start_qp"][0][a] == pos[0]
    assert out["start_tp"][0][a] == tpos[0]
    assert out["end_qp"][0][a] == pos[-1]
    assert out["end_tp"][0][a] == tpos[-1]


def test_compact_indices_matches_nonzero():
    """compact_indices must reproduce jnp.nonzero(size=, fill_value=len)
    exactly: ascending set-bit indices, fill past the count, and the
    true count — across empty, sparse, dense and overflowing masks."""
    import jax.numpy as jnp
    import numpy as np
    from downpore_tpu.ops.chain import compact_indices

    rng = np.random.default_rng(7)
    for n, size, dens in [(1024, 64, 0.0), (1024, 64, 0.01),
                          (4096, 256, 0.5), (333, 512, 0.2),
                          (4096, 16, 0.9)]:
        mask = rng.random(n) < dens
        sel, cnt = compact_indices(jnp.asarray(mask), size)
        ref = jnp.nonzero(jnp.asarray(mask), size=size, fill_value=n)[0]
        assert np.array_equal(np.asarray(sel), np.asarray(ref)), (n, size, dens)
        assert int(cnt) == int(mask.sum())
