"""Device-resident window matching engine for the trimmer.

The host uploads each batch of sequence windows ONCE as 2-bit packed
base codes (4 bases/byte; k-mers are computed on device); everything
else stays on device:

* gate: per-(window, adapter) shared-seed counts via a gather over a
  device-resident kmer->adapter membership table,
* chain: the anchor DP reads window rows straight from the resident k-mer
  array (translated kmer->seed on device) against device-resident adapter
  seed tables — each chain call ships only pair indices (~100 KB).

This removes both the dense one-hot building and the per-pair reduced
seed lists from the host path, which dominated when the host<->device
link is slow (the tunnelled-TPU case) and were pure overhead otherwise.

Gate note: counts are per *position* (duplicate window k-mers count
multiply), a slightly more permissive gate than the reference's
distinct-set intersection (ref: trim/trim.go:364) — never less sensitive;
the chain + identity thresholds downstream are unchanged.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .chain import chain_batch_summary, _bucket, make_anchors_topk, \
    compact_indices


def _unpack_kmers(packed, k: int, W: int):
    """2-bit packed window codes -> rolling k-mers, on device.

    ``packed`` is ``[n, (W + k - 1) / 4] uint8`` (4 bases/byte, first base
    in the high bits — the ship-side twin of the reference's packBytes,
    ref: sequence/asm_amd64.s:33).  Unpacking on device cuts the
    host->device transfer 8x vs int16 k-mer arrays, which dominated batch
    wall-clock over a slow host link."""
    n = packed.shape[0]
    shifts = jnp.array([6, 4, 2, 0], jnp.uint8)
    codes = (packed[:, :, None] >> shifts[None, None, :]) & 3
    codes = codes.reshape(n, packed.shape[1] * 4).astype(jnp.int32)
    acc = jnp.zeros((n, W), jnp.int32)
    for j in range(k):
        acc = acc | (codes[:, j : j + W] << (2 * (k - 1 - j)))
    return acc


@jax.jit
def _gate_counts(kmers, lens, km_table):
    """``[n, W]`` k-mers (+ per-row lengths) -> ``[n, A]`` hit counts."""
    km = jnp.clip(kmers.astype(jnp.int32), 0)
    pos = jax.lax.broadcasted_iota(jnp.int32, km.shape, 1)
    valid = pos < lens[:, None]
    rows = jnp.take(km_table, km, axis=0)  # [n, W, A] int8
    rows = jnp.where(valid[:, :, None], rows, 0)
    # dtype= accumulates int32 straight from the int8 rows — an
    # .astype(int32) first would materialize a 4x-bytes copy of the
    # gathered block (W x A is ~32 KB per window)
    return jnp.sum(rows, axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "W", "max_anchors",
                                              "variant", "top_k"))
def _chain_from_windows(a_seeds, a_pos, a_len, packed_dev,
                        lens_dev, ei, ai, mm, k: int, W: int,
                        max_anchors: int,
                        variant: str = "extend", top_k: int = 4):
    """Chain DP whose target lists are the resident window k-mer rows.

    Adapter seed tables are stored in k-mer space (seed id -> k-mer is a
    bijection, seeds/seed_index.py:41-49), so window k-mers compare
    directly — no kmer->seed translation gather (a 4M-element gather cost
    ~77 ms/batch on TPU, the single hottest op in round-1 profiles)."""
    kmers_dev = _unpack_kmers(packed_dev, k, W)
    qs = a_seeds[ai].astype(jnp.int32)
    qp = a_pos[ai].astype(jnp.int32)
    alen = a_len[ai]
    km = kmers_dev[ei].astype(jnp.int32)          # [P, W]
    pos = jax.lax.broadcasted_iota(jnp.int32, km.shape, 1)
    valid = pos < lens_dev[ei][:, None]
    ts = jnp.where(valid, km, -1)
    return chain_batch_summary(qs, qp, ts, pos, mm, alen,
                               k=k, max_anchors=max_anchors,
                               variant=variant, top_k=top_k)


_BIGM = 1 << 20  # impossible min-match for gate-failing pairs


def _gate_topk_pairs(kmers, lens, km_table, gate_min, chain_min,
                     top_t: int):
    """Gate counts + per-window top-``top_t`` adapter selection, flattened
    to (window idx, adapter idx, min-match) pair vectors of length
    ``n * top_t`` (gate-failing pairs get the impossible min-match)."""
    counts = _gate_counts(kmers, lens, km_table)        # [n, A]
    cvals, cai = jax.lax.top_k(counts, top_t)           # [n, T]
    ok = cvals >= gate_min[cai]
    n = kmers.shape[0]
    ei = jnp.broadcast_to(jnp.arange(n)[:, None], (n, top_t)).reshape(-1)
    ai = cai.reshape(-1)
    mm = jnp.where(ok.reshape(-1), chain_min[ai], jnp.int32(_BIGM))
    return ei, ai, mm


def _pad_pairs(arrs, fills, chunk: int):
    """Pad 1-D pair vectors up to a multiple of ``chunk``."""
    P = arrs[0].shape[0]
    PC = ((P + chunk - 1) // chunk) * chunk
    if PC == P:
        return arrs
    return [jnp.concatenate([a, jnp.full(PC - P, f, a.dtype)])
            for a, f in zip(arrs, fills)]


def _anchors_chunked(kmers, lens, a_seeds, a_pos, ei, ai,
                     chunk: int = 4096):
    """Anchor enumeration for (window, adapter) pairs in fixed chunks —
    bounds the [chunk, NQ, W] equality tensor; the DP then runs on the
    full pair tile (fewer sequential scan steps than chunked DP)."""

    def build(args):
        ei_c, ai_c = args
        qs = a_seeds[ai_c].astype(jnp.int32)
        qp = a_pos[ai_c].astype(jnp.int32)
        km = kmers[ei_c].astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, km.shape, 1)
        valid = pos < lens[ei_c][:, None]
        ts = jnp.where(valid, km, -1)  # adapter tables are in k-mer space
        return make_anchors_topk(qs, qp, ts, pos, per_seed=2)

    C = ei.shape[0] // chunk
    anchors = jax.lax.map(build, (ei.reshape(C, chunk),
                                  ai.reshape(C, chunk)))
    return {key: v.reshape(ei.shape[0], *v.shape[2:])
            for key, v in anchors.items()}


@functools.partial(jax.jit, static_argnames=("k", "W", "max_anchors",
                                              "top_t", "top_k",
                                              "pair_budget"))
def _fused_match(packed, lens, km_table, gate_min, chain_min,
                 a_seeds, a_pos, a_len,
                 k: int, W: int, max_anchors: int, top_t: int = 4,
                 top_k: int = 4, pair_budget: int = 0):
    """Gate + adapter selection + chain + summary in ONE device call.

    Host<->device round trips cost ~1 s each over a tunnelled TPU, so the
    whole per-batch pipeline fuses: per window the top ``top_t`` adapters
    by gate count are selected on device (the reference checks every
    passing adapter; windows with more than top_t genuine adapters are
    vanishingly rare), failing pairs chain with an impossible min-match,
    and one packed [n, top_t, M+1] array comes back.

    With ``pair_budget`` > 0 the chain DP runs ONLY on gate-passing
    pairs: up to pair_budget pairs are compacted on device and scattered
    back afterwards (gate-failing pairs produce the same empty summary
    either way).  This cuts the DP work ~20x on interior-window batches
    where <5% of pairs pass.  The true passing-pair count is reported in
    the extra trailing row (``out[n, 0, 0]``); callers must re-run
    without a budget if it exceeds pair_budget.
    """
    from .chain import make_anchors_topk, dp_from_anchors, summarize_dp
    kmers = _unpack_kmers(packed, k, W)
    counts = _gate_counts(kmers, lens, km_table)        # [n, A]
    cvals, cai = jax.lax.top_k(counts, top_t)           # [n, T]
    ok = cvals >= gate_min[cai]
    n = kmers.shape[0]
    ei_all = jnp.broadcast_to(jnp.arange(n)[:, None],
                              (n, top_t)).reshape(-1)
    ai_all = cai.reshape(-1)
    BIGM = jnp.int32(1 << 20)
    mm_all = jnp.where(ok.reshape(-1), chain_min[ai_all], BIGM)

    # process pairs in fixed chunks inside this one dispatch: bounds the
    # [chunk, NQ, W] anchor intermediates instead of materializing them
    # for every pair at once
    P = n * top_t
    CHUNK = 4096
    PC = ((P + CHUNK - 1) // CHUNK) * CHUNK
    pad = lambda a, fill: jnp.concatenate(
        [a, jnp.full(PC - P, fill, a.dtype)]) if PC != P else a
    ei_all = pad(ei_all, 0)
    ai_all = pad(ai_all, 0)
    mm_all = pad(mm_all, BIGM)

    def build(args):
        """Anchor enumeration for one chunk — bounds the [chunk, NQ, W]
        equality tensor; the DP itself runs on the full pair tile (4x
        fewer sequential scan steps than chunked DP)."""
        ei, ai = args
        qs = a_seeds[ai].astype(jnp.int32)
        qp = a_pos[ai].astype(jnp.int32)
        km = kmers[ei].astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, km.shape, 1)
        valid = pos < lens[ei][:, None]
        ts = jnp.where(valid, km, -1)  # adapter tables are in k-mer space
        return make_anchors_topk(qs, qp, ts, pos, per_seed=2)

    def chain_all(ei, ai, mm):
        C = ei.shape[0] // CHUNK
        anchors = jax.lax.map(build, (ei.reshape(C, CHUNK),
                                      ai.reshape(C, CHUNK)))
        anchors = {key: v.reshape(ei.shape[0], *v.shape[2:])
                   for key, v in anchors.items()}
        out = dp_from_anchors(anchors, k, small=True)
        return summarize_dp(out, mm, a_len[ai], k, top_k)

    ok_flat = mm_all < BIGM
    n_ok = jnp.sum(ok_flat.astype(jnp.int32))
    if pair_budget and pair_budget < PC:
        # compact form: chain only the selected pairs and return their
        # rows directly — [B+1, M+2] int32 of (pair_idx, ai, summary...)
        # is ~8x smaller than the full [n, T, M+1] grid
        B = ((pair_budget + CHUNK - 1) // CHUNK) * CHUNK
        sel, _ = compact_indices(ok_flat, B)
        live = sel < PC
        cl = jnp.clip(sel, 0, PC - 1)
        ei_s = jnp.where(live, ei_all[cl], 0)
        ai_s = jnp.where(live, ai_all[cl], 0)
        mm_s = jnp.where(live, mm_all[cl], BIGM)
        packed_s = chain_all(ei_s, ai_s, mm_s)
        packed_s = jnp.clip(packed_s, -32768, 32767)  # match the full
        # path's int16 clamp so both forms report identical summaries
        out = jnp.concatenate(
            [jnp.where(live, sel, -1)[:, None], ai_s[:, None], packed_s],
            axis=1)
        extra = jnp.zeros((1, out.shape[1]), jnp.int32).at[0, 0].set(n_ok)
        return jnp.concatenate([out, extra], axis=0)
    packed = chain_all(ei_all, ai_all, mm_all)[:P]
    out = jnp.concatenate([ai_all[:P, None], packed], axis=1)
    # all genuine values fit int16 for <=32k-base windows; clamping the
    # empty-set sentinels halves the device->host fetch
    out = jnp.clip(out, -32768, 32767).astype(jnp.int16)
    return out.reshape(n, top_t, -1)


def _compact_pairs(ok_flat, ei_p, ai_p, mm_p, budget: int, chunk: int):
    """Select up to ``budget`` gate-passing pairs (rounded up to a chunk
    multiple).  Returns (sel, live, compacted ei/ai/mm); ``sel`` holds the
    original pair index of each slot (PC for dead slots)."""
    PC = ei_p.shape[0]
    B = ((budget + chunk - 1) // chunk) * chunk
    sel, _ = compact_indices(ok_flat, B)
    live = sel < PC
    cl = jnp.clip(sel, 0, PC - 1)
    return (sel, live, jnp.where(live, ei_p[cl], 0),
            jnp.where(live, ai_p[cl], 0),
            jnp.where(live, mm_p[cl], _BIGM))


def _scatter_scalars(s_c, sel, PC: int):
    """Scatter compacted summary scalars back to the full pair grid
    (dead slots land in the sacrificial trailing element).  Gate-failing
    pairs report the same empty summary either way, so downstream logic
    is unchanged."""
    return {key: jnp.zeros((PC + 1,) + v.shape[1:], v.dtype)
            .at[sel].set(v)[:PC] for key, v in s_c.items()}


@functools.partial(jax.jit, static_argnames=("k", "W", "max_anchors",
                                              "top_t", "pair_budget"))
def _fused_edge_verdict(packed, lens, km_table, gate_min, chain_min,
                        a_seeds, a_pos, a_len, is_barcode,
                        k: int, W: int, max_anchors: int, top_t: int = 8,
                        pair_budget: int = 0):
    """Edge pass fully on device: gate + chain + the per-edge adapter walk
    of the reference's findMatches (ref: trim/trim.go:354-428).

    Returns (verdict [n, 4] int32 of (found, best_match, earliest,
    latest), per-adapter chain-count totals [A] int32, gate-passing pair
    count).  The verdict rows are the ONLY per-window data fetched —
    bytes per read instead of the per-(window, adapter) summary grids,
    which dominated wall-clock when the host link is slow.

    With ``pair_budget`` > 0 the anchor build + chain DP run only on
    gate-passing pairs (compact + scatter-back, as the middle pass does);
    callers must re-run unbudgeted if the returned pair count exceeds the
    budget."""
    from .chain import dp_from_anchors, summarize_scalars
    kmers = _unpack_kmers(packed, k, W)
    n, top_t_n = kmers.shape[0], top_t
    ei, ai, mm = _gate_topk_pairs(kmers, lens, km_table, gate_min,
                                  chain_min, top_t)
    CHUNK = 4096
    ei_p, ai_p, mm_p = _pad_pairs([ei, ai, mm], [0, 0, _BIGM], CHUNK)
    PC = ei_p.shape[0]
    ok_flat = mm_p < _BIGM
    n_ok = jnp.sum(ok_flat.astype(jnp.int32))
    if pair_budget and pair_budget < PC:
        sel, live, ei_s, ai_s, mm_s = _compact_pairs(
            ok_flat, ei_p, ai_p, mm_p, pair_budget, CHUNK)
        anchors = _anchors_chunked(kmers, lens, a_seeds, a_pos, ei_s, ai_s)
        out = dp_from_anchors(anchors, k, small=True)
        s = _scatter_scalars(
            summarize_scalars(out, mm_s, a_len[ai_s], k), sel, PC)
    else:
        anchors = _anchors_chunked(kmers, lens, a_seeds, a_pos, ei_p, ai_p)
        out = dp_from_anchors(anchors, k, small=True)
        s = summarize_scalars(out, mm_p, a_len[ai_p], k)

    P = n * top_t
    cut = lambda a: a[:P].reshape(n, top_t_n)
    has = cut(s["n_chains"] > 0)
    ai_t = cut(ai_p)
    ident = cut((s["ident_cov_q"] * 100) // jnp.maximum(a_len[ai_p], 1))
    e_t = cut(s["earliest"])
    l_t = cut(s["latest"])
    n_chains_t = cut(s["n_chains"])

    # walk hits in adapter order, as findMatches does (the host-side twin
    # iterated sorted(rows)): barcode precedence + the +-5% ambiguity rule
    order = jnp.argsort(jnp.where(has, ai_t, jnp.int32(1 << 30)), axis=1)
    g = lambda a: jnp.take_along_axis(a, order, axis=1)
    has, ai_t, ident, e_t, l_t = g(has), g(ai_t), g(ident), g(e_t), g(l_t)

    elen = lens + (k - 1)            # bases in each window
    is_bc = is_barcode[ai_t] > 0

    def step(t, st):
        found, barcoded, ambiguous, best_i, best_a, early, late = st
        hit = has[:, t]
        a = ai_t[:, t]
        idn = ident[:, t]
        bc = is_bc[:, t]
        case1 = hit & ~barcoded & bc
        case2 = hit & barcoded & bc
        case3 = hit & ~barcoded & ~bc & (idn > best_i)
        delta = idn - best_i
        ambiguous = jnp.where(case2, (delta > -5) & (delta < 5), ambiguous)
        upd = case1 | case3 | (case2 & (idn > best_i))
        best_i = jnp.where(upd, idn, best_i)
        best_a = jnp.where(upd, a, best_a)
        barcoded = barcoded | case1
        early = jnp.where(hit, jnp.minimum(early, jnp.maximum(0, e_t[:, t])),
                          early)
        late = jnp.where(hit, jnp.maximum(late, jnp.minimum(elen, l_t[:, t])),
                         late)
        found = found | hit
        return found, barcoded, ambiguous, best_i, best_a, early, late

    zeros = jnp.zeros(n, jnp.int32)
    false = jnp.zeros(n, bool)
    st = (false, false, false, zeros, zeros, elen.astype(jnp.int32), zeros)
    found, _, ambiguous, _, best_a, early, late = jax.lax.fori_loop(
        0, top_t, step, st)
    # ambiguous barcodes: trim but report no adapter (trim.go:423-426)
    found = found & ~ambiguous
    best_a = jnp.where(ambiguous, 0, best_a)
    verdict = jnp.stack([found.astype(jnp.int32), best_a, early, late],
                        axis=1)
    counts_a = jnp.zeros(km_table.shape[1], jnp.int32).at[ai_p].add(
        jnp.where(s["n_chains"] > 0, s["n_chains"], 0))
    return verdict, counts_a, n_ok


@functools.partial(jax.jit, static_argnames=("k", "W", "max_anchors",
                                              "top_t"))
def _fused_edge_pair(packed2, lens2, tables2, gm2, cm2, a_seeds2, a_pos2,
                     a_len2, is_bc2, k: int, W: int, max_anchors: int,
                     top_t: int = 8):
    """Front + back edge verdicts in ONE dispatch: the two problems are
    stacked on a leading axis of 2 and vmapped through
    ``_fused_edge_verdict``.  Each link round trip costs ~0.1-0.3 s over
    a tunnelled TPU, so halving the dispatch/fetch count per read batch
    is worth more than the kernels themselves."""
    f = lambda p, l, t, g, c, s, pp, al, ib: _fused_edge_verdict(
        p, l, t, g, c, s, pp, al, ib, k=k, W=W,
        max_anchors=max_anchors, top_t=top_t, pair_budget=0)
    return jax.vmap(f)(packed2, lens2, tables2, gm2, cm2, a_seeds2,
                       a_pos2, a_len2, is_bc2)


@functools.partial(jax.jit, static_argnames=("k", "W", "max_anchors",
                                              "top_t", "pair_budget"))
def _fused_enable(packed, lens, km_table, gate_min, chain_min,
                  a_seeds, a_pos, a_len,
                  k: int, W: int, max_anchors: int, top_t: int = 8,
                  pair_budget: int = 0):
    """DetermineAdapters on device: per-adapter max covered query bases
    over the whole batch (ref isNewFullMatch, trim/trim.go:326-352).
    Fetches one [A] vector (+ the gate-passing pair count) per batch.
    ``pair_budget`` compacts the DP to gate-passing pairs; callers re-run
    unbudgeted on overflow."""
    from .chain import dp_from_anchors, summarize_scalars
    kmers = _unpack_kmers(packed, k, W)
    ei, ai, mm = _gate_topk_pairs(kmers, lens, km_table, gate_min,
                                  chain_min, top_t)
    CHUNK = 4096
    ei_p, ai_p, mm_p = _pad_pairs([ei, ai, mm], [0, 0, _BIGM], CHUNK)
    PC = ei_p.shape[0]
    ok_flat = mm_p < _BIGM
    n_ok = jnp.sum(ok_flat.astype(jnp.int32))
    if pair_budget and pair_budget < PC:
        sel, live, ei_s, ai_s, mm_s = _compact_pairs(
            ok_flat, ei_p, ai_p, mm_p, pair_budget, CHUNK)
        anchors = _anchors_chunked(kmers, lens, a_seeds, a_pos, ei_s, ai_s)
        out = dp_from_anchors(anchors, k, small=True)
        s = summarize_scalars(out, mm_s, a_len[ai_s], k)
        cov = jnp.where(s["n_chains"] > 0, s["ident_cov_q"], 0)
        covs = jnp.zeros(km_table.shape[1], jnp.int32).at[ai_s].max(
            jnp.where(live, cov, 0))
    else:
        anchors = _anchors_chunked(kmers, lens, a_seeds, a_pos, ei_p, ai_p)
        out = dp_from_anchors(anchors, k, small=True)
        s = summarize_scalars(out, mm_p, a_len[ai_p], k)
        cov = jnp.where(s["n_chains"] > 0, s["ident_cov_q"], 0)
        covs = jnp.zeros(km_table.shape[1], jnp.int32).at[ai_p].max(cov)
    return covs, n_ok


@functools.partial(jax.jit, static_argnames=("k", "W", "max_anchors",
                                              "top_t", "top_k",
                                              "pair_budget", "det_budget"))
def _fused_window_verdict(packed, lens, km_table, gate_min, chain_min,
                          a_seeds, a_pos, a_len, mid_threshold,
                          k: int, W: int, max_anchors: int, top_t: int = 8,
                          top_k: int = 4, pair_budget: int = 0,
                          det_budget: int = 4096):
    """Middle pass fully on device: gate + chain + the identity-threshold
    detection filter (ref findSplit, trim/trim.go:515-591).

    With ``pair_budget`` > 0 the chain DP runs only on the first
    ``pair_budget`` gate-passing pairs (the middle gate demands
    chain_min distinct position hits, which random interior windows
    essentially never reach, so the grid is ~90% dead); the trailing
    row's first field carries the true passing count so collect can
    re-run unbudgeted on overflow.  The unbudgeted form streams the
    full (window, top-``top_t`` adapter) grid through ``lax.map``
    segments of anchors+DP+summary, bounding peak memory to one segment
    (a monolithic [n*top_t, NA] DP allocated ~3.5 GB and thrashed HBM);
    this is also the right shape when most pairs DO gate-pass (the ~100
    barcode variants share flanking k-mers, so a window matching one
    flank gate-passes the whole family).

    Returns ``[det_budget + 1, 4]`` int32: rows of (window idx, adapter
    idx, start offset in window, identity) for every top chain with
    identity >= ``mid_threshold``; the trailing row holds
    (passing pairs, detection count, 0, 0) so callers can detect budget
    overflow (rare: interior windows almost never contain adapters)."""
    from .chain import dp_from_anchors, summarize_scalars
    kmers = _unpack_kmers(packed, k, W)
    n = kmers.shape[0]
    ei, ai, mm = _gate_topk_pairs(kmers, lens, km_table, gate_min,
                                  chain_min, top_t)
    if pair_budget:
        ok_flat = mm < _BIGM
        P0 = ei.shape[0]
        sel, n_ok = compact_indices(ok_flat, pair_budget)
        live = sel < P0
        selc = jnp.clip(sel, 0, P0 - 1)
        ei = jnp.where(live, ei[selc], 0)
        ai = jnp.where(live, ai[selc], 0)
        mm = jnp.where(live, mm[selc], jnp.int32(_BIGM))
    else:
        n_ok = jnp.int32(0)
    CHUNK = 4096
    ei_p, ai_p, mm_p = _pad_pairs([ei, ai, mm], [0, 0, _BIGM], CHUNK)
    SEG = min(32768, ei_p.shape[0])
    ei_p, ai_p, mm_p = _pad_pairs([ei_p, ai_p, mm_p], [0, 0, _BIGM], SEG)
    PC = ei_p.shape[0]

    def seg(args):
        """Anchors + DP + detection summary for one pair segment."""
        ei_s, ai_s, mm_s = args
        anchors = _anchors_chunked(kmers, lens, a_seeds, a_pos,
                                   ei_s, ai_s, chunk=CHUNK)
        out = dp_from_anchors(anchors, k, small=True)
        alen_s = a_len[ai_s]
        s = summarize_scalars(out, mm_s, alen_s, k)
        # top chains per pair -> detection candidates
        key = jnp.where(s["is_start"], out["cov_q"], -1)
        _, idx = jax.lax.top_k(key, top_k)
        oh = (jnp.arange(key.shape[1])[None, None, :]
              == idx[:, :, None])                        # [S, top_k, NA]
        take = lambda arr: jnp.sum(jnp.where(oh, arr[:, None, :], 0),
                                   axis=2)
        tvalid = take(key) >= 0
        identity = (take(out["cov_q"]) * 100) \
            // jnp.maximum(alen_s[:, None], 1)
        det = tvalid & (identity >= mid_threshold)
        start = take(out["start_tp"]) - take(out["start_qp"])
        return det, start, identity

    NS = PC // SEG
    det, start, identity = jax.lax.map(
        seg, (ei_p.reshape(NS, SEG), ai_p.reshape(NS, SEG),
              mm_p.reshape(NS, SEG)))
    det = det.reshape(PC, top_k)
    start = start.reshape(PC, top_k)
    identity = identity.reshape(PC, top_k)
    n_det = jnp.sum(det.astype(jnp.int32))
    flat = det.reshape(-1)
    didx, _ = compact_indices(flat, det_budget)
    dlive = didx < flat.shape[0]
    pi = jnp.clip(didx // top_k, 0, PC - 1)
    ci = didx % top_k
    pick = lambda arr2d: arr2d[pi, ci]
    rows = jnp.stack([
        jnp.where(dlive, ei_p[pi], -1),
        jnp.where(dlive, ai_p[pi], 0),
        jnp.where(dlive, pick(start), 0),
        jnp.where(dlive, pick(identity), 0)], axis=1)
    tail = jnp.zeros((1, 4), jnp.int32).at[0, 0].set(n_ok).at[0, 1].set(
        n_det)
    return jnp.concatenate([rows, tail], axis=0)


class WindowChainEngine:
    """Per-Trimmer device state: adapter seed tables, kmer->seed map and
    kmer->adapter membership tables."""

    def __init__(self, front_adapters, back_adapters, front_sets, back_sets,
                 kmer_map: np.ndarray, seed_map: List[int], k: int,
                 nq: int = 64, mesh=None):
        self.k = k
        self.nq = nq
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._repl = NamedSharding(mesh, P())
            self._data = NamedSharding(mesh, P("data"))
            self._put = lambda a: jax.device_put(a, self._repl)
            self._put_data = lambda a: jax.device_put(a, self._data)
        else:
            self._put = jax.device_put
            self._put_data = jax.device_put
        size = kmer_map.shape[0]
        sm = np.asarray(seed_map, dtype=np.int64)

        def tables(adapters):
            """Adapter seed tables, stored in k-mer space: seed id ->
            k-mer is a bijection (seeds/seed_index.py:41-49), and window
            rows are already k-mers — comparing in k-mer space removes
            the per-position kmer->seed translation gather (was ~77 ms
            per 16k-window batch on TPU, the hottest op in the trim
            pipeline).  Rows are padded to the same 128-multiple as the
            membership table so top-k adapter indices from the gate can
            never index out of bounds (and front/back tables stack)."""
            A = len(adapters)
            AP = 128 * ((max(1, A) + 127) // 128)
            seeds = np.full((AP, nq), -1, np.int32)
            pos = np.zeros((AP, nq), np.int16)
            alen = np.zeros(AP, np.int32)
            for i, ad in enumerate(adapters):
                m = min(ad.num_seeds, nq)
                seeds[i, :m] = sm[np.asarray(ad.seeds[:m], dtype=np.int64)]
                pos[i, :m] = ad.seed_positions(k)[:m]
                alen[i] = ad.length
            return (seeds, pos, alen)

        def km_table(adapter_sets):
            AP = 128 * ((max(1, len(adapter_sets)) + 127) // 128)
            t = np.zeros((size, AP), dtype=np.int8)
            for i, st in enumerate(adapter_sets):
                kms = [seed_map[int(sid)] for sid in st]
                t[kms, i] = 1
            return t

        def bc_table(adapters, AP):
            t = np.zeros(AP, np.int32)
            for i, ad in enumerate(adapters):
                if (ad.get_name() or "").startswith("Barcode"):
                    t[i] = 1
            return t

        fkm = km_table(front_sets)
        bkm = km_table(back_sets)
        ft = tables(front_adapters)
        bt = tables(back_adapters)
        fbc = bc_table(front_adapters, fkm.shape[1])
        bbc = bc_table(back_adapters, bkm.shape[1])
        # the stacked front+back tables for the one-dispatch edge verdict
        # are built HERE from the host copies: building them lazily from
        # the resident device arrays fetched every table back over the
        # link (~0.2 s per fresh Trimmer)
        if ft[0].shape == bt[0].shape and fkm.shape == bkm.shape:
            pair_host = ((fkm, bkm), (ft[0], bt[0]), (ft[1], bt[1]),
                         (ft[2], bt[2]), (fbc, bbc))
            pair_host = tuple(np.stack(x) for x in pair_host)
        else:
            pair_host = None
        # one batched device_put for all resident tables: each separate
        # transfer pays a full link round trip on a tunnelled TPU
        if pair_host is None:
            (self.front, self.back, self._front_km, self._back_km,
             self._front_bc, self._back_bc) = self._put(
                (ft, bt, fkm, bkm, fbc, bbc))
            self._pair_cache = False
        else:
            (self.front, self.back, self._front_km, self._back_km,
             self._front_bc, self._back_bc, self._pair_cache) = self._put(
                (ft, bt, fkm, bkm, fbc, bbc, pair_host))

    # -- per batch ------------------------------------------------------
    N_SLOTS = 8  # staging sets rotated so several uploads can be in
    # flight (device_put transfers may still be reading the host buffer)

    def _buffers(self, nb: int, W: int):
        """Reused host staging buffers — fresh multi-MB allocations fault
        pages at pathological cost in sandboxed environments."""
        slot = getattr(self, "_slot", 0)
        self._slot = (slot + 1) % self.N_SLOTS
        key = (nb, W, slot)
        buf = getattr(self, "_buf_cache", None)
        if buf is None:
            buf = self._buf_cache = {}
        if key not in buf:
            k = self.k
            CL = ((W + k - 1 + 3) // 4) * 4
            buf[key] = (np.zeros((nb, CL), dtype=np.uint8),
                        np.zeros(nb, dtype=np.int32),
                        np.zeros((nb, CL // 4), dtype=np.uint8))
        return buf[key]

    def upload(self, windows, W: int):
        """Window batch -> resident device arrays.

        Ships 2-bit packed base codes (4 bases/byte — an 8x smaller
        transfer than int16 k-mer arrays, which dominated batch
        wall-clock over a slow host link); the kernels unpack and compute
        rolling k-mers on device (``_unpack_kmers``)."""
        n = len(windows)
        nb = _bucket(max(1, n))
        if self.mesh is not None:
            # batch dim must divide across the data axis (e.g. 6 devices
            # with a pow2 bucket) — round up to a multiple of it
            D = self.mesh.shape["data"]
            nb = ((nb + D - 1) // D) * D
        k = self.k
        codes, lens, packed = self._buffers(nb, W)
        codes[:] = 0
        lens[:] = 0
        for i, w in enumerate(windows):
            m = min(len(w), W + k - 1)
            codes[i, :m] = w.codes[:m]
            lens[i] = max(0, m - k + 1)
        c4 = codes.reshape(nb, -1, 4)
        np.copyto(packed, c4[:, :, 3], casting="unsafe")
        np.bitwise_or(packed, c4[:, :, 0] << 6, out=packed)
        np.bitwise_or(packed, c4[:, :, 1] << 4, out=packed)
        np.bitwise_or(packed, c4[:, :, 2] << 2, out=packed)
        return self._put_data(packed), self._put_data(lens), n

    def gate(self, packed_dev, lens_dev, front: bool, n: int,
             W: int) -> np.ndarray:
        table = self._front_km if front else self._back_km
        counts = _gate_counts(_unpack_kmers(packed_dev, self.k, W),
                              lens_dev, table)
        return np.asarray(counts)[:n]

    def match_dispatch(self, windows, front: bool, gate_min: np.ndarray,
                       chain_min: np.ndarray, W: int, top_t: int = 8,
                       max_anchors: int = 128, batch: int = 16384,
                       pair_budget: int = 0):
        """Upload + enqueue the fused gate+chain for a window list and
        return futures WITHOUT fetching — lets callers overlap several
        dispatches (front/back edges, successive batches) so device
        compute and the ~1 s/round-trip tunnel latency pipeline.

        ``pair_budget`` > 0 compacts the chain DP to at most that many
        gate-passing pairs per sub-batch (see ``_fused_match``); if a
        sub-batch overflows the budget, collect transparently re-runs it
        unbudgeted."""
        table = self._front_km if front else self._back_km
        a_seeds, a_pos, a_len = self.front if front else self.back
        A = min(a_len.shape[0], len(gate_min))
        if A == 0:  # no adapters enabled (e.g. determine_adapters kept
            # none): every window trivially has no matches
            return [(len(windows), None, 0, None)]
        gm = np.full(table.shape[1], 1 << 20, np.int32)
        gm[:A] = gate_min[:A]
        cm = np.ones(table.shape[1], np.int32)
        cm[:A] = chain_min[:A]
        futures = []
        for lo in range(0, len(windows), batch):
            sub = windows[lo : lo + batch]
            km_dev, lens_dev, n = self.upload(sub, W)
            call = lambda budget, km=km_dev, ln=lens_dev: _fused_match(
                km, ln, table, gm, cm, a_seeds, a_pos, a_len,
                k=self.k, W=W, max_anchors=max_anchors,
                top_t=top_t, pair_budget=budget)
            futures.append((n, call(pair_budget), pair_budget, call,
                            top_t))
        return futures

    def match_collect(self, futures):
        """Fetch dispatched futures and unpack per-window rows."""
        from .chain import unpack_summary
        results = []
        for n, fut, budget, call, top_t in futures:
            if fut is None:
                results.extend([[] for _ in range(n)])
                continue
            arr = np.asarray(fut)
            # a budget >= the padded pair count falls through to the full
            # grid form inside the kernel (ndim 3); compact form is 2-D
            if budget and arr.ndim == 2 and int(arr[-1, 0]) <= budget:
                # compact form: rows only for the selected pairs
                arr = arr[:-1]
                sel = arr[:, 0]
                live = sel >= 0
                flat = unpack_summary(arr[:, 2:])
                rows = [[] for _ in range(n)]
                for b in np.flatnonzero(live):
                    ei = int(sel[b]) // top_t
                    if ei < n and flat["n_chains"][b] > 0:
                        rows[ei].append((int(arr[b, 1]),
                                         {key: v[b]
                                          for key, v in flat.items()}))
                results.extend(rows)
                continue
            if budget and arr.ndim == 2:
                # budget overflow: rerun this sub-batch unbudgeted (the
                # resident kmers are still on device)
                arr = np.asarray(call(0))
            arr = arr[:n]                   # [n, T, M+1]
            T = arr.shape[1]
            flat = unpack_summary(arr[:, :, 1:].reshape(n * T, -1))
            for i in range(n):
                row = []
                for t in range(T):
                    j = i * T + t
                    if flat["n_chains"][j] > 0:
                        row.append((int(arr[i, t, 0]),
                                    {key: v[j] for key, v in flat.items()}))
                results.append(row)
        return results

    def _pad_mins(self, table, gate_min, chain_min):
        A = min(table.shape[1], len(gate_min))
        gm = np.full(table.shape[1], 1 << 20, np.int32)
        gm[:A] = gate_min[:A]
        cm = np.ones(table.shape[1], np.int32)
        cm[:A] = chain_min[:A]
        return gm, cm, A

    # -- fully on-device verdicts (fetch ~bytes per read) ---------------
    def edge_verdict_dispatch(self, windows, front: bool,
                              gate_min: np.ndarray, chain_min: np.ndarray,
                              W: int, top_t: int = 8,
                              max_anchors: int = 128, batch: int = 16384,
                              pair_budget: int = 16384):
        """Upload edge windows + enqueue the full on-device edge verdict;
        returns futures (fetch via ``edge_verdict_collect``).

        ``pair_budget`` > 0 compacts the anchor build + chain DP to
        gate-passing pairs (~8x fewer than the padded top-t grid on real
        read sets); overflowing sub-batches transparently re-run
        unbudgeted in collect."""
        table = self._front_km if front else self._back_km
        a_seeds, a_pos, a_len = self.front if front else self.back
        is_bc = self._front_bc if front else self._back_bc
        gm, cm, A = self._pad_mins(table, gate_min, chain_min)
        if A == 0:
            return [(len(windows), None, None)]
        futures = []
        for lo in range(0, len(windows), batch):
            sub = windows[lo : lo + batch]
            km_dev, lens_dev, n = self.upload(sub, W)
            call = lambda pb, km=km_dev, ln=lens_dev: _fused_edge_verdict(
                km, ln, table, gm, cm, a_seeds, a_pos, a_len,
                is_bc, k=self.k, W=W,
                max_anchors=max_anchors, top_t=top_t, pair_budget=pb)
            futures.append((n, call(pair_budget), (call, pair_budget)))
        return futures

    def _pair_state(self):
        """Stacked front+back tables for the one-dispatch edge verdict
        (resident since engine init; False when the table shapes can't
        stack)."""
        return self._pair_cache

    def _pair_buffers(self, nb: int, W: int):
        slot = getattr(self, "_pslot", 0)
        self._pslot = (slot + 1) % self.N_SLOTS
        key = ("pair", nb, W, slot)
        buf = getattr(self, "_buf_cache", None)
        if buf is None:
            buf = self._buf_cache = {}
        if key not in buf:
            k = self.k
            CL = ((W + k - 1 + 3) // 4) * 4
            buf[key] = (np.zeros((2, nb, CL), dtype=np.uint8),
                        np.zeros((2, nb), dtype=np.int32),
                        np.zeros((2, nb, CL // 4), dtype=np.uint8))
        return buf[key]

    def edge_pair_dispatch(self, fronts, backs, gm_f, cm_f, gm_b, cm_b,
                           W: int, top_t: int = 8, max_anchors: int = 128,
                           batch: int = 16384):
        """Front + back edge verdicts as ONE upload + ONE dispatch per
        sub-batch (the two problems stack on a leading axis; see
        ``_fused_edge_pair``).  Returns futures for
        ``edge_pair_collect``; None when the table shapes can't stack
        (callers fall back to the per-side path)."""
        tables2, seeds2, pos2, alen2, isbc2 = self._pair_state() or \
            (None,) * 5
        if tables2 is None:
            return None
        gmf, cmf, A_f = self._pad_mins(self._front_km, gm_f, cm_f)
        gmb, cmb, A_b = self._pad_mins(self._back_km, gm_b, cm_b)
        if A_f == 0 or A_b == 0:
            return None
        # min thresholds are fixed across a trim run's batches — reuse the
        # resident copy instead of re-uploading per batch
        mkey = (gmf.tobytes(), cmf.tobytes(), gmb.tobytes(), cmb.tobytes())
        cached = getattr(self, "_mins_cache", None)
        if cached is None or cached[0] != mkey:
            gm2, cm2 = self._put((np.stack([gmf, gmb]),
                                  np.stack([cmf, cmb])))
            cached = self._mins_cache = (mkey, gm2, cm2)
        _, gm2, cm2 = cached
        k = self.k
        futures = []
        for lo in range(0, len(fronts), batch):
            fsub = fronts[lo : lo + batch]
            bsub = backs[lo : lo + batch]
            n = len(fsub)
            nb = _bucket(max(1, n))
            if self.mesh is not None:
                D = self.mesh.shape["data"]
                nb = ((nb + D - 1) // D) * D
            codes, lens, packed = self._pair_buffers(nb, W)
            codes[:] = 0
            lens[:] = 0
            for side, sub in ((0, fsub), (1, bsub)):
                for i, w in enumerate(sub):
                    m = min(len(w), W + k - 1)
                    codes[side, i, :m] = w.codes[:m]
                    lens[side, i] = max(0, m - k + 1)
            c4 = codes.reshape(2, nb, -1, 4)
            np.copyto(packed, c4[:, :, :, 3], casting="unsafe")
            np.bitwise_or(packed, c4[:, :, :, 0] << 6, out=packed)
            np.bitwise_or(packed, c4[:, :, :, 1] << 4, out=packed)
            np.bitwise_or(packed, c4[:, :, :, 2] << 2, out=packed)
            if self.mesh is not None:
                # dim 0 is the front/back axis; the data axis shards the
                # window batch (dim 1)
                from jax.sharding import NamedSharding, PartitionSpec as P
                sh = NamedSharding(self.mesh, P(None, "data"))
                p_dev = jax.device_put(packed, sh)
                l_dev = jax.device_put(lens, sh)
            else:
                p_dev = self._put_data(packed)
                l_dev = self._put_data(lens)
            fut = _fused_edge_pair(p_dev, l_dev, tables2, gm2, cm2,
                                   seeds2, pos2, alen2, isbc2, k=k, W=W,
                                   max_anchors=max_anchors, top_t=top_t)
            futures.append((n, fut))
        return futures

    def edge_pair_collect(self, futures, num_front: int, num_back: int):
        """Fetch paired edge verdicts: (front rows, front counts, back
        rows, back counts)."""
        fr, br = [], []
        fc = np.zeros(num_front, np.int64)
        bc = np.zeros(num_back, np.int64)
        for n, fut in futures:
            verdict, c, _ = jax.device_get(fut)
            fr.append(np.asarray(verdict)[0, :n])
            br.append(np.asarray(verdict)[1, :n])
            fc += np.asarray(c)[0, :num_front]
            bc += np.asarray(c)[1, :num_back]
        empty = np.zeros((0, 4), np.int32)
        return (np.concatenate(fr) if fr else empty, fc,
                np.concatenate(br) if br else empty, bc)

    def edge_verdict_collect(self, futures, num_adapters: int):
        """Fetch edge verdicts: ([n, 4] int32 rows of (found, best_match,
        earliest, latest), per-adapter chain-count totals [A]).  Pair-
        budget overflows re-run the affected sub-batch unbudgeted."""
        rows = []
        counts = np.zeros(num_adapters, np.int64)
        for n, fut, meta in futures:
            if fut is None:
                rows.append(np.zeros((n, 4), np.int32))
                continue
            call, pair_budget = meta
            verdict, c, n_ok = jax.device_get(fut)
            if pair_budget and int(n_ok) > pair_budget:
                verdict, c, n_ok = jax.device_get(call(0))
            rows.append(np.asarray(verdict)[:n])
            counts += np.asarray(c)[:num_adapters]
        return np.concatenate(rows) if rows else np.zeros((0, 4), np.int32), \
            counts

    def enable_covs(self, windows, front: bool, gate_min: np.ndarray,
                    chain_min: np.ndarray, W: int, top_t: int = 8,
                    max_anchors: int = 128, batch: int = 16384,
                    pair_budget: int = 16384):
        """DetermineAdapters device path: per-adapter max covered bases
        over all windows (one [A] fetch per batch).  Pair-budget
        overflows re-run unbudgeted."""
        table = self._front_km if front else self._back_km
        a_seeds, a_pos, a_len = self.front if front else self.back
        gm, cm, A = self._pad_mins(table, gate_min, chain_min)
        if A == 0:
            return np.zeros(0, np.int32)
        futs = []
        for lo in range(0, len(windows), batch):
            sub = windows[lo : lo + batch]
            km_dev, lens_dev, _ = self.upload(sub, W)
            call = lambda pb, km=km_dev, ln=lens_dev: _fused_enable(
                km, ln, table, gm, cm, a_seeds, a_pos, a_len,
                k=self.k, W=W, max_anchors=max_anchors,
                top_t=top_t, pair_budget=pb)
            futs.append((call(pair_budget), (call, pair_budget)))
        out = np.zeros(table.shape[1], np.int64)
        for f, (call, pb) in futs:
            covs, n_ok = jax.device_get(f)
            if pb and int(n_ok) > pb:
                covs, n_ok = jax.device_get(call(0))
            out = np.maximum(out, np.asarray(covs))
        return out[:A]

    def window_verdict_dispatch(self, windows, gate_min: np.ndarray,
                                chain_min: np.ndarray, mid_threshold: int,
                                W: int, top_t: int = 8,
                                max_anchors: int = 128, batch: int = 16384,
                                pair_budget: int = 0,
                                det_budget: int = 4096):
        """Upload interior windows + enqueue the on-device detection scan
        (front adapters; the middle pass only uses those)."""
        uploads = [self.upload(windows[lo : lo + batch], W) + (lo,)
                   for lo in range(0, len(windows), batch)]
        return self.window_verdict_dispatch_packed(
            uploads, gate_min, chain_min, mid_threshold, W, top_t,
            max_anchors, pair_budget, det_budget)

    def window_verdict_dispatch_packed(self, uploads, gate_min, chain_min,
                                       mid_threshold: int, W: int,
                                       top_t: int = 8,
                                       max_anchors: int = 128,
                                       pair_budget: int = 0,
                                       det_budget: int = 4096):
        """Enqueue the detection scan over pre-uploaded packed batches:
        ``uploads`` is a list of (packed_dev, lens_dev, n, lo) where
        ``lo`` is the global index of the batch's first window.  Callers
        that pack windows straight from read arrays (no per-window
        python work) use this entry."""
        table = self._front_km
        a_seeds, a_pos, a_len = self.front
        gm, cm, A = self._pad_mins(table, gate_min, chain_min)
        if A == 0:
            return [(0, None, None)]
        futures = []
        for km_dev, lens_dev, n, lo in uploads:
            call = lambda pb, db, km=km_dev, ln=lens_dev: \
                _fused_window_verdict(
                    km, ln, table, gm, cm, a_seeds, a_pos, a_len,
                    jnp.int32(mid_threshold), k=self.k,
                    W=W, max_anchors=max_anchors, top_t=top_t,
                    pair_budget=pb, det_budget=db)
            futures.append((lo, call(pair_budget, det_budget),
                            (call, pair_budget, det_budget)))
        return futures

    def upload_rows(self, packed_rows: np.ndarray, lens: np.ndarray,
                    n: int):
        """Ship a caller-prepared packed window batch ([nb, CL/4] uint8
        rows + k-mer counts)."""
        return self._put_data(packed_rows), self._put_data(lens), n

    def window_verdict_collect(self, futures):
        """Fetch window detections: [(window idx, adapter idx, start,
        identity)] rows.  Pair- or detection-budget overflows re-run the
        affected sub-batch with the budget lifted (rare: interior windows
        almost never contain adapters)."""
        out = []
        for lo, fut, meta in futures:
            if fut is None:
                continue
            call, pair_budget, det_budget = meta
            arr = np.asarray(fut)
            n_ok, n_det = int(arr[-1, 0]), int(arr[-1, 1])
            if pair_budget and n_ok > pair_budget:
                arr = np.asarray(call(0, det_budget))
                n_det = int(arr[-1, 1])
            if n_det > arr.shape[0] - 1:
                arr = np.asarray(call(0, 4 * det_budget))
                n_det = int(arr[-1, 1])
            rows = arr[:-1]
            rows = rows[rows[:, 0] >= 0]
            if rows.size:
                rows = rows.copy()
                rows[:, 0] += lo      # window idx -> global across batches
                out.append(rows)
        return np.concatenate(out) if out else np.zeros((0, 4), np.int32)

    def match(self, windows, front: bool, gate_min: np.ndarray,
              chain_min: np.ndarray, W: int, top_t: int = 8,
              max_anchors: int = 128, batch: int = 16384):
        """Fused gate+chain for a whole window list; returns for each
        window a list of (adapter_idx, summary_row dict) for its passing
        top-``top_t`` adapters.  One device round trip per ``batch``."""
        return self.match_collect(self.match_dispatch(
            windows, front, gate_min, chain_min, W, top_t=top_t,
            max_anchors=max_anchors, batch=batch))

    def chain(self, packed_dev, lens_dev, pair_ei, pair_ai, pair_mm,
              front: bool, W: int, max_anchors: int = 128,
              max_pairs: int = 16384):
        """Indexed chain summary over (window, adapter) pairs; only the
        index arrays travel to the device.  All slices dispatch before any
        result is fetched so transfers and compute pipeline."""
        P = len(pair_ei)
        if P == 0:
            return None
        a_seeds, a_pos, a_len = self.front if front else self.back

        def dispatch(lo, hi):
            n = hi - lo
            PB = _bucket(n) if hi - lo < max_pairs else max_pairs
            ei = np.zeros(PB, np.int32)
            ei[:n] = pair_ei[lo:hi]
            ai = np.zeros(PB, np.int32)
            ai[:n] = pair_ai[lo:hi]
            mm = np.ones(PB, np.int32)
            mm[:n] = pair_mm[lo:hi]
            return n, _chain_from_windows(
                a_seeds, a_pos, a_len, packed_dev,
                lens_dev, ei, ai, mm, k=self.k, W=W,
                max_anchors=max_anchors)

        futures = [dispatch(lo, min(lo + max_pairs, P))
                   for lo in range(0, P, max_pairs)]
        from .chain import unpack_summary
        parts = [unpack_summary(np.asarray(out)[:n])
                 for n, out in futures]
        if len(parts) == 1:
            return parts[0]
        return {key: np.concatenate([p[key] for p in parts])
                for key in parts[0]}
