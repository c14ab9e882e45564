"""Fused Pallas TPU kernel for the device beam-search DTW consensus.

The XLA engine (``ops.dtw.device_consensus``) expresses one beam step as
~50 small HBM-resident ops inside a ``lax.scan``; its window fetch is a
one-hot MXU contraction that re-reads the whole blocked window matrix
every step, which capped it at ~4% HBM utilisation (223 kbases/s,
BENCH_r03).  This kernel runs the ENTIRE scan on-core: one grid cell
owns a block of ``JB`` consensus jobs, keeps the padded member k-mer
arrays, the cost bands, and all beam state resident in VMEM, and loops
over consensus steps with zero HBM traffic beyond the initial sequence
load and the per-step (kmer, parent, finished, cost) record row.

Semantics match the XLA engine step for step (same vote rule with the
advance-requiring ``ahead`` mask, the same duplicate-state suppression,
quality decay 0.95, drift recentring, finished freezing, and traceback
selection), replacing the reference's sequential landmark beam
(ref: sequence/alignment/alignment.go:556-1052) and its hand-written
band-update kernel (ref: sequence/alignment/asm_amd64.s:17-149).

Layout notes (Mosaic restricts lane-dim reshapes/relayouts):
* beam rows live job-major as R = JB*B sublanes; per-(job, beam)
  scalars are [R, 1] columns, candidate scalars [R, 4];
* the four successor branches are packed into lanes ([R, N, 4*W]),
  with segment-local reductions done as in-lane roll cascades that
  leave results broadcast across their 32-lane segment;
* cross-beam interactions (duplicate suppression, top-k, parent
  gather) are within-job sublane rolls — a per-row barrel shift by
  (parent - row) replaces the XLA engine's gather.

Differences vs the XLA engine: only the ``simple_k`` arithmetic
measures run here (the production default); table measures (nanopore
model / confusion matrices) fall back to the XLA engine.  The window
rule itself (lanes outside the static per-step WINW window are dead,
ops.dtw.WINW) is SHARED with the XLA engine, so the two stay
bit-identical by construction; the expected-position regularizer
(ref: alignment.go:308-331) keeps live bands inside that window.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from downpore_tpu.ops.dtw import (REG_SLACK, WINW, _win_base,
                                  _win_params)

try:  # pragma: no cover - TPU-only module; CPU tests use interpret mode
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

FULL = 0x7FFF               # shared with ops.dtw (int16-safe)
BIG = np.int32(1 << 28)
BAD_DS = BIG // 64          # the XLA engine's out-of-band distance
W = 32                      # the reference band width (asm_amd64.s)
INIT = 8                    # initialOffset (ref: alignment.go:15)
CENTRE = W // 2
PAD = W                     # sequence pad, mirrors ops.dtw PAD
JB = 32                     # jobs per grid cell
NBR = 4                     # successor branches per beam state

# (shift, weight) schedule of align.measures.build_simple_table
# (ref: measures.go:45-104) — identical to ops.dtw._SIMPLE_WEIGHTS
_SIMPLE_WEIGHTS = {
    5: ((4, 8), (6, 2), (2, 2), (0, 1), (8, 1)),
    4: ((4, 4), (2, 4), (6, 2), (0, 2)),
    3: ((2, 8), (4, 2), (0, 2)),
    6: ((4, 4), (6, 4), (2, 2), (8, 2), (0, 1), (10, 1)),
    1: ((0, 8),),
}


def _seg_suffix(x, op, lane, seg: int, fill):
    """Suffix-reduce of the last axis within `seg`-lane groups: out[w] =
    reduce of x[w..segment end] — the full segment reduction sits at each
    segment's FIRST lane (no lane reshapes)."""
    w = lane % seg
    m = x
    sh = seg // 2
    while sh:
        rolled = jnp.roll(m, -sh, axis=-1)
        m = op(m, jnp.where(w < seg - sh, rolled, fill))
        sh //= 2
    return m


def _seg_bcast(x, op, lane, seg: int, fill):
    """Segment-local reduce of the last axis in `seg`-lane groups, result
    broadcast across each segment (no lane reshapes)."""
    w = lane % seg
    m = _seg_suffix(x, op, lane, seg, fill)
    # m[w] = reduce of x[w..segend]; broadcast segment head to all lanes
    b = m
    sh = 1
    while sh < seg:
        rolled = jnp.roll(b, sh, axis=-1)
        b = jnp.where((w & sh) != 0, rolled, b)
        sh *= 2
    return b


def _kernel(seqs_ref, lens_ref, firsts_ref, rec_ref,
            bands, positions, kmers, costs, quality, finished,
            done_smem,
            *, k: int, beam: int, t_max: int, threshold: int,
            gap_cost: int, simple_k: int, LP: int, L: int, N: int):
    B = beam
    R = JB * B
    full = jnp.int32(FULL)
    mask_k = (1 << (2 * k)) - 1

    lane4w = jax.lax.broadcasted_iota(jnp.int32, (R, N, NBR * W), 2)
    w4 = lane4w % W
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (R, N, W), 2)

    def sat(x):
        # FULL-saturating clamp; operands are non-negative int32 bounded
        # by 2*FULL, so a plain min suffices (no wrap possible)
        return jnp.minimum(x, full)
    rb = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % B   # beam idx
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (R, NBR), 1)
    cand_idx = rb * NBR + lane_c                              # [R, 4]

    def jroll(x, s):
        """Within-job row roll: y[(j,b)] = x[(j, (b+s) % B)]."""
        if s % B == 0:
            return x
        s = s % B
        cond = (rb < (B - s)).astype(jnp.int32)
        while cond.ndim < x.ndim:
            cond = cond[..., None]
        cond = cond > 0
        return jnp.where(cond, jnp.roll(x, -s, axis=0),
                         jnp.roll(x, B - s, axis=0))

    def jobmax(x):
        sh = B // 2
        while sh:
            x = jnp.maximum(x, jroll(x, sh))
            sh //= 2
        return x

    lens = lens_ref[:]                                     # [JB, N]
    live_m = lens > 0
    live_r = jnp.repeat(live_m, B, axis=0)                 # [R, N]
    live_i = live_r.astype(jnp.int32)[:, :, None]          # [R, N, 1]
    lens_r = jnp.repeat(lens, B, axis=0)

    # ---- initial state ------------------------------------------------
    firsts_r = jnp.repeat(firsts_ref[:], B, axis=0)        # [R, 1]
    s0 = seqs_ref[:, :, PAD:PAD + 1]                       # [JB, N, 1]
    match0 = jnp.repeat(
        (s0 == firsts_ref[:][..., None]).astype(jnp.int32), B, axis=0)
    off0 = jnp.full((R, N, W), gap_cost, jnp.int32)
    off0 = jnp.where(lane_w < INIT, full, off0)
    off0 = jnp.where((lane_w == INIT) & (match0 > 0), jnp.int32(0), off0)
    bands[...] = off0
    positions[...] = jnp.full((R, N), INIT, jnp.int32)
    kmers[...] = firsts_r
    costs[...] = jnp.where(rb == 0, 0, BIG)
    quality[...] = jnp.ones((R, N), jnp.float32)
    pad_r = ~jnp.repeat(jnp.any(live_m, axis=1, keepdims=True), B, axis=0)
    finished[...] = pad_r.astype(jnp.int32)
    # early-exit flag: the cell is done once every job has a finished
    # beam.  Kept as an SMEM scalar updated INSIDE the body — computing
    # the job reduction per step cost 5.35 us even for skipped steps
    done_smem[0] = jnp.int32(0)

    def step(t, _):
        @pl.when(done_smem[0] == 0)
        def _body():
            kmer = kmers[...]                              # [R, 1]
            poffs = bands[...]                             # [R, N, W]
            pos = positions[...]                           # [R, N]
            q = quality[...]
            cost0 = costs[...]                             # [R, 1]
            finr = finished[...] != 0                      # [R, 1]

            pos2 = pos + 1
            o = pos2 - CENTRE + PAD                        # [R, N]

            # ---- window fetch: ONE static SW-lane slice ----------------
            # the base is a pure function of the step (see ops.dtw.WINW),
            # identical across jobs — one aligned slice serves the cell
            SW, _ = _win_params(L)
            cap = SW - 32
            wb = pl.multiple_of(_win_base(t, L), 128)
            win_j = seqs_ref[:, :, pl.ds(wb, SW)]          # [JB, N, SW]
            win = jnp.repeat(win_j, B, axis=0)             # [R, N, SW]
            off = o - wb                                   # [R, N]
            off_ok = (off >= 0) & (off <= cap) & (o >= 0) & (o < LP)
            offc = jnp.clip(off, 0, cap)[..., None]
            # shrinking-width roll cascade: after every roll by `bit`
            # the remaining shift is at most bit - 1, so only the first
            # 48 + bit - 1 lanes can still matter — narrowing each pass
            # cuts the window-alignment VMEM traffic ~2.4x (it was the
            # single largest per-step tensor traffic)
            bit = 1 << (cap.bit_length() - 1)
            while bit >= 8:
                # lane widths stay 128-aligned: odd widths relayout
                need = ((48 + 2 * bit - 1 + 127) // 128) * 128
                if win.shape[2] > need:
                    win = win[:, :, :need]
                win = jnp.where((offc & bit) != 0,
                                jnp.roll(win, -bit, axis=2), win)
                bit >>= 1
            win = win[:, :, :48]
            for bit in (4, 2, 1):
                win = jnp.where((offc & bit) != 0,
                                jnp.roll(win, -bit, axis=2), win)
            km_at = win[:, :, :W]                          # [R, N, W]
            km_bad = (km_at < 0) | (off_ok.astype(jnp.int32)[..., None]
                                    == 0)                  # [R, N, W]

            # ---- distances, branch-decomposed --------------------------
            shifted = (kmer << 2) & mask_k                 # [R, 1] int32
            kl = km_at & 3
            kh = (km_at ^ kl) & mask_k
            d_hi = kh ^ shifted[..., None]                 # [R, N, W]
            cost_hi = jnp.zeros_like(d_hi)
            w0 = 0
            for sh, wt in _SIMPLE_WEIGHTS[simple_k]:
                if sh == 0:
                    w0 = wt
                    continue
                bit = ((d_hi >> sh) | (d_hi >> (sh + 1))) & 1
                cost_hi = cost_hi + bit * wt
            # expected-position regularizer (ref: alignment.go:308-331),
            # shared with the XLA engine: pulls lost members back toward
            # the static window
            lanepos = (o - PAD)[..., None] + lane_w        # [R, N, W]
            extra = jnp.maximum(
                jnp.abs(lanepos - (INIT + 1 + t)) - REG_SLACK, 0)
            ds_parts = []
            for c in range(NBR):
                dc = cost_hi + w0 * (kl != c).astype(jnp.int32) + extra
                # FULL as the dead-lane distance: poffs + FULL saturates
                # to FULL through sat, matching the XLA engine's
                # BIG//64 (whose sums always clamp at FULL)
                ds_parts.append(jnp.where(km_bad, full, dc))
            ds = jnp.concatenate(ds_parts, axis=-1)        # [R, N, 4W]

            # ---- band update (branch-packed lanes) ---------------------
            p4 = jnp.concatenate([poffs] * NBR, axis=-1)   # [R, N, 4W]
            stay = jnp.where(w4 == W - 1, full, jnp.roll(p4, -1, axis=2))
            pd = sat(p4 + ds)
            skip1 = jnp.where(w4 == 0, full, jnp.roll(pd, 1, axis=2))
            ds_next = jnp.where(w4 == W - 1, full,
                                jnp.roll(ds, -1, axis=2))
            two = sat(pd + ds_next)
            skip2 = jnp.where(w4 < 2, full, jnp.roll(two, 2, axis=2))
            best = jnp.minimum(jnp.minimum(p4, stay),
                               jnp.minimum(skip1, skip2))
            raw = sat(best + ds)
            m_b = _seg_bcast(raw, jnp.minimum, w4, W, full)
            out = jnp.maximum(raw - m_b, 0)
            out = jnp.where(out >= threshold, full, out)

            # ---- votes ------------------------------------------------
            key = poffs * (2 * W) + (W - 1 - lane_w)
            bl = (W - 1) - jnp.min(key, axis=-1, keepdims=True) % (2 * W)
            ahead = w4 >= bl                               # [R, N, 4W]
            # suffix-reduce only: every consumer reads segment-head lanes
            # (w = 0 of each branch segment), so the broadcast-back pass
            # is dead weight
            exact_l = ((ds == 0) & (out < full) & ahead).astype(jnp.int32)
            exact_b = _seg_suffix(exact_l, jnp.maximum, w4, W,
                                  jnp.int32(0))
            vote_w = jnp.floor(8.0 * q + 0.5).astype(jnp.int32)[..., None]
            votes = jnp.sum(
                jnp.where((exact_b > 0) & (live_i > 0), vote_w, 0),
                axis=1)                                    # [R, 4W]
            seq_cost = jnp.sum(
                jnp.where(live_i > 0, m_b.astype(jnp.int32), 0), axis=1)

            # candidate scalars: only each branch segment's head lane is
            # meaningful — compress FIRST, gate/freeze in [R, 4]
            sc4 = jnp.concatenate(
                [seq_cost[:, c * W:c * W + 1] for c in range(NBR)], axis=1)
            vt4 = jnp.concatenate(
                [votes[:, c * W:c * W + 1] for c in range(NBR)], axis=1)
            cc4 = cost0 + sc4                              # [R, 4] int32
            cc4 = jnp.where(vt4 > 0, cc4, BIG)
            cc4 = jnp.where(finr,
                            jnp.where(lane_c == 0, cost0, BIG), cc4)
            nextk4 = jnp.concatenate(
                [shifted | c for c in range(NBR)], axis=1)  # [R, 4]
            effk4 = jnp.where(finr, kmer, nextk4)

            # ---- duplicate suppression (ref ops.dtw step) ------------
            # Small-state work runs TRANSPOSED — candidates as [4, R]
            # (branch on sublanes, (job, beam) on lanes): each op costs
            # one VPU instruction instead of the 8+ a lane-padded [R, 4]
            # op costs, and within-job rolls become lane rolls.
            ck_t = effk4.T                                 # [4, R]
            cc_t = cc4.T
            kmer_t = kmer.T                                # [1, R]
            cost_t = cost0.T
            fin_t = finr.astype(jnp.int32).T
            lb = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1) % B
            rowc = jax.lax.broadcasted_iota(jnp.int32, (NBR, R), 0)
            ci_t = lb * NBR + rowc                         # [4, R]

            def jroll_t(x, s):
                if s % B == 0:
                    return x
                s = s % B
                return jnp.where(lb < (B - s), jnp.roll(x, -s, axis=1),
                                 jnp.roll(x, B - s, axis=1))

            # live candidates carry their branch in the kmer's low 2 bits
            # (nextk = shifted | c), so two live candidates can only
            # collide on the SAME branch — cross-branch (dc != 0)
            # comparisons are dead work (frozen candidates, whose kmers
            # are arbitrary, are excluded from both sides by pf/fin
            # masks exactly as in the XLA engine's eff_k rule)
            dup = jnp.zeros((NBR, R), jnp.int32)
            for d in range(B):
                if d == 0:
                    continue  # own parent (dup_beam) and same-parent
                    # other branches (never kmer-equal live) both skip
                sk_d = jroll_t(kmer_t, d)
                sc_d = jroll_t(cost_t, d)
                pf_d = jroll_t(fin_t, d)
                # dup vs live parent-generation slots (not own)
                dup = dup | ((ck_t == sk_d) & (sc_d <= cc_t)
                             & (pf_d == 0)).astype(jnp.int32)
                ck_d = jroll_t(ck_t, d)
                cc_d = jroll_t(cc_t, d)
                idx2 = ((lb + d) % B) * NBR + rowc
                better = (cc_d < cc_t) | ((cc_d == cc_t) & (idx2 < ci_t))
                dup = dup | ((ck_t == ck_d) & better
                             & (pf_d == 0)).astype(jnp.int32)
            dup = jnp.where(fin_t > 0, 0, dup)
            fc = jnp.where(dup > 0, BIG, cc_t)             # [4, R]

            # ---- top-B (lowest cost, lowest index on ties) -----------
            def jobmin_t(x):
                s = B // 2
                while s:
                    x = jnp.minimum(x, jroll_t(x, s))
                    s //= 2
                return x

            sel_row_t = jnp.zeros((1, R), jnp.int32)
            selc_row_t = jnp.zeros((1, R), jnp.int32)
            for i in range(B):
                mn = jobmin_t(jnp.min(fc, axis=0, keepdims=True))
                sel = jobmin_t(jnp.min(
                    jnp.where(fc == mn, ci_t, B * NBR), axis=0,
                    keepdims=True))                        # [1, R]
                here = (lb == i).astype(jnp.int32)
                sel_row_t = sel_row_t + here * sel
                selc_row_t = selc_row_t + here * mn
                fc = jnp.where(ci_t == sel, BIG + 1, fc)
            selc_row = selc_row_t.T                        # [R, 1]
            parent_row = (sel_row_t // NBR).T
            branch_row = (sel_row_t % NBR).T

            # ---- parent gather: masked select over the 8 deltas ------
            # (a per-row barrel roll does NOT compose here: the second
            # roll would read rows already shifted by their own deltas)
            delta = (parent_row - rb) % B                  # [R, 1]

            def bsel(x):
                acc = None
                for d in range(B):
                    cond = (delta == d).astype(jnp.int32)
                    while cond.ndim < x.ndim:
                        cond = cond[..., None]
                    cond = cond > 0
                    y = jroll(x, d)
                    acc = y if acc is None else jnp.where(cond, y, acc)
                return acc

            # frozen rows' bands/positions are never observable (their
            # candidates are cost-frozen, votes gated, window base
            # masked), so old poffs/pos need no gather — only the
            # fields below flow into records or live-row state
            exact4 = jnp.concatenate(
                [exact_b[:, :, c * W:c * W + 1] for c in range(NBR)],
                axis=2)                                    # [R, N, 4]
            big_sel = bsel(jnp.concatenate([out, exact4], axis=2))
            out_sel = big_sel[:, :, :NBR * W]              # [R, N, 4W]
            exact4_sel = big_sel[:, :, NBR * W:]
            pos2_sel = bsel(pos2)
            q_sel = bsel(q)
            kmer_sel = bsel(kmer)
            fin_sel = bsel(finr.astype(jnp.int32)) != 0    # [R, 1]

            br3 = branch_row[..., None]                    # [R, 1, 1]
            for bit, sh in ((1, W), (2, 2 * W)):
                out_sel = jnp.where((br3 & bit) != 0,
                                    jnp.roll(out_sel, -sh, axis=2),
                                    out_sel)
            new_off = out_sel[:, :, :W]
            exact_n = jnp.zeros((R, N), jnp.int32)
            for c in range(NBR):
                exact_n = exact_n + jnp.where(
                    branch_row == c,
                    jnp.sum(exact4_sel[:, :, c:c + 1], axis=2), 0)

            new_q = jnp.where(exact_n > 0, 1.0, q_sel * 0.95)
            new_kmer = ((kmer_sel << 2) & mask_k) | branch_row
            new_kmer = jnp.where(fin_sel, kmer_sel, new_kmer)
            new_pos = pos2_sel
            new_q = jnp.where(fin_sel, q_sel, new_q)

            # ---- drift recentring ------------------------------------
            key2 = new_off * (2 * W) + (W - 1 - lane_w)
            bp = (W - 1) - jnp.min(key2, axis=-1) % (2 * W)  # [R, N]
            drift = CENTRE - bp
            do = (jnp.abs(drift) > 4) & ~fin_sel
            shift = jnp.where(do, drift, 0)                # [R, N]
            sh64 = jnp.concatenate(
                [new_off, jnp.full((R, N, W), FULL, jnp.int32)], axis=-1)
            u = jnp.mod(shift, 64)[..., None]
            for bit in (32, 16, 8, 4, 2, 1):
                sh64 = jnp.where((u & bit) != 0,
                                 jnp.roll(sh64, bit, axis=2), sh64)
            lane64 = jax.lax.broadcasted_iota(jnp.int32, (R, N, 64), 2)
            src = lane64 - shift[..., None]
            sh64 = jnp.where((src < 0) | (src >= W), full, sh64)
            new_off = sh64[:, :, :W]
            new_pos = new_pos - shift
            best_lane = jnp.where(do, CENTRE, bp)
            seq_pos = new_pos + best_lane - CENTRE
            new_fin = fin_sel | (jnp.max(
                ((seq_pos >= lens_r - 1) & live_r).astype(jnp.int32),
                axis=1, keepdims=True) > 0)                # [R, 1]

            # ---- commit ----------------------------------------------
            bands[...] = new_off
            positions[...] = new_pos
            kmers[...] = new_kmer
            costs[...] = selc_row
            quality[...] = new_q
            finished[...] = new_fin.astype(jnp.int32)
            job_any_fin = jobmax(new_fin.astype(jnp.int32))
            done_smem[0] = (jnp.min(job_any_fin) > 0).astype(jnp.int32)

            # ---- record row ------------------------------------------
            rec_row = jnp.concatenate(
                [new_kmer.T, parent_row.T,
                 new_fin.astype(jnp.int32).T, selc_row.T],
                axis=1)                                    # [1, 4R]
            rec_ref[0, pl.ds(t, 1), :] = rec_row

        return 0

    jax.lax.fori_loop(0, t_max, step, 0)


@functools.partial(
    jax.jit, static_argnames=("k", "beam", "t_max", "threshold", "gap_cost",
                              "simple_k", "L", "interpret"))
def pallas_consensus_records(seqs, lens, firsts, k: int, beam: int,
                             t_max: int, threshold: int, gap_cost: int,
                             simple_k: int, L: int = 0,
                             interpret: bool = False):
    """Run the fused beam scan for J jobs.

    seqs: [J, N, LP] int32 (PAD-fronted, -1-filled); lens [J, N] int32;
    firsts [J] int32.  J must be a JB multiple, LP a 128 multiple >= 256.
    Returns records [J//JB, T, 4*JB*beam] int32 laid out
    [kmer | parent | fin | cost] blocks of JB*beam (beam-minor).
    """
    J, N, LP = seqs.shape
    if not L:
        L = LP - 128            # the bulk wrapper's padding convention
    assert J % JB == 0 and LP % 128 == 0
    # base + width must stay in bounds for ANY caller-passed L: the max
    # dynamic slice start is _win_params(L)[1], of width [0], so their
    # sum (== the padded length lp) must fit the shipped LP
    assert sum(_win_params(L)) <= LP, (L, LP)
    assert k <= 7  # k-mer values stay below the FULL sentinel
    R = JB * beam
    grid = (J // JB,)
    kernel = functools.partial(
        _kernel, k=k, beam=beam, t_max=t_max, threshold=threshold,
        gap_cost=gap_cost, simple_k=simple_k, LP=LP, L=L, N=N)
    rec = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((JB, N, LP), lambda i: (i, 0, 0)),
            pl.BlockSpec((JB, N), lambda i: (i, 0)),
            pl.BlockSpec((JB, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_max, 4 * R), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((J // JB, t_max, 4 * R), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((R, N, W), jnp.int32),       # bands
            pltpu.VMEM((R, N), jnp.int32),          # positions
            pltpu.VMEM((R, 1), jnp.int32),          # kmers
            pltpu.VMEM((R, 1), jnp.int32),          # costs
            pltpu.VMEM((R, N), jnp.float32),        # quality
            pltpu.VMEM((R, 1), jnp.int32),          # finished
            pltpu.SMEM((1,), jnp.int32),            # early-exit flag
        ],
        interpret=interpret,
    )(seqs.astype(jnp.int32), lens.astype(jnp.int32),
      firsts.astype(jnp.int32).reshape(J, 1))
    return rec


@functools.partial(jax.jit, static_argnames=("beam",))
def _records_to_chains(rec, beam: int):
    """Per-job traceback over the packed record tensor.

    rec: [J//JB, T, 4*JB*beam] as produced by the kernel.  Returns
    (chains [J, T] int32 -1-padded, n_valid [J] int32) in job order —
    the same contract as ops.dtw's scan outputs."""
    from downpore_tpu.ops.dtw import _device_traceback
    JBl, T, R4 = rec.shape
    R = R4 // 4
    r = rec.reshape(JBl, T, 4, JB, beam)
    r = r.transpose(0, 3, 1, 2, 4).reshape(JBl * JB, T, 4, beam)
    kmers = r[:, :, 0]
    parents = r[:, :, 1]
    fin_at = r[:, :, 2] != 0
    cost = r[:, :, 3]
    return jax.vmap(_device_traceback)(kmers, parents, fin_at, cost)


def pallas_consensus(seqs, lens, firsts, k: int, beam: int, t_max: int,
                     threshold: int, gap_cost: int, simple_k: int,
                     L: int = 0, interpret: bool = False):
    """Fused-kernel equivalent of ops.dtw._device_consensus_vmapped:
    returns (chains [J, t_max], n_valid [J]) for a JB-multiple batch."""
    rec = pallas_consensus_records(seqs, lens, firsts, k, beam, t_max,
                                   threshold, gap_cost, simple_k, L=L,
                                   interpret=interpret)
    return _records_to_chains(rec, beam)
