"""Pallas TPU kernel for the anchor chain DP forward scan.

The scan processes anchors left to right; at step t every pair's candidate
predecessors are scored across the full anchor lane dimension — a [BLOCK,
A] VPU tile per step with A=128 on the lane axis.  All state (score,
coverage, chain-start positions, backpointers) lives in VMEM for the whole
scan, so each pair's DP runs without touching HBM between steps.

Semantics identical to ``ops.chain._chain_scan`` (the XLA version used by
default); parity is tested in interpret mode and on hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -(10 ** 9)
BLOCK = 128


def _window_ok(gap_q, gap_t, k, variant):
    if variant == "extend":
        neg = (gap_t >= -k) & (gap_t <= 0)
        pos = (gap_t >= (gap_q * 2) // 3 - k) & (gap_t <= (gap_q * 3) // 2 + k)
        # logical blend instead of jnp.where on bools — Mosaic can't
        # lower an i1 select
        q_neg = gap_q < 0
        return (q_neg & neg) | (~q_neg & pos)
    g = gap_t
    min_gap = (g * 2) // 3 - k
    max_gap = (g * 3) // 2 + k + 1
    neg_min = min_gap < 0
    min_gap = jnp.where(neg_min, -k, jnp.where(max_gap < 20, 0, min_gap))
    max_gap = jnp.where(neg_min, jnp.maximum(max_gap, 0),
                        jnp.where(max_gap < 20, 20, max_gap))
    return (gap_q >= min_gap) & (gap_q <= max_gap)


def _kernel(qi_ref, tj_ref, qp_ref, tp_ref, valid_ref,
            score_ref, cov_q_ref, cov_t_ref, s_qp_ref, s_tp_ref, bp_ref,
            *, k: int, variant: str, n_anchors: int):
    B = qi_ref.shape[0]
    qi = qi_ref[:]
    tj = tj_ref[:]
    qp = qp_ref[:]
    tp = tp_ref[:]
    valid_i = valid_ref[:]
    valid = valid_i != 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, n_anchors), 1)

    def body(t, state):
        score, cov_q, cov_t, s_qp, s_tp, bp = state
        # Mosaic can't load/store a dynamic column, so column t is
        # extracted with a one-hot masked reduction and written back with
        # a full-tile select — both pure VPU ops.
        at_t = lane == t
        col = lambda arr: jnp.sum(jnp.where(at_t, arr, 0),
                                  axis=1, keepdims=True)
        qp_t = col(qp)
        tp_t = col(tp)
        qi_t = col(qi)
        tj_t = col(tj)
        gap_q = qp_t - qp - k
        gap_t = tp_t - tp - k
        ok = (lane < t) & valid & (qi < qi_t) & (tj < tj_t) \
            & _window_ok(gap_q, gap_t, k, variant) & (score > 0)
        cand = jnp.where(ok, score, NEG)
        best_score = jnp.max(cand, axis=1, keepdims=True)
        # argmax tie-break to the first index (matches jnp.argmax)
        is_best = (cand == best_score) & ok
        big = jnp.int32(n_anchors)
        best = jnp.min(jnp.where(is_best, lane, big), axis=1, keepdims=True)
        # gather-free select: exactly one chosen lane (or none) per row,
        # so a masked sum reduces to the value at `best`
        chosen = lane == best
        take = lambda arr: jnp.sum(jnp.where(chosen, arr, 0),
                                   axis=1, keepdims=True)
        has_prev = best_score > 0
        gq_b = take(gap_q)
        gt_b = take(gap_t)
        new_score = jnp.where(has_prev, best_score + 1, 1)
        new_cov_q = jnp.where(has_prev,
                              take(cov_q) + k + jnp.minimum(0, gq_b), k)
        new_cov_t = jnp.where(has_prev,
                              take(cov_t) + k + jnp.minimum(0, gt_b), k)
        new_s_qp = jnp.where(has_prev, take(s_qp), qp_t)
        new_s_tp = jnp.where(has_prev, take(s_tp), tp_t)
        new_bp = jnp.where(has_prev, best, -1)
        v_t = col(valid_i) != 0
        upd = lambda old, val, empty: jnp.where(
            at_t, jnp.where(v_t, val, empty), old)
        return (upd(score, new_score, 0),
                upd(cov_q, new_cov_q, 0),
                upd(cov_t, new_cov_t, 0),
                upd(s_qp, new_s_qp, 0),
                upd(s_tp, new_s_tp, 0),
                upd(bp, new_bp, -1))

    zero = jnp.zeros((B, n_anchors), jnp.int32)
    init = (zero, zero, zero, zero, zero,
            jnp.full((B, n_anchors), -1, jnp.int32))
    score, cov_q, cov_t, s_qp, s_tp, bp = \
        jax.lax.fori_loop(0, n_anchors, body, init)
    score_ref[:] = score
    cov_q_ref[:] = cov_q
    cov_t_ref[:] = cov_t
    s_qp_ref[:] = s_qp
    s_tp_ref[:] = s_tp
    bp_ref[:] = bp


@functools.partial(jax.jit, static_argnames=("k", "variant", "interpret"))
def pallas_chain_scan(qi, tj, qp, tp, valid, k: int,
                      variant: str = "extend", interpret: bool = False):
    """Forward chain DP via Pallas; inputs [P, A] int32 (valid as int32
    0/1), P padded to BLOCK internally.  Returns the same six arrays as
    ``_chain_scan`` vmapped."""
    P, A = qi.shape
    PB = ((P + BLOCK - 1) // BLOCK) * BLOCK

    def padp(a, fill):
        if PB == P:
            return a.astype(jnp.int32)
        return jnp.concatenate(
            [a.astype(jnp.int32),
             jnp.full((PB - P, A), fill, jnp.int32)])

    qi_p = padp(qi, -1)
    tj_p = padp(tj, -1)
    qp_p = padp(qp, 0)
    tp_p = padp(tp, 0)
    v_p = padp(valid.astype(jnp.int32), 0)
    kern = functools.partial(_kernel, k=k, variant=variant, n_anchors=A)
    grid = (PB // BLOCK,)
    spec = pl.BlockSpec((BLOCK, A), lambda i: (i, 0))
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((PB, A), jnp.int32)] * 6,
        interpret=interpret,
    )(qi_p, tj_p, qp_p, tp_p, v_p)
    return tuple(o[:P] for o in outs)
