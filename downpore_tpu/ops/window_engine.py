"""Device-resident window matching engine for the trimmer.

The host uploads each batch of sequence windows ONCE as raw k-mer arrays
``[n, W] int16`` (a few MB); everything else stays on device:

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

from .chain import chain_batch_summary, _bucket


@jax.jit
def _gate_counts(kmers, lens, km_table):
    """``[n, W]`` k-mers (+ per-row lengths) -> ``[n, A]`` hit counts."""
    km = jnp.clip(kmers.astype(jnp.int32), 0)
    pos = jax.lax.broadcasted_iota(jnp.int32, km.shape, 1)
    valid = pos < lens[:, None]
    rows = jnp.take(km_table, km, axis=0)  # [n, W, A] int8
    rows = jnp.where(valid[:, :, None], rows, 0)
    return jnp.sum(rows.astype(jnp.int32), axis=1)


@functools.partial(jax.jit, static_argnames=("k", "max_anchors", "variant",
                                              "top_k"))
def _chain_from_windows(a_seeds, a_pos, a_len, kmer2seed, kmers_dev,
                        lens_dev, ei, ai, mm, k: int, max_anchors: int,
                        variant: str = "extend", top_k: int = 4):
    """Chain DP whose target seed lists are gathered on device from the
    resident window k-mer array."""
    qs = a_seeds[ai].astype(jnp.int32)
    qp = a_pos[ai].astype(jnp.int32)
    alen = a_len[ai]
    km = kmers_dev[ei].astype(jnp.int32)          # [P, W]
    pos = jax.lax.broadcasted_iota(jnp.int32, km.shape, 1)
    valid = pos < lens_dev[ei][:, None]
    ts = jnp.where(valid, jnp.take(kmer2seed, jnp.clip(km, 0)), -1)
    return chain_batch_summary(qs, qp, ts, pos, mm, alen,
                               k=k, max_anchors=max_anchors,
                               variant=variant, top_k=top_k)


class WindowChainEngine:
    """Per-Trimmer device state: adapter seed tables, kmer->seed map and
    kmer->adapter membership tables."""

    def __init__(self, front_adapters, back_adapters, front_sets, back_sets,
                 kmer_map: np.ndarray, seed_map: List[int], k: int,
                 nq: int = 64):
        self.k = k
        self.nq = nq
        size = kmer_map.shape[0]
        self.kmer2seed = jax.device_put(kmer_map.astype(np.int32))

        def tables(adapters):
            A = len(adapters)
            seeds = np.full((max(1, A), nq), -1, np.int32)
            pos = np.zeros((max(1, A), nq), np.int16)
            alen = np.zeros(max(1, A), np.int32)
            for i, ad in enumerate(adapters):
                m = min(ad.num_seeds, nq)
                seeds[i, :m] = ad.seeds[:m]
                pos[i, :m] = ad.seed_positions(k)[:m]
                alen[i] = ad.length
            return (jax.device_put(seeds), jax.device_put(pos),
                    jax.device_put(alen))

        self.front = tables(front_adapters)
        self.back = tables(back_adapters)

        def km_table(adapter_sets):
            AP = 128 * ((max(1, len(adapter_sets)) + 127) // 128)
            t = np.zeros((size, AP), dtype=np.int8)
            for i, st in enumerate(adapter_sets):
                kms = [seed_map[int(sid)] for sid in st]
                t[kms, i] = 1
            return jax.device_put(t)

        self._front_km = km_table(front_sets)
        self._back_km = km_table(back_sets)

    # -- per batch ------------------------------------------------------
    def upload(self, windows, W: int):
        """Window batch -> resident device arrays (kmers int16, lens)."""
        n = len(windows)
        nb = _bucket(max(1, n))
        k = self.k
        codes = np.zeros((nb, W + k - 1), dtype=np.uint8)
        lens = np.zeros(nb, dtype=np.int32)
        for i, w in enumerate(windows):
            m = min(len(w), W + k - 1)
            codes[i, :m] = w.codes[:m]
            lens[i] = max(0, m - k + 1)
        acc = np.zeros((nb, W), dtype=np.int32)
        c = codes.astype(np.int32)
        for j in range(k):
            acc |= c[:, j : j + W] << (2 * (k - 1 - j))
        km = acc.astype(np.int16) if 4 ** k <= 32768 else acc
        return jax.device_put(km), jax.device_put(lens), n

    def gate(self, kmers_dev, lens_dev, front: bool, n: int) -> np.ndarray:
        table = self._front_km if front else self._back_km
        counts = _gate_counts(kmers_dev, lens_dev, table)
        return np.asarray(counts)[:n]

    def chain(self, kmers_dev, lens_dev, pair_ei, pair_ai, pair_mm,
              front: bool, max_anchors: int = 128,
              max_pairs: int = 8192):
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
                a_seeds, a_pos, a_len, self.kmer2seed, kmers_dev,
                lens_dev, ei, ai, mm, k=self.k, max_anchors=max_anchors)

        futures = [dispatch(lo, min(lo + max_pairs, P))
                   for lo in range(0, P, max_pairs)]
        parts = [{key: v[:n] for key, v in jax.device_get(out).items()}
                 for n, out in futures]
        if len(parts) == 1:
            return parts[0]
        return {key: np.concatenate([p[key] for p in parts])
                for key in parts[0]}
