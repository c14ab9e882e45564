"""Candidate retrieval: seed-hit counting as an integer matmul on the MXU.

The reference answers "which indexed chunks share >= hitFraction of the
query's seeds" with a per-word bitset soft-union cascade in hand-written
SIMD (ref: util/bitset.go:308-411, util/asm_amd64.s:121-509).  On TPU the
natural formulation is dense linear algebra: with the inverted index as a
0/1 membership matrix ``M[num_seeds, num_chunks]`` and a batch of queries
as multiplicity vectors ``V[num_queries, num_seeds]`` (one count per run
of each seed, consecutive duplicates collapsed, exactly the multiset the
reference feeds GetSharedIDs), the shared-seed counts are ``V @ M`` — one
int8 matmul that the MXU executes at speed of light, replacing both the
soft-union candidate retrieval and the per-candidate popcount gate
(ref: util/bitset.go:179, overlap/overlap.go:359).

The exact counts make this the reference's *slow-path* (exact) semantics;
its fast path may return supersets for min_count > 16.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def hit_counts(query_multi: jax.Array, membership: jax.Array) -> jax.Array:
    """``[Q, S] x [S, C] -> [Q, C]`` shared-seed counts (int32).

    ``query_multi`` is int8 per-seed run multiplicities; ``membership`` is
    the int8 0/1 seed->chunk matrix.
    """
    return jax.lax.dot_general(
        query_multi, membership,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def candidates_from_counts(counts: np.ndarray, num_sets: np.ndarray,
                           hit_fraction: float, min_sets: int = 5):
    """Threshold hit counts into candidate lists, mirroring
    ``SeedIndex.Matches`` (ref: seeds/seeds.go:348-352).

    ``counts``: [Q, C] int; ``num_sets``: [Q] number of usable query seed
    runs.  Queries with fewer than ``min_sets`` usable seeds get no
    candidates.  Returns a list of np arrays of chunk indices.
    """
    counts = np.asarray(counts)
    num_sets = np.asarray(num_sets)
    min_count = (hit_fraction * num_sets + 0.5).astype(np.int64)
    out = []
    for qi in range(counts.shape[0]):
        if num_sets[qi] < min_sets:
            out.append(np.empty(0, dtype=np.int64))
        else:
            out.append(np.flatnonzero(counts[qi] >= min_count[qi]))
    return out


def build_query_matrix(queries, num_seeds: int, usable: np.ndarray):
    """Stack per-query seed run multiplicities into ``[Q, S]`` int8.

    ``queries`` is an iterable of SeedSequence; ``usable`` a bool mask over
    seed ids (seeds absent from every chunk or present in all chunks are
    unusable, ref: seeds/seeds.go:343).  Returns (matrix, num_sets).
    """
    qs = list(queries)
    V = np.zeros((len(qs), num_seeds), dtype=np.int8)
    num_sets = np.zeros(len(qs), dtype=np.int32)
    for i, q in enumerate(qs):
        prev = -1
        n = 0
        for s in q.seeds:
            s = int(s)
            # prev only advances on an accepted seed, as in the reference
            if s != prev and usable[s]:
                V[i, s] += 1
                n += 1
                prev = s
        num_sets[i] = n
    return V, num_sets
