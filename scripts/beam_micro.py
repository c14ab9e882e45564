"""Microbench for the fused consensus beam kernel at bench shapes.

Usage: python scripts/beam_micro.py [J] [t_max]
Times pallas_consensus_records (kernel only, no traceback) and the full
pallas_consensus, reporting us/step/cell and jobs/s.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from downpore_tpu.ops import pallas_beam as pb

J = int(sys.argv[1]) if len(sys.argv) > 1 else 256
T = int(sys.argv[2]) if len(sys.argv) > 2 else 704
N, L = 8, 512
LP = (((L + 2 * pb.W) + 127) // 128) * 128
k, beam = 5, 4

rng = np.random.default_rng(0)
core = rng.integers(0, 4, L + k - 1)
seqs = np.full((J, N, LP), -1, np.int32)
lens = np.zeros((J, N), np.int32)
for j in range(J):
    for n in range(6):
        arr = core.copy()
        m = rng.random(len(arr)) < 0.08
        arr[m] = rng.integers(0, 4, int(m.sum()))
        km = np.zeros(L, np.int64)
        for i in range(k):
            km = (km << 2) | arr[i:i + L]
        seqs[j, n, pb.PAD:pb.PAD + L] = km
        lens[j, n] = L
firsts = seqs[:, 0, pb.PAD].copy()

rec = pb.pallas_consensus_records(seqs, lens, firsts, k, beam, T, 300, 8, k)
jax.block_until_ready(rec)
t0 = time.time()
rec = pb.pallas_consensus_records(seqs, lens, firsts, k, beam, T, 300, 8, k)
jax.block_until_ready(rec)
dt = time.time() - t0
cells = J // pb.JB
print(f"JB={pb.JB} J={J} T={T} cells={cells}: {dt*1e3:.1f} ms "
      f"= {dt/cells/T*1e6:.2f} us/step/cell, {J/dt:.0f} jobs/s, "
      f"~{J*L/dt/1e6:.2f} Mbases/s")
