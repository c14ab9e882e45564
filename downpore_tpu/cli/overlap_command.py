"""The overlap command: batched all-vs-all rounds with PAF output
(ref: commands/overlap.go:22-233)."""
from __future__ import annotations

import sys
import time

from .framework import Command, parse_bool, parse_float, parse_int


class OverlapCommand(Command):
    name = "overlap"

    def __init__(self):
        super().__init__(
            ["overlap_size", "k", "num_seeds", "seed_batch_size",
             "chunk_size", "query_batch_size", "min_hits", "num_workers",
             "input", "seed_values", "himem", "data_parallel",
             "checkpoint", "seed_shards"],
            ["1000", "10", "15", "100000", "10000", "20000", "0.25", "4",
             "", "", "true", "false", "", "1"],
            ["Size of overlap to search for in bases",
             "Number of bases in each seed",
             "Minimum number of seeds to generate for each overlap query",
             "Maximum total unique seeds to use in each query batch "
             "(the reference defaults to 10000 to bound host RAM; TPU "
             "HBM affords 10x, so the default here is 100000 — fewer, "
             "bigger rounds mean fewer whole-file re-index passes)",
             "Size to chop long reads into for querying against, in bases",
             "Maximum number of queries per batch (if max seeds not reached)",
             "Minimum proportion of seeds that must match each query",
             "Number of worker threads to spawn",
             "Fasta/fastq input file",
             "File containing values to use during seed selection.",
             "Whether to cache all reads in memory",
             "Shard query batches across all attached devices "
             "(jax.sharding data mesh; the chunk index replicates)",
             "Snapshot file for checkpoint/resume at round boundaries",
             "Shard the chunk seed index over this many devices (with "
             "-data_parallel: a data x seed mesh; retrieval counts merge "
             "with a psum over the seed axis)"])

    def run(self, args):
        from ..io import SequenceSet
        from ..seeds import SeedIndex
        from ..overlap import Overlapper, QUERY_EDGES, build_consensus
        from ..utils import kmer_occurrences
        from ..utils.kmers import score_seed_values

        overlap_size = parse_int(args["overlap_size"])
        num_seeds = parse_int(args["num_seeds"])
        seed_batch_size = parse_int(args["seed_batch_size"])
        query_batch_size = parse_int(args["query_batch_size"])
        chunk_size = parse_int(args["chunk_size"])
        k = parse_int(args["k"])
        hit_fraction = parse_float(args["min_hits"])

        seq_set = SequenceSet(args["input"], min_length=overlap_size,
                              cache=parse_bool(args["himem"]))
        mesh = None
        n_seed = parse_int(args["seed_shards"])
        if parse_bool(args["data_parallel"]) or n_seed > 1:
            from ..parallel.mesh import make_mesh
            mesh = make_mesh(n_seed=n_seed)
        print(f"Counting all {k}-mers in the input...", file=sys.stderr)
        # multi-device meshes count on device (sharded bincount + psum,
        # parallel.sharded_kmer_histogram)
        counts = kmer_occurrences(seq_set.get_sequences(), k, mesh=mesh)
        values = score_seed_values(counts, k, args.get("seed_values", ""))
        print("Counting complete. Starting indexing and querying...",
              file=sys.stderr)
        first_sequence = 0
        round_no = 0
        ckpt = args.get("checkpoint") or None
        if ckpt:
            import os
            if os.path.exists(ckpt):
                progress = seq_set.load_state(ckpt)
                first_sequence = int(progress.get("first_sequence", 0))
                round_no = int(progress.get("round", 0))
                print(f"Resuming from round {round_no} "
                      f"(sequence {first_sequence}).", file=sys.stderr)
        shape_plan = {}  # ONE compiled-shape plan for the whole job
        # (nt/nq/mb/budget pinned monotone across rounds) — round-to-
        # round shape drift otherwise recompiles the fused kernel

        def prep_round(first):
            """Host half of a round: fresh index, query prep, chunk
            indexing.  Independent of any earlier round's results, so it
            runs while the previous round's find is in flight."""
            index = SeedIndex(k)
            overlapper = Overlapper(index, chunk_size, overlap_size,
                                    num_seeds, hit_fraction, mesh=mesh,
                                    shape_plan=shape_plan)
            seqs = seq_set.get_n_sequences_from(first, query_batch_size)
            # query re-extraction and read chunk indexing overlap on a
            # worker thread after pass 1 freezes the seed set (prep is
            # the pipelined round's critical path)
            queries = overlapper.prepare_round(
                num_seeds, seed_batch_size, values, seqs, QUERY_EDGES,
                seq_set.get_sequences())
            if not queries:
                return None
            nxt = max(q.sequence_id for q in queries) + 1
            return index, overlapper, queries, nxt

        prepped = prep_round(first_sequence)
        futs = prepped[1].dispatch_find(prepped[2]) if prepped else None
        # SPECULATIVELY prep the next round on a WORKER THREAD while this
        # round's find is in flight AND while its results are collected/
        # processed (the native seed walks release the GIL); the prepped
        # round is then dispatched two-deep so its index upload rides the
        # link alongside the current round's result fetch.  The prep
        # depends on the read set's ignore flags, which a round's final
        # check may still change (full-coverage ignores, ref
        # commands/overlap.go:205,221-223) — the flag count is
        # snapshotted at submit time and the prep redone sequentially if
        # it moved, so output stays identical to the unpipelined driver
        # (ignores only ever flip to True, so an unchanged count means
        # the speculative prep saw clean state).
        from concurrent.futures import ThreadPoolExecutor
        ex = ThreadPoolExecutor(max_workers=1)

        def submit_prep(first):
            return (sum(seq_set.ignore), first,
                    ex.submit(prep_round, first))

        next_sub = submit_prep(prepped[3]) if prepped else None
        while prepped is not None:
            index, overlapper, queries, next_first = prepped
            num_query_seqs = max(q.id for q in queries) + 1
            print(f"Using query set with {num_query_seqs} sequences "
                  f"starting from {next_first} against "
                  f"{seq_set.size} sequences.", file=sys.stderr)
            # two-deep: dispatch round r+1 (its prep ran on the worker
            # during round r-1's collect/process) before collecting r,
            # so its index upload rides the link alongside r's fetch;
            # then queue round r+2's prep under r's collect
            if next_sub is not None:
                snap, sub_first, prep_fut = next_sub
                prepped_next = prep_fut.result()
            else:
                snap, sub_first, prepped_next = 0, 0, None
            futs_next = (prepped_next[1].dispatch_find(prepped_next[2])
                         if prepped_next else None)
            next_sub = (submit_prep(prepped_next[3])
                        if prepped_next else None)
            matches = overlapper.collect_find(queries, futs)
            query_results = [[] for _ in range(num_query_seqs)]
            hits = 0
            for m in matches:
                query_results[m.query_id].append(m)
                hits += 1
            q_hits = sum(1 for r in query_results if len(r) > 1)
            print(f"Total {hits} hits across {q_hits} overlaps.",
                  file=sys.stderr)
            # final checks: the whole round runs in ONE native C++ call
            # when the toolchain is available (seqscan.cpp
            # final_check_round — bit-identical to the Python
            # build_consensus path by parity test; ~6 ms/check of
            # Python was the GB-scale CLI's dominant host cost).
            # Python fallback otherwise (thread pools measured 1.6x
            # SLOWER on this GIL-bound work, so it stays sequential).
            work = [r for r in query_results if len(r) > 1]
            done = self._final_checks_native(work, index, seq_set,
                                             overlap_size)
            if not done:
                for results in work:
                    self._final_check(results, index, seq_set,
                                      overlap_size)
            first_sequence = next_first
            round_no += 1
            if ckpt:
                seq_set.save_state(ckpt,
                                   {"first_sequence": first_sequence,
                                    "round": round_no})
            if (prepped_next is not None
                    and sum(seq_set.ignore) != snap):
                # a round ignored reads since the speculative prep was
                # submitted: it saw stale flags — discard and redo it
                # (and requeue the following prep, whose start sequence
                # may have moved with the redone query set)
                prepped_next = prep_round(sub_first)
                futs_next = (prepped_next[1].dispatch_find(
                    prepped_next[2]) if prepped_next else None)
                next_sub = (submit_prep(prepped_next[3])
                            if prepped_next else None)
            prepped, futs = prepped_next, futs_next
        ex.shutdown(wait=False)

    def _final_checks_native(self, work, index, seq_set, overlap_size):
        """Run a round's final checks through the native
        ``final_check_round``; returns False (caller falls back to the
        Python path) when the toolchain or a complete RC seed mapping is
        unavailable."""
        import os
        if not work or os.environ.get("DOWNPORE_TPU_PY_FINAL") == "1":
            return False
        from .. import native
        if native.load() is None:
            return False
        import numpy as np
        from ..core.sequence import kmer_reverse_complement_vec
        k = index.k
        km = index.seed_kmers_of(np.arange(index.num_seeds))
        rc_lut = index.kmer_map[
            kmer_reverse_complement_vec(km, k)].astype(np.int32)
        if rc_lut.size and rc_lut.min() < 0:
            return False          # partial RC twin set: python path
        uniq = []
        seen = set()
        for ms in work:
            for m in ms:
                for s in (m.seq_a, m.seq_b):
                    if id(s) not in seen:
                        seen.add(id(s))
                        uniq.append(s)
        table, ids = native.marshal_seq_table(uniq)
        recs = native.final_check_round(work, table, ids, rc_lut, k)
        if recs is None:
            return False
        for rows in recs:
            if len(rows) <= 1:
                continue
            id0, rc0, off0, len0, seqlen0, _ = rows[0]
            if seqlen0 <= overlap_size * 2:
                seq_set.set_ignore(id0, True)
            for pid in range(1, len(rows)):
                pi, rci, start, length, seq_len, ident = rows[pid]
                rc = "-" if rci != rc0 else "+"
                end = start + length
                covered = max(overlap_size, end - start)
                if seq_len * 9 <= covered * 10:
                    seq_set.set_ignore(pi, True)
                print(f"{seq_set.get_name(id0)}\t{seqlen0}\t{off0}\t"
                      f"{off0 + len0}\t{rc}\t{seq_set.get_name(pi)}\t"
                      f"{seq_len}\t{start}\t{end}\t{ident}\t0\t255")
        return True

    def _final_check(self, results, index, seq_set, overlap_size):
        """PAF emission + full-coverage ignore
        (ref: commands/overlap.go:197-233)."""
        lines, ignores = self._final_check_compute(results, index,
                                                   seq_set, overlap_size)
        for sid in ignores:
            seq_set.set_ignore(sid, True)
        for ln in lines:
            print(ln)

    def _final_check_compute(self, results, index, seq_set, overlap_size):
        """Side-effect-free final check: returns (PAF lines, read ids to
        ignore) so a worker pool can run checks concurrently."""
        from ..overlap import build_consensus
        k = index.k
        lines = []
        ignores = []
        contig = build_consensus(index, results)
        if contig is None or len(contig.parts) <= 1:
            return lines, ignores
        if contig.seq_lengths[0] <= overlap_size * 2:
            ignores.append(contig.parts[0])
        query_start = contig.offsets[0]
        query_end = query_start + contig.lengths[0]
        for i, part in enumerate(contig.parts[1:]):
            pid = i + 1
            rc = "+"
            start = contig.offsets[pid]
            end = start + contig.lengths[pid]
            if contig.reverse_complement[0] != contig.reverse_complement[pid]:
                rc = "-"
            covered = max(overlap_size, end - start)
            if contig.seq_lengths[pid] * 9 <= covered * 10:
                ignores.append(part)
            ident, _ = contig.matches[i].bases_covered(k)
            lines.append(
                f"{seq_set.get_name(contig.parts[0])}\t"
                f"{contig.seq_lengths[0]}\t{query_start}\t{query_end}\t"
                f"{rc}\t{seq_set.get_name(part)}\t"
                f"{contig.seq_lengths[pid]}\t{start}\t{end}\t{ident}\t"
                f"0\t255")
        return lines, ignores
