"""Pileup cleanup, overlap graph and format reader tests."""
import io
import numpy as np
import pytest

from downpore_tpu.overlap.combine import SeedContig
from downpore_tpu.overlap.graph import OverlapGraph
from downpore_tpu.overlap.pileup import new_pileup, cleanup_overlaps
from downpore_tpu.seeds.seed_sequence import SeedSequence, SeedMatch
from downpore_tpu.core import Sequence
from downpore_tpu.io.formats import Cigar, load_paf, load_sam


def make_contig(parts, offsets, lengths, seq_lengths, combined_len=500,
                rcs=None):
    combined = SeedSequence.from_segments([0, 1, combined_len - 20, 2, 0],
                                          k=10)
    combined.length = combined_len
    return SeedContig(combined, list(parts),
                      list(rcs) if rcs else [False] * len(parts),
                      list(offsets), list(lengths), [False] * len(parts),
                      list(seq_lengths), None)


def test_pileup_layout():
    # three contigs walking along a query; parts are read ids
    c0 = make_contig([1, 2, 3], [100, 300, 0], [500, 500, 500],
                     [4000, 4000, 4000])
    c1 = make_contig([2, 3, 4], [900, 600, 50], [500, 500, 500],
                     [4000, 4000, 4000])
    c2 = make_contig([3, 4, 5], [1200, 650, 10], [500, 500, 500],
                     [4000, 4000, 4000])
    pile = new_pileup([c0, c1, c2])
    assert len(pile) == 5
    # starts must be sorted
    assert pile.starts == sorted(pile.starts)
    ms = pile.members_at(pile.starts[0] + 1)
    assert len(ms) >= 1


def _match(query_id, target_id, rc=False, a_off=0, b_off=0):
    k = 10
    qa = SeedSequence(np.array([0, 20, 0], np.int32),
                      np.array([5, 6], np.int32), id=query_id)
    qa.length = 40
    qa.offset = a_off
    qb = SeedSequence(np.array([0, 20, 0], np.int32),
                      np.array([5, 6], np.int32), id=target_id)
    qb.length = 40
    qb.offset = b_off
    m = SeedMatch([0, 1], [0, 1], qa, qb, query_id=query_id, rc_query=rc)
    return m


def test_cleanup_overlaps_removes_off_diagonal():
    # sequence 7 appears in 3 chunks; one hit is far off the diagonal
    ovs = [
        [_match(0, 7, b_off=0)],
        [_match(0, 7, b_off=3000)],   # inconsistent diagonal
        [_match(0, 7, b_off=120)],
    ]
    # query offsets advance chunk by chunk
    ovs[0][0].seq_a.offset = 0
    ovs[1][0].seq_a.offset = 100
    ovs[2][0].seq_a.offset = 200
    cleanup_overlaps(ovs, overlap_size=1000, k=10)
    remaining = sum(len(o) for o in ovs)
    assert remaining < 3  # the off-diagonal hit was dropped


def test_overlap_graph_arcs_and_gfa():
    g = OverlapGraph(10)
    cons = Sequence.from_string("ACGT" * 100)
    # two contigs sharing read 3, non-overlapping along it
    c0 = make_contig([1, 3], [0, 100], [400, 400], [3000, 3000])
    c1 = make_contig([3, 4], [900, 0], [400, 400], [3000, 3000])
    n0 = g.add_node(c0, cons)
    n1 = g.add_node(c1, cons)
    g.generate_arcs()
    assert len(n0.out_arcs) == 1
    assert n0.out_arcs[0].to is n1
    assert n0.out_arcs[0].length == 900 - 500
    # colours propagate
    assert n0.colour != 0 and n1.colour != 0
    gfa = g.gfa()
    assert gfa.startswith("H\tVN:Z:1.0")
    assert gfa.count("\nS\t") == 2
    assert gfa.count("\nL\t") == 1


def test_graph_bridgable_contigs():
    g = OverlapGraph(10)
    cons = Sequence.from_string("ACGT" * 100)
    shared = [1, 2, 5]
    c0 = make_contig(shared, [0, 10, 20], [400, 400, 400],
                     [5000, 5000, 5000])
    c1 = make_contig(shared, [2000, 2010, 2020], [400, 400, 400],
                     [5000, 5000, 5000])
    g.add_node(c0, cons)
    g.add_node(c1, cons)
    bridges = g.get_bridgable_contigs(min_coverage=2)
    assert len(bridges) == 1
    b = bridges[0]
    assert sorted(b.parts) == shared
    # bridge spans the gap between the contigs, with 20-base buffers
    assert b.offsets[0] == 400 - 20
    # length = right offset - bridge offset + 2*buffer (graph.go:502-503)
    assert b.lengths[0] == 2000 - 380 + 40


def test_cigar_ops():
    c = Cigar("5S10M2I3M4D8M")
    assert c.count_matches(5) == (10 - 4) + 0 + (8 - 4)
    a, b = c.length()
    assert a == 5 + 10 + 2 + 3 + 8
    assert b == 10 + 3 + 4 + 8
    pairs = list(c.kmer_matches(10))
    assert pairs[0] == (5, 0)


def test_paf_sam_readers(tmp_path):
    paf = tmp_path / "t.paf"
    paf.write_text("q1\t1000\t10\t900\t+\tt1\t5000\t100\t1000\t800\t890\t"
                   "255\nshort\tline\n")
    recs = list(load_paf(str(paf)))
    assert len(recs) == 1
    r = recs[0]
    assert r.name_a == "q1" and r.name_b == "t1"
    assert not r.reverse_complement
    assert r.matches == 800

    sam = tmp_path / "t.sam"
    sam.write_text("@HD\tVN:1.6\nr1\t16\tref\t101\t60\t50M\t*\t0\t0\tACGT\t"
                   "IIII\nr2\t0\tref\t1\t60\t*\t*\t0\t0\tACGT\tIIII\n")
    recs = list(load_sam(str(sam)))
    assert len(recs) == 1
    assert recs[0].reverse_complement
    assert recs[0].start_b == 100
