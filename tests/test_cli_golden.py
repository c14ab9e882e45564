"""Golden CLI runs for every command (the reference's behavioural surface
is its CLI, ref: downpore.go:53-92).  Each test drives
``downpore_tpu.cli.main`` end-to-end on a synthetic fixture and pins the
stdout contract: PAF fields against planted truth for map/overlap, the
4-line consensus block, MSA rows for align, trained k-mer files for
kmers, exact subsequence service replies for subseq, corrected fasta for
correct.  trim's golden test lives in test_trim_golden.py."""
from __future__ import annotations

import io
import os

import numpy as np
import pytest

from downpore_tpu.cli.main import main

BASES = "ACGT"


def _rand(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def _mutate(rng, s, rate):
    out = []
    for c in s:
        r = rng.random()
        if r < rate * 0.5:
            continue                       # deletion
        if r < rate * 0.75:
            out.append(BASES[rng.integers(0, 4)])  # mismatch
        elif r < rate:
            out.append(c)
            out.append(BASES[rng.integers(0, 4)])  # insertion
        else:
            out.append(c)
    return "".join(out)


_RC = str.maketrans("ACGT", "TGCA")


def _run(capsys, argv):
    main(argv)
    return capsys.readouterr().out


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(11)
    return _rand(rng, 30000)


@pytest.fixture(scope="module")
def genome_fasta(genome, tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "genome.fasta"
    p.write_text(f">genome\n{genome}\n")
    return str(p)


def test_version_golden(capsys):
    out = _run(capsys, ["version"])
    assert out.startswith("downpore-tpu version ")
    assert "capabilities of downpore 0.4.0" in out


def test_help_golden(capsys):
    out = _run(capsys, ["help", "map"])
    # flag table: every flag present with its default
    for flag, default in (("-input", ""), ("-reference", ""),
                          ("-circular", "true"), ("-k", "11")):
        assert any(l.strip().startswith(flag) and
                   f"(default:{default})" in l
                   for l in out.splitlines()), flag


def test_map_cli_golden(capsys, tmp_path, genome, genome_fasta):
    rng = np.random.default_rng(12)
    reads = tmp_path / "reads.fasta"
    planted = {}
    with open(reads, "w") as f:
        for i in range(24):
            pos = int(rng.integers(0, len(genome) - 2000))
            s = _mutate(rng, genome[pos:pos + 2000], 0.03)
            if i % 3 == 2:                # every third read maps RC
                s = s.translate(_RC)[::-1]
            planted[f"r{i}"] = (pos, i % 3 == 2)
            f.write(f">r{i}\n{s}\n")
    out = _run(capsys, ["map", "-input", str(reads),
                        "-reference", genome_fasta, "-circular", "false"])
    lines = [l.split("\t") for l in out.splitlines() if "\t" in l]
    assert lines, out
    seen = {}
    for t in lines:
        # PAF contract (ref: mapping/mapping.go:112-122): 12 columns,
        # query name/len, strand, target genome, coordinates, mapq 255
        assert len(t) == 12 and t[5] == "genome" and t[11] == "255"
        assert int(t[6]) == len(genome)
        seen.setdefault(t[0], t)
    # every read recovered at its planted position (+- chunk slack)
    assert len(seen) == len(planted)
    for name, (pos, rc) in planted.items():
        t = seen[name]
        assert t[4] == ("-" if rc else "+"), name
        assert abs(int(t[7]) - pos) < 250, (name, t[7], pos)


@pytest.fixture(scope="module")
def overlap_reads(tmp_path_factory):
    """48 reads of 2.5-5 kb sampled from a 40 kb genome at ~2% error,
    planted positions encoded in the read names.  Dense enough for the
    reference's edges-only round querying to find real overlaps (sparse
    tilings starve the exact k=10 seed sharing — faithful behaviour)."""
    rng = np.random.default_rng(22)
    G = 40000
    genome = _rand(rng, G)
    p = tmp_path_factory.mktemp("cli_ov") / "reads.fasta"
    truth = {}
    with open(p, "w") as f:
        for i in range(48):
            L = int(rng.integers(2500, 5000))
            pos = int(rng.integers(0, G - L))
            name = f"cr{i}.{pos}.{pos + L}"
            truth[name] = (pos, pos + L)
            f.write(f">{name}\n{_mutate(rng, genome[pos:pos + L], 0.02)}\n")
    return str(p), truth


def test_overlap_cli_golden(capsys, overlap_reads):
    path, truth = overlap_reads
    out = _run(capsys, ["overlap", "-input", path])
    lines = [l.split("\t") for l in out.splitlines() if "\t" in l]
    assert lines
    good = total = 0
    pairs = set()
    for t in lines:
        assert len(t) == 12 and t[11].strip() == "255"
        (qs, qe), (ts, te) = truth[t[0]], truth[t[5]]
        total += 1
        if min(qe, te) - max(qs, ts) > 300:   # genuinely overlapping pair
            good += 1
        pairs.add(tuple(sorted((t[0], t[5]))))
    # precision: nearly all reported overlaps are planted ones
    # (0.99 measured; margin below)
    assert good / total > 0.9, (good, total)
    # recall over planted pairs sharing >= 1 kb: the reference's round
    # design queries read edges only, so interior-only overlaps are
    # legitimately missed (~0.45 measured at 4% error; margin below)
    names = list(truth)
    want = set()
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            (qs, qe), (ts, te) = truth[a], truth[b]
            if min(qe, te) - max(qs, ts) >= 1000:
                want.add(tuple(sorted((a, b))))
    assert len(want & pairs) / len(want) > 0.35, len(want & pairs)


def test_correct_cli_golden(capsys, overlap_reads):
    path, truth = overlap_reads
    out = _run(capsys, ["correct", "-input", path])
    lines = out.splitlines()
    names = [l[1:] for l in lines if l.startswith(">")]
    seqs = [l for l in lines if l and not l.startswith(">")]
    # the reference clamps to the longest read as the sole query
    # (correct.go:72-89); its windows yield a handful of consensus seqs
    assert names and len(names) == len(seqs)
    for s in seqs:
        assert set(s) <= set("ACGT")
        assert len(s) > 300


@pytest.fixture(scope="module")
def consensus_input(tmp_path_factory):
    rng = np.random.default_rng(14)
    template = _rand(rng, 300)
    p = tmp_path_factory.mktemp("cli_cons") / "copies.fasta"
    with open(p, "w") as f:
        for i in range(8):
            f.write(f">c{i}\n{_mutate(rng, template, 0.03)}\n")
    return str(p), template


def test_consensus_cli_golden(capsys, consensus_input):
    path, template = consensus_input
    out = _run(capsys, ["consensus", "-input", path, "-k", "5"])
    lines = out.splitlines()
    # contract: consensus sequence + 3 quality strings
    # (ref: commands/consensus.go:60-100); quality strings carry a k-dot
    # prefix so they run one char past the consensus
    assert len(lines) == 4
    cons, costs, votes, space = lines
    assert len(costs) == len(votes) == len(space)
    assert abs(len(cons) - len(costs)) <= 1
    assert set(cons) <= set("ACGT")
    assert costs[:5] == "....." and set(costs[5:]) <= set("0123456789")
    # consensus is near the template: shared 10-mers >> chance
    tset = {template[i:i + 10] for i in range(len(template) - 9)}
    hits = sum(1 for i in range(len(cons) - 9) if cons[i:i + 10] in tset)
    assert hits > 0.8 * (len(cons) - 9), hits


def test_align_cli_golden(capsys, consensus_input):
    path, template = consensus_input
    out = _run(capsys, ["align", "-input", path, "-k", "5"])
    lines = [l for l in out.splitlines() if l]
    # consensus path row + one MSA row per input sequence
    # (ref: commands/align.go:100-190; '.' marks stays/gaps)
    assert len(lines) == 9
    for l in lines:
        assert set(l) <= set("ACGT."), set(l)
        assert len(l) > 250
    # rows align: all widths within a few columns of the path row
    assert max(len(l) for l in lines) - min(len(l) for l in lines) <= 8


def test_kmers_cli_golden(capsys, tmp_path, genome, genome_fasta):
    rng = np.random.default_rng(15)
    reads = tmp_path / "kreads.fastq"
    sam = tmp_path / "kreads.sam"
    with open(reads, "w") as fr, open(sam, "w") as fs:
        fs.write("@HD\tVN:1.6\n")
        for i in range(20):
            pos = int(rng.integers(0, len(genome) - 600))
            s = genome[pos:pos + 600]
            fr.write(f"@kr{i}\n{s}\n+\n{'F' * len(s)}\n")
            fs.write(f"kr{i}\t0\tgenome\t{pos + 1}\t60\t600M\t*\t0\t0"
                     f"\t{s}\t{'F' * len(s)}\n")
    out = _run(capsys, ["kmers", "-input", str(reads),
                        "-alignment", str(sam),
                        "-reference", genome_fasta, "-k", "4"])
    base = str(sam)
    # heatmaps + trained seed values written next to the alignment
    for suffix in ("lex", "qual", "bal", "kmers"):
        assert os.path.exists(f"{base}_{suffix}_4.txt"), suffix
    vals = {}
    with open(f"{base}_kmers_4.txt") as f:
        for line in f:
            km, v = line.split()
            assert len(km) == 4 and set(km) <= set("ACGT")
            vals[km] = float(v)
    # perfect alignments: a healthy share of the 256 4-mers trained
    assert len(vals) > 150, len(vals)


def test_subseq_cli_golden(capsys, monkeypatch, tmp_path):
    rng = np.random.default_rng(16)
    s0 = _rand(rng, 500)
    s1 = _rand(rng, 400)
    p = tmp_path / "subs.fasta"
    p.write_text(f">alpha one\n{s0}\n>beta\n{s1}\n")
    monkeypatch.setattr("sys.stdin", io.StringIO(
        "10 20 false alpha\n"
        "10 20 true alpha\n"
        "390 10 false alpha\n"     # circular wrap
        "0 5 false beta\n"
        "0 5 false gamma\n"))      # unknown name
    out = _run(capsys, ["subseq", "-input", str(p)])
    expect_rc = s0[10:20].translate(_RC)[::-1]
    assert out.splitlines() == [
        ">alpha one_10", s0[10:20],
        ">alpha one_10", expect_rc,
        ">alpha one_390", s0[390:] + s0[:10],
        ">beta_0", s1[:5],
        f"gamma not found in {p}",
        "No sequence found.",
    ]


def test_overlap_checkpoint_resume(capsys, overlap_reads, tmp_path,
                                   monkeypatch):
    """An interrupted multi-round overlap run resumed via -checkpoint
    must produce the full run's stdout exactly (round-boundary snapshots;
    the pipelined round driver speculates the next round's prep, so this
    also pins the speculation/redo path)."""
    path, _ = overlap_reads
    ck = str(tmp_path / "ck.json")
    # full run, multi-round (small query batches force >= 3 rounds)
    argv = ["overlap", "-input", path, "-query_batch_size", "12"]
    full = _run(capsys, argv)
    assert full.count("\n") > 0

    # interrupted run: die right after the FIRST round's checkpoint save
    from downpore_tpu.io import seqio as seqio_mod
    orig_save = seqio_mod.SequenceSet.save_state
    calls = {"n": 0}

    def save_then_die(self, path_, extra=None):
        orig_save(self, path_, extra)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt

    monkeypatch.setattr(seqio_mod.SequenceSet, "save_state", save_then_die)
    with pytest.raises(KeyboardInterrupt):
        main(argv + ["-checkpoint", ck])
    part1 = capsys.readouterr().out
    monkeypatch.setattr(seqio_mod.SequenceSet, "save_state", orig_save)

    # resume and finish
    part2 = _run(capsys, argv + ["-checkpoint", ck])
    assert part1 + part2 == full
