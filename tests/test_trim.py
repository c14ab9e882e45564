"""End-to-end trimmer tests on synthetic reads with planted adapters."""
import io
import numpy as np
import pytest

from downpore_tpu.core import Sequence
from downpore_tpu.io import SequenceSet
from downpore_tpu.trim import Trimmer

RNG = np.random.default_rng(123)
BASES = "ACGT"

# two real ONT adapters from the bundled set
FRONT_AD = ("SQK-NSK007-Y", "AATGTACTTCGTTCAGTTACGTATTGCT")
BACK_AD = ("SQK-NSK007-Y", "GCAATACGTAACTGAACGAAGT")


def rand_bases(n, rng=RNG):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def mutate(s, rate, rng=RNG):
    codes = np.frombuffer(s.encode(), dtype=np.uint8).copy()
    lut = {65: "CGT", 67: "AGT", 71: "ACT", 84: "ACG"}
    for i in range(len(codes)):
        if rng.random() < rate:
            codes[i] = ord(lut[codes[i]][rng.integers(0, 3)])
    return codes.tobytes().decode()


def make_trimmer(**kw):
    fronts = [Sequence.from_string(FRONT_AD[1], id=0, name=FRONT_AD[0])]
    backs = [Sequence.from_string(BACK_AD[1], id=0, name=BACK_AD[0])]
    t = Trimmer(fronts, backs, k=6, verbosity=0)
    return t


@pytest.fixture
def reads_file(tmp_path):
    """Reads: 0 = adapter front+back, 1 = clean, 2 = mid-adapter (split),
    3 = front adapter only."""
    reads = []
    core0 = rand_bases(800)
    reads.append(FRONT_AD[1] + core0 + BACK_AD[1])
    reads.append(rand_bases(900))
    left, right = rand_bases(1200), rand_bases(1300)
    reads.append(left + FRONT_AD[1] + right)
    reads.append(FRONT_AD[1] + rand_bases(700))
    p = tmp_path / "reads.fasta"
    with open(p, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i}\n{r}\n")
    return str(p), reads, len(left)


def test_edge_trim(reads_file):
    path, reads, _ = reads_file
    ss = SequenceSet(path, min_length=50)
    t = make_trimmer()
    t.set_trim_params(85, 5, 50, 1000, True, False, False)
    t.trim(ss)
    # read 0: both adapters trimmed.  The reference's trim extent formula
    # is start-of-last-matched-seed + adapter remainder, which leaves up to
    # k-1 adapter bases behind before extra_end_trim (trim/trim.go:397-398)
    ft, bt = ss.get_front_trim(0), ss.get_back_trim(0)
    assert ft >= len(FRONT_AD[1]) - 6 + 5
    assert ft <= len(FRONT_AD[1]) + 12
    assert bt >= len(BACK_AD[1]) - 6 + 5 and bt <= len(BACK_AD[1]) + 12
    # read 1: untouched
    assert ss.get_front_trim(1) == 0 and ss.get_back_trim(1) == 0
    # read 3: front trimmed, back untouched
    assert ss.get_front_trim(3) >= len(FRONT_AD[1]) - 6 + 5
    assert ss.get_back_trim(3) == 0


def test_middle_split(reads_file):
    path, reads, left_len = reads_file
    ss = SequenceSet(path, min_length=50)
    t = make_trimmer()
    t.set_trim_params(85, 5, 50, 1000, True, False, False)
    t.trim(ss)
    # read 2 must be split: ignored, two extras appended
    assert ss.ignore[2]
    out = io.StringIO()
    ss.write(out)
    text = out.getvalue()
    assert "read2_(left)" in text and "read2_(right)" in text
    # the left part should end before the adapter, right after it
    lines = text.splitlines()
    for i, line in enumerate(lines):
        if line == ">read2_(left)":
            assert FRONT_AD[1] not in lines[i + 1]
            assert len(lines[i + 1]) <= left_len
        if line == ">read2_(right)":
            assert FRONT_AD[1] not in lines[i + 1]


def test_mutated_adapters_still_found(tmp_path):
    """Adapters with 10% errors (nanopore-like) should still be trimmed."""
    rng = np.random.default_rng(77)
    p = tmp_path / "mut.fasta"
    n_found = 0
    with open(p, "w") as f:
        for i in range(20):
            ad = mutate(FRONT_AD[1], 0.1, rng)
            f.write(f">r{i}\n{ad + rand_bases(600, rng)}\n")
    ss = SequenceSet(str(p), min_length=50)
    t = make_trimmer()
    t.set_trim_params(85, 5, 50, 1000, True, False, False)
    t.trim(ss)
    found = sum(1 for i in range(20) if ss.get_front_trim(i) > 0)
    assert found >= 15  # most mutated adapters located


def test_no_false_positives(tmp_path):
    """Clean random reads should be left alone."""
    rng = np.random.default_rng(88)
    p = tmp_path / "clean.fasta"
    with open(p, "w") as f:
        for i in range(20):
            f.write(f">r{i}\n{rand_bases(800, rng)}\n")
    ss = SequenceSet(str(p), min_length=50)
    t = make_trimmer()
    t.set_trim_params(85, 5, 50, 1000, True, False, False)
    t.trim(ss)
    trimmed = sum(1 for i in range(20)
                  if ss.get_front_trim(i) > 0 or ss.get_back_trim(i) > 0)
    assert trimmed <= 2  # the occasional chance 3-seed chain is tolerable
    assert not any(ss.ignore)


def test_require_pairs(tmp_path):
    """require_pairs drops unpaired adapter identifications (still trims)."""
    p = tmp_path / "p.fasta"
    with open(p, "w") as f:
        # front adapter only; pair requires the back too
        f.write(f">r0\n{FRONT_AD[1] + rand_bases(700)}\n")
    ss = SequenceSet(str(p), min_length=50)
    t = make_trimmer()
    t.set_trim_params(85, 5, 50, 1000, True, True, True)
    t.trim(ss)
    # name must NOT be tagged (adapter match was disabled)
    assert ss.get_name(0) == "r0"


def test_determine_adapters(tmp_path):
    from downpore_tpu.data import FRONT_ADAPTERS, BACK_ADAPTERS
    rng = np.random.default_rng(3)
    p = tmp_path / "d.fasta"
    with open(p, "w") as f:
        for i in range(30):
            f.write(f">r{i}\n{FRONT_AD[1] + rand_bases(600, rng)}\n")
    ss = SequenceSet(str(p), min_length=50)
    fronts = [Sequence.from_string(s, id=i, name=n)
              for i, (n, s) in enumerate(FRONT_ADAPTERS[:20])]
    backs = [Sequence.from_string(s, id=i, name=n)
             for i, (n, s) in enumerate(BACK_ADAPTERS[:20])]
    t = Trimmer(fronts, backs, k=6, verbosity=0)
    t.determine_adapters(ss, 30, 90)
    names = [a.get_name() for a in t.original_front]
    assert FRONT_AD[0] in names
    assert len(names) < 20  # absent adapters dropped


def test_pair_budget_compaction_matches_full():
    """Budgeted (compacted) fused match returns identical rows to the
    full path, including the transparent fallback when the budget
    overflows."""
    t = make_trimmer()
    eng = t._engine()
    W = t.WINDOW - t.k + 1
    rng = np.random.default_rng(9)
    windows = []
    # half the windows contain the adapter (gate passes), half random
    for i in range(64):
        core = rand_bases(200, rng)
        s = (FRONT_AD[1] + core) if i % 2 == 0 else rand_bases(230, rng)
        windows.append(Sequence.from_string(s[:W + t.k - 1], id=i))
    gm = np.array([1], np.int32)   # permissive gate: many pairs pass
    cm = np.array([3], np.int32)

    def rows_with(budget):
        return eng.match_collect(eng.match_dispatch(
            windows, True, gm, cm, W, pair_budget=budget))

    full = rows_with(0)
    compact = rows_with(4096)      # budget >= passing pairs
    tiny = rows_with(8)            # overflow -> transparent fallback
    def norm(rows):
        return [[(ai, {k: np.asarray(v).tolist() for k, v in s.items()})
                 for ai, s in row] for row in rows]
    assert norm(full) == norm(compact)
    assert norm(full) == norm(tiny)
    assert any(len(r) for r in full)  # the adapter windows matched
