"""SequenceSet streaming I/O tests (trims, ignore, extras, gzip, demux)."""
import gzip
import io
import os

import numpy as np
import pytest

from downpore_tpu.io import SequenceSet

FASTA = """>read1
ACGTACGTACGTACGTACGT
>read2 with description
TTTTGGGGCCCCAAAATTTT
>short
ACG
>read3
ACGTGTGTACATACGGATTA
"""

FASTQ = """@r1
ACGTACGTAC
+
IIIIIIIIII
@r2
TTTTGGGGCC
+
!!!!!!!!!!
"""


@pytest.fixture
def fasta_file(tmp_path):
    p = tmp_path / "t.fasta"
    p.write_text(FASTA)
    return str(p)


@pytest.fixture
def fastq_file(tmp_path):
    p = tmp_path / "t.fastq"
    p.write_text(FASTQ)
    return str(p)


def test_read_fasta(fasta_file):
    ss = SequenceSet(fasta_file)
    seqs = list(ss.get_sequences())
    assert [str(s) for s in seqs] == [
        "ACGTACGTACGTACGTACGT", "TTTTGGGGCCCCAAAATTTT", "ACG",
        "ACGTGTGTACATACGGATTA"]
    assert ss.get_name(0) == "read1"
    assert ss.get_name(1) == "read2 with description"
    assert ss.size == 4
    assert ss.get_bases() == 63


def test_min_length_filter(fasta_file):
    ss = SequenceSet(fasta_file, min_length=10)
    assert [str(s) for s in ss.get_sequences()] == [
        "ACGTACGTACGTACGTACGT", "TTTTGGGGCCCCAAAATTTT", "ACGTGTGTACATACGGATTA"]


def test_multiline_fasta(tmp_path):
    p = tmp_path / "ml.fasta"
    p.write_text(">chr1\nACGTACGTAC\nGTACGTACGT\nACGT\n>chr2\nTTTT\n")
    ss = SequenceSet(str(p))
    seqs = list(ss.get_sequences())
    assert str(seqs[0]) == "ACGTACGTACGTACGTACGTACGT"
    assert str(seqs[1]) == "TTTT"


def test_trims_applied_on_reread(fasta_file):
    ss = SequenceSet(fasta_file)
    list(ss.get_sequences())
    ss.set_front_trim(0, 4)
    ss.set_back_trim(0, 8)
    ss.set_ignore(2, True)
    seqs = list(ss.get_sequences())
    assert str(seqs[0]) == "ACGTACGT"
    assert seqs[0].offset == 4 and seqs[0].inset == 8
    assert [s.id for s in seqs] == [0, 1, 3]
    assert ss.get_length(0) == 8
    # increasing a trim re-applies relative to the original read
    ss.set_front_trim(0, 6)
    seqs = list(ss.get_sequences())
    assert str(seqs[0]) == "GTACGT"


def test_fastq_quality(fastq_file):
    ss = SequenceSet(fastq_file)
    seqs = list(ss.get_sequences())
    assert ss.is_fastq
    assert np.all(seqs[0].quality == ord("I") - 33)
    assert np.all(seqs[1].quality == 0)
    assert ss.get_median_quality(0) == ord("I") - 33


def test_fastq_trim_quality(fastq_file):
    ss = SequenceSet(fastq_file)
    ss._build_index()
    ss.set_front_trim(0, 2)
    seqs = list(ss.get_sequences())
    assert len(seqs[0].quality) == 8


def test_gzip_input(tmp_path):
    p = tmp_path / "t.fasta.gz"
    with gzip.open(p, "wt") as f:
        f.write(FASTA)
    ss = SequenceSet(str(p))
    assert [str(s) for s in ss.get_sequences()][0] == "ACGTACGTACGTACGTACGT"


def test_extras_appear_after_file(fasta_file):
    from downpore_tpu.core import Sequence
    ss = SequenceSet(fasta_file)
    list(ss.get_sequences())
    ss.add_sequence(Sequence.from_string("GGGG"), "extra1")
    seqs = list(ss.get_sequences())
    assert str(seqs[-1]) == "GGGG"
    assert seqs[-1].id == 4
    assert ss.get_name(4) == "extra1"
    # split semantics: ignore original, keep halves
    ss.set_ignore(4, True)
    assert len(list(ss.get_sequences())) == 4


def test_write_roundtrip(fasta_file):
    ss = SequenceSet(fasta_file)
    ss._build_index()
    ss.set_front_trim(0, 4)
    out = io.StringIO()
    ss.write(out)
    lines = out.getvalue().splitlines()
    assert lines[0] == ">read1"
    assert lines[1] == "ACGTACGTACGTACGTACGT"[4:]


def test_fastq_write_roundtrip(fastq_file):
    ss = SequenceSet(fastq_file)
    out = io.StringIO()
    ss.write(out)
    assert out.getvalue() == FASTQ


def test_get_ids_by_length(fasta_file):
    ss = SequenceSet(fasta_file)
    ids, lengths = ss.get_ids_by_length()
    assert lengths == sorted(lengths)
    assert ids[0] == 2  # the 3-base read


def test_get_sequences_by_id(fasta_file):
    ss = SequenceSet(fasta_file)
    ss._build_index()
    got = [s.id for s in ss.get_sequences_by_id([1, 3])]
    assert got == [1, 3]
    # ignore state restored
    assert [s.id for s in ss.get_sequences()] == [0, 1, 2, 3]


def test_demultiplex(tmp_path, fasta_file):
    ss = SequenceSet(fasta_file)
    ss._build_index()
    ss.set_name(0, "Barcode01_read1")
    ss.set_name(2, "Barcode02_short")
    out = tmp_path / "demux"
    out.mkdir()
    ss.demultiplex(str(out))
    files = sorted(os.listdir(out))
    assert files == ["Barcode01.fasta", "Barcode02.fasta"]
    content = (out / "Barcode01.fasta").read_text()
    assert content == ">read1\nACGTACGTACGTACGTACGT\n"


def test_checkpoint_save_load_roundtrip(tmp_path):
    """save_state/load_state restores trims, ignores, renames and split
    extras; a mismatched input file is refused."""
    from downpore_tpu.core import Sequence
    p = tmp_path / "reads.fasta"
    with open(p, "w") as f:
        for i in range(4):
            f.write(f">r{i}\n{'ACGT' * 50}\n")
    ss = SequenceSet(str(p))
    assert ss.size == 4                       # builds the index
    ss.set_front_trim(0, 10)
    ss.set_back_trim(1, 7)
    ss.set_ignore(2, True)
    ss.set_name(3, "renamed")
    ss.add_sequence(Sequence.from_string("ACGTACGTACGT", id=4), "half")
    ck = str(tmp_path / "state.json")
    ss.save_state(ck, {"next_rid": 2})

    ss2 = SequenceSet(str(p))
    progress = ss2.load_state(ck)
    assert progress == {"next_rid": 2}
    out = {s.id: s for s in ss2.get_sequences()}
    assert 2 not in out                       # ignore restored
    assert len(out[0]) == 190                 # front trim applied
    assert len(out[1]) == 193                 # back trim applied
    assert ss2.get_name(3) == "renamed"
    assert str(out[4]) == "ACGTACGTACGT"      # extra restored
    assert ss2.get_name(4) == "half"

    other = tmp_path / "other.fasta"
    other.write_text(">x\nACGT\n")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        SequenceSet(str(other)).load_state(ck)


def test_trim_checkpoint_resume(tmp_path):
    """A trim interrupted after the edge pass resumes into an identical
    final output."""
    import io as _io
    import numpy as np
    from downpore_tpu.trim.trimmer import load_trimmer
    rng = np.random.default_rng(4)
    front = "AATGTACTTCGTTCAGTTACGTATTGCT"
    p = tmp_path / "reads.fastq"
    with open(p, "w") as f:
        for i in range(12):
            core = "".join("ACGT"[j] for j in rng.integers(0, 4, 700))
            r = front + core
            f.write(f"@read{i}\n{r}\n+\n{'I' * len(r)}\n")

    def run(checkpoint=None, interrupt=False):
        t = load_trimmer("", "", 6, verbosity=0)
        ss = SequenceSet(str(p), min_length=50)
        if interrupt:
            # stop right after the edge pass by making the middle pass
            # raise once
            orig = type(t)._middle_pass
            def boom(self, seqs, **kw):
                raise KeyboardInterrupt
            type(t)._middle_pass = boom
            try:
                t.trim(ss, batch_size=4, checkpoint=checkpoint)
            except KeyboardInterrupt:
                pass
            finally:
                type(t)._middle_pass = orig
            return None
        t.trim(ss, batch_size=4, checkpoint=checkpoint)
        out = _io.StringIO()
        ss.write(out, True)
        return out.getvalue()

    expected = run()
    ck = str(tmp_path / "trim.json")
    run(checkpoint=ck, interrupt=True)       # edge pass only, then die
    resumed = run(checkpoint=ck)             # fresh process resumes
    assert resumed == expected


def test_stage_timer(capsys):
    from downpore_tpu.utils import StageTimer
    t = StageTimer()
    with t.stage("phase", items=100):
        pass
    t.report()
    err = capsys.readouterr().err
    assert "[stage] phase" in err and "100 items" in err


def test_long_kmer_occurrences():
    from downpore_tpu.core import Sequence
    from downpore_tpu.utils import long_kmer_occurrences, kmer_occurrences
    s = Sequence.from_string("ACGTACGTAACGT", id=0)
    k = 5
    sparse = long_kmer_occurrences([s], k)
    dense = kmer_occurrences([s], k)
    for km, n in sparse.items():
        assert dense[km] == n
    assert sum(sparse.values()) == int(dense.sum())


def test_write_fast_path_byte_identical(tmp_path):
    """The byte-level fast write path must equal the object path exactly
    across trims, ignores, renames and split extras (fastq and fasta)."""
    import io
    import numpy as np
    from downpore_tpu.core import Sequence
    rng = np.random.default_rng(5)
    B = np.frombuffer(b"ACGT", np.uint8)

    def rand(n):
        return B[rng.integers(0, 4, n)].tobytes().decode()

    fq = tmp_path / "w.fastq"
    with open(fq, "w") as f:
        for i in range(30):
            s = rand(int(rng.integers(80, 400)))
            q = "".join(chr(33 + int(rng.integers(2, 40)))
                        for _ in range(len(s)))
            f.write(f"@r{i} extra\n{s}\n+\n{q}\n")
    fa = tmp_path / "w.fasta"
    with open(fa, "w") as f:
        for i in range(20):
            s = rand(int(rng.integers(80, 400)))
            # multi-line fasta records exercise multi-span joins
            f.write(f">f{i}\n{s[:60]}\n{s[60:]}\n")

    for path in (fq, fa):
        ss = SequenceSet(str(path), min_length=10)
        ss._build_index()
        n = len(ss.spans)
        for rid in range(0, n, 3):
            ss.set_front_trim(rid, 7)
        for rid in range(1, n, 5):
            ss.set_back_trim(rid, 11)
        for rid in range(2, n, 7):
            ss.set_ignore(rid, True)
        ss.set_name(1, "Barcode_x_" + ss.get_name(1))
        ss.add_sequence(Sequence.from_string(rand(120), id=0,
                                          name="split_a"), "split_a")
        slow = io.StringIO()
        for seq in ss.get_sequences():
            slow.write(ss._format(seq, True))
        fast = io.StringIO()
        # fresh set so extras registration order matches
        ss2 = SequenceSet(str(path), min_length=10)
        ss2._build_index()
        for rid in range(0, n, 3):
            ss2.set_front_trim(rid, 7)
        for rid in range(1, n, 5):
            ss2.set_back_trim(rid, 11)
        for rid in range(2, n, 7):
            ss2.set_ignore(rid, True)
        ss2.set_name(1, "Barcode_x_" + ss2.get_name(1))
        ss2.add_sequence(Sequence.from_string(rand(120), id=0,
                                           name="split_a"), "split_a")
        ss2.write(fast)
        a, b = slow.getvalue(), fast.getvalue()
        # extras differ by rng state; compare the main-record region
        assert a[:a.index("split_a") - 1] == b[:b.index("split_a") - 1]
        assert len(a) > 100
