"""Golden trim output: locks the end-to-end trim behaviour that has been
manually verified (chimera split, adapter determination, tagging).  If a
deliberate behaviour change alters this, regenerate the digest and record
why in the commit."""
import hashlib
import io

import numpy as np
import pytest

from downpore_tpu.core import Sequence
from downpore_tpu.io import SequenceSet
from downpore_tpu.trim.trimmer import load_trimmer


@pytest.fixture
def fixture_fastq(tmp_path):
    rng = np.random.default_rng(9)
    B = "ACGT"
    front = "AATGTACTTCGTTCAGTTACGTATTGCT"
    back = "GCAATACGTAACTGAACGAAGT"

    def rb(n):
        return "".join(B[i] for i in rng.integers(0, 4, n))

    def mut(s, r=0.08):
        out = []
        for c in s:
            out.append(B[rng.integers(0, 4)] if rng.random() < r else c)
        return "".join(out)

    p = tmp_path / "reads.fastq"
    with open(p, "w") as f:
        for i in range(30):
            core = rb(int(rng.integers(600, 1200)))
            r = mut(front) + core + mut(back)
            f.write(f"@read{i}\n{r}\n+\n{'I' * len(r)}\n")
        r = rb(1500) + front + rb(1600)
        f.write(f"@chimera\n{r}\n+\n{'I' * len(r)}\n")
        r = rb(900)
        f.write(f"@clean\n{r}\n+\n{'I' * len(r)}\n")
    return str(p)


def test_trim_golden_output(fixture_fastq):
    trimmer = load_trimmer("", "", 6, verbosity=0)
    seq_set = SequenceSet(fixture_fastq, min_length=50)
    trimmer.determine_adapters(seq_set, 10000, 90)
    trimmer.set_trim_params(85, 5, 50, 1000, True, True, False)
    trimmer.trim(seq_set)
    out = io.StringIO()
    seq_set.write(out, True)
    text = out.getvalue()
    lines = text.splitlines()
    names = [l[1:] for l in lines[0::4]]
    # semantic assertions
    assert len(names) == 33  # 30 trimmed + 2 chimera halves + clean
    assert "chimera_(left)" in names and "chimera_(right)" in names
    assert "clean" in names
    front = "AATGTACTTCGTTCAGTTACGTATTGCT"
    assert not any(front in l for l in lines[1::4])
    # the exact digest of the verified output
    digest = hashlib.sha256(text.encode()).hexdigest()
    assert digest == EXPECTED_DIGEST, \
        f"trim output changed: {digest} (was {EXPECTED_DIGEST})"


EXPECTED_DIGEST = "b7ef415758ba165151d66f047f59093b027d5e2299db656ac5ad23266ca27399"


def test_trim_golden_output_data_parallel(fixture_fastq):
    """The same golden output when window batches shard over an 8-device
    data mesh (adapter tables replicated) — validates the multi-chip trim
    path bit-for-bit."""
    from downpore_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    assert mesh.devices.size == 8
    trimmer = load_trimmer("", "", 6, verbosity=0, mesh=mesh)
    seq_set = SequenceSet(fixture_fastq, min_length=50)
    trimmer.determine_adapters(seq_set, 10000, 90)
    trimmer.set_trim_params(85, 5, 50, 1000, True, True, False)
    trimmer.trim(seq_set)
    out = io.StringIO()
    seq_set.write(out, True)
    digest = hashlib.sha256(out.getvalue().encode()).hexdigest()
    assert digest == EXPECTED_DIGEST
