"""bt2tpu inspect (bt2_inspect.cpp analog): reference reconstruction from
the stored 2-bit text + fragment map must round-trip the input FASTA —
including multi-record inputs, interior/leading/trailing N runs (which
become separate fragments at build time, ref_read.cpp RefRecord
semantics), lowercase input, and the -n/-s listing modes."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu import cli
from omp_bowtie2_prime_tpu.utils import dna

FA_RECS = [
    # interior N run + lowercase + leading/trailing Ns
    ("seqA desc ignored", "NNN" + "acgtACGTacgtTTGGCCAA" * 8 + "NNNNN"
     + "GATTACA" * 20 + "NN"),
    ("seqB", "CGCGCGTATATA" * 12),
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("inspect")
    fa = d / "in.fa"
    with open(fa, "w") as f:
        for name, seq in FA_RECS:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 50):
                f.write(seq[i : i + 50] + "\n")
    idx = d / "idx.npz"
    cli.main(["build", str(fa), str(idx)])
    return str(idx)


def _inspect(built, capsys, *args):
    cli.main(["inspect", *args, built])
    return capsys.readouterr().out


def test_reconstruction_roundtrip(built, capsys):
    out = _inspect(built, capsys)
    got = {}
    cur = None
    for line in out.splitlines():
        if line.startswith(">"):
            cur = line[1:]
            got[cur] = []
        else:
            got[cur].append(line)
    for name, seq in FA_RECS:
        # bowtie2-inspect keeps the FULL name line (pinned vs the
        # reference binary: ">seqA desc ignored")
        want = seq.upper()
        assert name in got
        assert "".join(got[name]) == want
    # reference prints 60-col lines by default
    assert all(len(l) <= 60 for ls in got.values() for l in ls)


def test_names_mode(built, capsys):
    out = _inspect(built, capsys, "-n")
    assert out.splitlines() == ["seqA desc ignored", "seqB"]


def test_summary_mode(built, capsys):
    # format pinned vs bowtie2-inspect-s -s: Flags / Reverse flags /
    # 2.0-compatible / SA-Sample / FTab-Chars / Sequence-N rows
    out = _inspect(built, capsys, "-s")
    lines = out.splitlines()
    assert lines[0] == "Flags\t1"
    assert lines[1] == "Reverse flags\t5"
    assert lines[2] == "2.0-compatible\t1"
    assert any(l.startswith("SA-Sample\t1 in ") for l in lines)
    assert any(l.startswith("FTab-Chars\t") for l in lines)
    seqs = [l for l in lines if l.startswith("Sequence-")]
    assert seqs[0].split("\t") == [
        "Sequence-1", "seqA desc ignored", str(len(FA_RECS[0][1]))
    ]
    assert seqs[1].split("\t") == [
        "Sequence-2", "seqB", str(len(FA_RECS[1][1]))
    ]


def test_across_width(built, capsys):
    out = _inspect(built, capsys, "-a", "7")
    body = [l for l in out.splitlines() if not l.startswith(">")]
    assert all(len(l) <= 7 for l in body)
