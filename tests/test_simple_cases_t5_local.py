"""Tranche 5: local-mode known-answer cases (soft-clip CIGARs, match
bonus, G-func minimum). Local mode is restored BEYOND the reference fork
(it deleted its local kernels, bt2_search.cpp:1345-1348), so expectations
here pin upstream bowtie2 semantics: AS = 2*matched - penalties with
--ma 2, S runs for unmatchable flanks, G,20,8 score floor."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu import cli
from omp_bowtie2_prime_tpu.utils import dna


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    d = tmp_path_factory.mktemp("t5")
    rng = np.random.default_rng(123)
    text = rng.integers(0, 4, 8000).astype(np.int8)
    s = dna.decode(text)
    fa = d / "g.fa"
    fa.write_text(">chrL\n" + "\n".join(s[i:i+70] for i in range(0, len(s), 70)) + "\n")
    idx = d / "g.npz"
    cli.main(["build", str(fa), str(idx)])
    return s, str(idx)


def _run(genome, reads, extra=(), tmp=None):
    s, idx = genome
    fq = tmp / "r.fq"
    with open(fq, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = tmp / "o.sam"
    cli.main(["align", "--local", "-x", idx, "-U", str(fq),
              "-S", str(out), *extra])
    return [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]


JUNK = "ACGT" * 5  # 20bp — junk flank (may partially match by chance)


def test_leading_softclip(genome, tmp_path):
    s, idx = genome
    rng = np.random.default_rng(9)
    junk = dna.decode(rng.integers(0, 4, 20))
    (rec,) = _run(genome, [("lc0", junk + s[3000:3060])], tmp=tmp_path)
    # alignment anchors at 3001 with the junk soft-clipped; chance
    # matches may extend a few bases into the flank
    assert rec[5].endswith("M") and "S" in rec[5]
    assert int(rec[3]) <= 3001
    assert rec[5].split("S")[0].isdigit()
    # AS >= 2*60 (the exact span depends on flank chance-matches)
    as_tag = next(int(t.split(":")[2]) for t in rec[11:] if t.startswith("AS:"))
    assert as_tag >= 120


def test_trailing_softclip_and_ma(genome, tmp_path):
    s, idx = genome
    rng = np.random.default_rng(10)
    junk = dna.decode(rng.integers(0, 4, 20))
    (rec,) = _run(genome, [("tc0", s[5000:5060] + junk)], tmp=tmp_path)
    assert int(rec[3]) == 5001
    as2 = next(int(t.split(":")[2]) for t in rec[11:] if t.startswith("AS:"))
    (rec3,) = _run(genome, [("tc0", s[5000:5060] + junk)],
                   extra=["--ma", "3"], tmp=tmp_path)
    as3 = next(int(t.split(":")[2]) for t in rec3[11:] if t.startswith("AS:"))
    # per-match bonus scales the score ~3/2 (flank chance-matches shift
    # both the same way)
    assert as3 > as2


def test_perfect_local_no_clip(genome, tmp_path):
    s, idx = genome
    (rec,) = _run(genome, [("pf0", s[1000:1100])], tmp=tmp_path)
    assert rec[3] == "1001" and rec[5] == "100M"
    as_tag = next(int(t.split(":")[2]) for t in rec[11:] if t.startswith("AS:"))
    assert as_tag == 200  # 100 matches x ma=2
    assert int(rec[4]) == 44  # local MAPQ table ceiling (unique perfect)


def test_score_floor_rejects_short_match(genome, tmp_path):
    s, idx = genome
    rng = np.random.default_rng(11)
    # 12bp of genome inside 60bp of junk: best local score 24 < G,20,8
    # floor f(60) = 20 + 8*ln(60) = 52 -> unaligned
    junk1 = dna.decode(rng.integers(0, 4, 24))
    junk2 = dna.decode(rng.integers(0, 4, 24))
    (rec,) = _run(genome, [("sf0", junk1 + s[2000:2012] + junk2)],
                  tmp=tmp_path)
    assert int(rec[1]) & 0x4
