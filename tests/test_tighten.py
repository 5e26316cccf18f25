"""-M minsc tightening (aligner_sw_driver.cpp:588-618): engineered case
where the reference's tighten raise actually prunes a would-be secbest.

Construction: one 100bp read with THREE planted placements —
  A: 2 mismatches (score -12), seed@0 exact   -> found first
  B: exact (score 0),          seed@0 exact   -> found with A
  C: 1 mismatch IN [0,22) (score -6), missed by seed@0 -> found later
After A and B report, tighten=3 raises minsc to
secbest + 3/4*(best-secbest) (+1 below perfect) = -12+9+1 = -2, so the
reference's later DP for C FAILS and its reported XS stays -12.  An
untightened full-set selection would report XS -6 and a lower MAPQ —
this test pins both behaviors (and the reference binary, when present,
is checked against the tightened output in scripts/
deep_repeat_differential.py runs recorded in DIFFERENTIAL.md).
"""

import dataclasses
import os
import subprocess

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.models.aligner import AlignOpts, TPUAligner
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.utils import dna


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(7)
    text = rng.integers(0, 4, 30000).astype(np.int8)
    read = rng.integers(0, 4, 100).astype(np.int8)

    def mutate(seq, pos):
        s = seq.copy()
        s[pos] = (s[pos] + 1) % 4
        return s

    A, B, C = 5000, 15000, 25000
    a = mutate(mutate(read, 40), 80)  # 2 mm outside [0,22)
    c = mutate(read, 10)              # 1 mm inside [0,22)
    text[A : A + 100] = a
    text[B : B + 100] = read
    text[C : C + 100] = c
    joined, refmap = join_references(["chrT"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=8)
    rd = Read(rdid=0, name="t0", seq=read.copy(),
              qual=np.full(100, 40, np.uint8))
    return fm, rd, text, (A, B, C)


def _align(fm, rd, tighten):
    al = TPUAligner(fm, opts=AlignOpts(tighten=tighten))
    return al.align_batch([rd])[0]


def test_tighten_prunes_midscore_secbest(setup):
    fm, rd, text, (A, B, C) = setup
    res = _align(fm, rd, tighten=3)
    assert res.status == "aligned" and res.refoff == B and res.score == 0
    # C (-6) was found AFTER the raise to -2: pruned; XS = A's -12
    assert res.secbest == -12


def test_untightened_selection_keeps_midscore(setup):
    fm, rd, text, (A, B, C) = setup
    res = _align(fm, rd, tighten=0)
    assert res.status == "aligned" and res.refoff == B and res.score == 0
    assert res.secbest == -6  # full-set selection keeps C
    tight = _align(fm, rd, tighten=3)
    assert tight.mapq > res.mapq  # the raise changes reported MAPQ


def test_tighten_matches_reference_binary(setup, tmp_path):
    """When the locally-built reference binary exists, its record for the
    engineered read must match our tightened output exactly."""
    refbuild = "/tmp/refbuild"
    if not (os.path.exists(os.path.join(refbuild, "bowtie2-align-s"))
            and os.path.exists(os.path.join(refbuild, "bowtie2-build-s"))):
        pytest.skip("reference binaries not built in /tmp/refbuild")
    fm, rd, text, (A, B, C) = setup
    fa = tmp_path / "t.fa"
    s = dna.decode(text)
    fa.write_text(">chrT\n" + "\n".join(
        s[i : i + 70] for i in range(0, len(s), 70)) + "\n")
    fq = tmp_path / "t.fq"
    # the fork's batched reader mishandles 1-read files (emits "0
    # reads"); feed 8 copies and read record t0
    fq.write_text("".join(
        f"@t{i}\n{dna.decode(rd.seq)}\n+\n{'I' * 100}\n" for i in range(8)
    ))
    idx = tmp_path / "refidx"
    subprocess.run([os.path.join(refbuild, "bowtie2-build-s"), str(fa),
                    str(idx)], check=True, capture_output=True)
    sam = tmp_path / "ref.sam"
    subprocess.run([os.path.join(refbuild, "bowtie2-align-s"), "-x",
                    str(idx), "-U", str(fq), "-S", str(sam), "-p", "1"],
                   check=True, capture_output=True)
    rec = [l.split("\t") for l in sam.read_text().splitlines()
           if l.startswith("t0\t") or l.startswith("t0 ") or (l.split("\t")[0] == "t0")][0]
    res = _align(fm, rd, tighten=3)
    assert int(rec[3]) - 1 == res.refoff == B
    assert int(rec[4]) == res.mapq
    xs = [f for f in rec if f.startswith("XS:i:")]
    assert xs and int(xs[0][5:]) == res.secbest == -12
