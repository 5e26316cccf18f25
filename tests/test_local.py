"""Local alignment mode — engine-level tests. The reference fork removed
its local SSE kernels ("--local mode is not supported",
bt2_search.cpp:1345-1348) but kept the complete local policy surface
(DEFAULT_MATCH_BONUS_LOCAL=2 scoring.h:32-33, --score-min G,20,8
scoring.h:54-55, -local presets presets.cpp:62-92, local MAPQ table
unique.h:330-383); this restores upstream bowtie2's local capability."""

import math

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.index.builder import build_index_from_text
from omp_bowtie2_prime_tpu.index.fasta import join_references
from omp_bowtie2_prime_tpu.io.fastq import Read
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner, AlignOpts
from omp_bowtie2_prime_tpu.models.paired import PairedAligner
from omp_bowtie2_prime_tpu.utils import dna
from omp_bowtie2_prime_tpu.utils.cigar import cigar_string
from omp_bowtie2_prime_tpu.utils.presets import PRESETS_LOCAL
from omp_bowtie2_prime_tpu.utils.scoring import Scoring, SimpleFunc


def _local_scoring(**kw):
    kw.setdefault("match_bonus", 2)
    kw.setdefault("score_min", SimpleFunc.parse("G,20,8"))
    return Scoring(**kw)


@pytest.fixture(scope="module")
def lgenome():
    rng = np.random.default_rng(77)
    text = rng.integers(0, 4, 20000).astype(np.int8)
    joined, refmap = join_references(["chrL"], [text.copy()])
    fm = build_index_from_text(joined, refmap, ftab_k=7)
    pl = PRESETS_LOCAL["sensitive-local"]
    al = TPUAligner(
        fm, _local_scoring(),
        AlignOpts(local=True, seed_len=pl.seed_len, ival=pl.ival,
                  nrounds=pl.nrounds, dps=pl.dps),
    )
    return text, fm, al


def mk(seq, name="r"):
    codes = np.asarray(seq, np.int8)
    return Read(0, name, codes, np.full(len(codes), 40, np.uint8))


def test_local_exact_read(lgenome):
    text, fm, al = lgenome
    rd = mk(text[5000:5100])
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert res.refoff == 5000 and res.fw
    assert cigar_string(res.cigar) == "100M"
    assert res.score == 200  # 100 matches x ma=2
    # unique + best_over (200-56=144) == diff -> local table top bucket
    assert res.mapq == 44


def test_local_soft_clips_garbage_flanks(lgenome):
    text, fm, al = lgenome
    core = text[8000:8080]
    # flanks built to mismatch the reference at every extension position,
    # so clipping is unambiguously optimal
    garb5 = (text[7985:8000] + 2) % 4
    garb3 = (text[8080:8085] + 2) % 4
    rd = mk(np.concatenate([garb5, core, garb3]))
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert res.refoff == 8000
    assert cigar_string(res.cigar) == "15S80M5S"
    assert res.score == 160
    # minsc(100) = trunc(20 + 8*ln(100)) = 56; diff = 200 - 56 = 144;
    # best_over = 104 in [0.7, 0.8) * diff -> 42 (unique local bucket)
    assert res.mapq == 42
    assert res.span == 80  # soft clips consume no reference


def test_local_rc_clip_orientation(lgenome):
    """Garbage at the original read's 5' end must surface as a TRAILING
    clip on the reverse-strand record (SAM stores the rc sequence)."""
    text, fm, al = lgenome
    core = dna.revcomp(text[12000:12080])
    # in SAM orientation this garbage compares against text[12080:12090];
    # +2 mod 4 mismatches every extension position
    garb = dna.revcomp((text[12080:12090] + 2) % 4)
    rd = mk(np.concatenate([garb, core]))
    res = al.align_batch([rd])[0]
    assert res.status == "aligned" and not res.fw
    assert res.refoff == 12000
    assert cigar_string(res.cigar) == "80M10S"


def test_local_min_score_g_func(lgenome):
    """A 25-char match inside a 60bp read scores 50 < minsc(60)=52 and is
    rejected; lowering --score-min admits it with the flank clipped."""
    text, fm, al = lgenome
    core = text[3000:3025]
    garb = (np.resize(core, 35) + 2) % 4
    rd = mk(np.concatenate([core, garb]))
    assert int(20 + 8 * math.log(60)) == 52
    res = al.align_batch([rd])[0]
    assert res.status == "unaligned"
    al2 = TPUAligner(
        fm, _local_scoring(score_min=SimpleFunc.parse("C,40,0")),
        AlignOpts(local=True, seed_len=20),
    )
    res2 = al2.align_batch([rd])[0]
    assert res2.status == "aligned"
    assert cigar_string(res2.cigar) == "25M35S"
    assert res2.score == 50


def test_local_mismatch_scoring(lgenome):
    """An internal mismatch costs MX=6 at q40: extending through it beats
    clipping when the far flank repays the penalty."""
    text, fm, al = lgenome
    seg = text[9000:9100].copy()
    seg[50] = (seg[50] + 1) % 4
    res = al.align_batch([mk(seg)])[0]
    assert res.status == "aligned"
    assert cigar_string(res.cigar) == "100M"
    assert res.score == 99 * 2 - 6
    assert res.stats["nm"] == 1


def test_local_paired(lgenome):
    """Concordant local pairs: clipped mates still classify and get the
    local combined-score MAPQ."""
    text, fm, al = lgenome
    rng = np.random.default_rng(5)
    pal = PairedAligner(al)
    pairs = []
    for i in range(6):
        pos = int(rng.integers(0, len(text) - 400))
        s1 = text[pos : pos + 100].copy()
        s2 = dna.revcomp(text[pos + 200 : pos + 300])
        s1[:8] = (s1[:8] + 1) % 4  # damaged 5' end: should soft-clip
        pairs.append((mk(s1, f"p{i}"), mk(s2, f"p{i}")))
    res = pal.align_pairs(pairs)
    nc = sum(r.cat == "concord" for r in res)
    assert nc >= 5
    for r in res:
        if r.cat != "concord":
            continue
        assert r.m1.mapq == r.m2.mapq
        assert cigar_string(r.m1.cigar).startswith("8S")


def test_local_never_extends_at_a_loss(lgenome):
    """The floor: a read whose halves match two distant loci reports the
    better half clipped, never a forced bridge."""
    text, fm, al = lgenome
    left = text[1000:1040].copy()
    right = text[15000:15060]
    # force a mismatch at the junction so the 60M block cannot extend left
    left[-1] = (text[14999] + 2) % 4
    rd = mk(np.concatenate([left, right]))
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert res.refoff == 15000
    assert cigar_string(res.cigar) == "40S60M"
    assert res.score == 120


def test_local_long_read_irregular_class(lgenome):
    """A 320bp read routes through the irregular (any-shape XLA) DP class
    and still soft-clips its damaged 5' flank in local mode."""
    text, fm, al = lgenome
    core = text[6000:6300]
    garb = (text[5980:6000] + 2) % 4
    rd = mk(np.concatenate([garb, core]))
    res = al.align_batch([rd])[0]
    assert res.status == "aligned"
    assert res.refoff == 6000
    assert cigar_string(res.cigar) == "20S300M"
    assert res.score == 600
