import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omp_bowtie2_prime_tpu.ops import sw
from omp_bowtie2_prime_tpu.utils.scoring import Scoring

P = sw.SWParams()  # defaults: open 8, ext 3, npen 1, gbar 4


def run_device(reads, pens, rdlens, refs, wlens, p=P):
    f = jax.jit(sw.sw_e2e_batch, static_argnums=5)
    return [np.asarray(x) for x in f(
        jnp.asarray(reads, jnp.int32),
        jnp.asarray(pens, jnp.int32),
        jnp.asarray(rdlens, jnp.int32),
        jnp.asarray(refs, jnp.int32),
        jnp.asarray(wlens, jnp.int32),
        p,
    )]


def mk(readseqs, refseqs, L=32, W=48, pen=6):
    B = len(readseqs)
    reads = np.full((B, L), 4, np.int32)
    pens = np.full((B, L), pen, np.int32)
    rdlens = np.zeros(B, np.int32)
    refs = np.full((B, W), 4, np.int32)
    wlens = np.zeros(B, np.int32)
    for b, (rd, rf) in enumerate(zip(readseqs, refseqs)):
        reads[b, : len(rd)] = rd
        rdlens[b] = len(rd)
        refs[b, : len(rf)] = rf
        wlens[b] = len(rf)
    return reads, pens, rdlens, refs, wlens


def rand_seq(rng, n):
    return rng.integers(0, 4, n).astype(np.int32)


def test_exact_match_scores_zero():
    rng = np.random.default_rng(0)
    ref = rand_seq(rng, 40)
    read = ref[5:25]
    reads, pens, rdlens, refs, wlens = mk([read], [ref])
    best, bestcol, hlast = run_device(reads, pens, rdlens, refs, wlens)
    assert best[0] == 0
    assert hlast[0, 25] == 0  # ending exactly after true placement


def test_single_mismatch():
    rng = np.random.default_rng(1)
    ref = rand_seq(rng, 40)
    read = ref[5:25].copy()
    read[10] = (read[10] + 1) % 4
    reads, pens, rdlens, refs, wlens = mk([read], [ref], pen=6)
    best, _, _ = run_device(reads, pens, rdlens, refs, wlens)
    assert best[0] == -6


def test_read_gap_costs_open_plus_ext():
    rng = np.random.default_rng(2)
    ref = rand_seq(rng, 40)
    # read = ref[5:25] with position 15 deleted -> one read gap (CIGAR D)
    read = np.concatenate([ref[5:15], ref[16:26]])
    reads, pens, rdlens, refs, wlens = mk([read], [ref], pen=100)
    best, _, _ = run_device(reads, pens, rdlens, refs, wlens)
    assert best[0] == -8


def test_ref_gap_costs_open_plus_ext():
    rng = np.random.default_rng(3)
    ref = rand_seq(rng, 40)
    # read = ref[5:24] with an extra char inserted mid-read (CIGAR I)
    read = np.concatenate([ref[5:15], [(ref[15] + 2) % 4], ref[15:24]])
    reads, pens, rdlens, refs, wlens = mk([read], [ref], pen=100)
    best, _, _ = run_device(reads, pens, rdlens, refs, wlens)
    assert best[0] == -8


def test_gap_inside_barrier_disallowed():
    # period-4 ref so any frame shift mismatches everywhere; deletion at
    # read position 2 (< gbar=4) cannot be bridged by a gap
    ref = np.tile(np.array([0, 1, 2, 3], np.int32), 10)
    full = ref[5:27]
    read = np.concatenate([full[:2], full[3:]])
    reads, pens, rdlens, refs, wlens = mk([read], [ref], pen=6)
    best, _, _ = run_device(reads, pens, rdlens, refs, wlens)
    nogbar = sw.SWParams(gbar=0)
    best0, _, _ = run_device(reads, pens, rdlens, refs, wlens, p=nogbar)
    assert best0[0] == -8  # gap allowed when barrier off
    assert best[0] < -8  # barrier forces a worse (mismatch) path


def test_read_with_N():
    rng = np.random.default_rng(5)
    ref = rand_seq(rng, 40)
    read = ref[5:25].copy()
    read[7] = 4
    reads, pens, rdlens, refs, wlens = mk([read], [ref], pen=6)
    best, _, _ = run_device(reads, pens, rdlens, refs, wlens)
    assert best[0] == -1  # npen


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_device_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    B, L, W = 8, 24, 40
    reads = rng.integers(0, 4, (B, L)).astype(np.int32)
    pens = rng.integers(2, 7, (B, L)).astype(np.int32)
    rdlens = rng.integers(10, L + 1, B).astype(np.int32)
    refs = rng.integers(0, 4, (B, W)).astype(np.int32)
    wlens = rng.integers(20, W + 1, B).astype(np.int32)
    # make half the problems "alignable": plant the read in the ref
    for b in range(0, B, 2):
        ln = rdlens[b]
        if ln + 5 <= wlens[b]:
            refs[b, 5 : 5 + ln] = reads[b, :ln]
    best, bestcol, hlast = run_device(reads, pens, rdlens, refs, wlens)
    for b in range(B):
        H, E, F = sw.sw_e2e_full_numpy(
            reads[b, : rdlens[b]], pens[b], refs[b, : wlens[b]], P
        )
        want = H[rdlens[b]]
        got = hlast[b, : wlens[b] + 1]
        assert np.array_equal(got, want), b


def score_from_trace(read, pens, refw, p, aln):
    """Recompute score by replaying the CIGAR (independent check)."""
    score = 0
    i, j = 0, aln.start_col
    for op, n in aln.cigar:
        if op == "M":
            for _ in range(n):
                if read[i] >= 4 or refw[j] >= 4:
                    score -= p.npen
                elif read[i] != refw[j]:
                    score -= int(pens[i])
                i += 1
                j += 1
        elif op == "I":
            score -= p.rfg_open + (n - 1) * p.rfg_ext
            i += n
        elif op == "D":
            score -= p.rdg_open + (n - 1) * p.rdg_ext
            j += n
    assert i == len(read)
    assert j == aln.end_col
    return score


@pytest.mark.parametrize("seed", [20, 21, 22, 23])
def test_backtrace_consistent(seed):
    rng = np.random.default_rng(seed)
    L, W = 30, 60
    ref = rand_seq(rng, W)
    read = ref[10 : 10 + L].copy()
    # random mutations
    for _ in range(3):
        kind = rng.integers(0, 3)
        pos = rng.integers(6, L - 6)
        if kind == 0:
            read[pos] = (read[pos] + 1) % 4
        elif kind == 1:
            read = np.concatenate([read[:pos], [rng.integers(0, 4)], read[pos:-1]])
        else:
            read = np.concatenate([read[:pos], read[pos + 1 :], [ref[10 + L + 1]]])
    read = read[:L]
    pens = np.full(L, 6, np.int32)
    H, E, F = sw.sw_e2e_full_numpy(read, pens, ref, P)
    end_col = int(np.argmax(H[L]))
    aln = sw.backtrace_numpy(read, pens, ref, P, H, E, F, end_col)
    assert aln.score == H[L, end_col]
    assert score_from_trace(read, pens, ref, P, aln) == aln.score
    assert sum(n for op, n in aln.cigar if op in "MI") == L
