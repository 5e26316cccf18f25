"""Local-mode DP kernel tests: device kernel vs numpy oracle, backtrace
re-scoring, and soft-clip semantics. The reference fork removed its local
SSE kernels (bt2_search.cpp:1345-1348) but kept the local policy surface;
these kernels restore upstream bowtie2's local capability."""

import numpy as np
import pytest

from omp_bowtie2_prime_tpu.ops import sw


P = sw.SWParams(ma=2)  # local defaults: ma=2 (scoring.h:32-33), MX=6


def _rand_problem(rng, L=60, W=90, nmut=3, ngap=1):
    refw = rng.integers(0, 4, W).astype(np.int32)
    pos = int(rng.integers(0, W - L))
    read = refw[pos : pos + L].copy()
    for _ in range(nmut):
        p_ = int(rng.integers(0, L))
        read[p_] = (read[p_] + 1 + rng.integers(0, 3)) % 4
    pen = np.full(L, 6, np.int32)
    return read, pen, refw


def _rescore(read, pen, refw, p, ops_row, start_row, start_col):
    """Re-score a traced local alignment from its END->START op string."""
    v = ops_row[ops_row != 0][::-1]
    i, j = int(start_row), int(start_col)
    score = 0
    state = None
    for op in v:
        if op == 1:  # M
            rc, fc = int(read[i]), int(refw[j])
            if rc >= 4 or fc >= 4:
                score -= p.npen
            elif rc == fc:
                score += p.ma
            else:
                score -= int(pen[i])
            i += 1
            j += 1
            state = None
        elif op == 2:  # I (read char, no ref)
            score -= p.rfg_ext if state == "I" else p.rfg_open
            i += 1
            state = "I"
        else:  # D (ref char, no read)
            score -= p.rdg_ext if state == "D" else p.rdg_open
            j += 1
            state = "D"
    return score, i, j


def test_local_kernel_matches_oracle():
    rng = np.random.default_rng(7)
    B, L, W = 24, 60, 90
    reads = np.zeros((B, L), np.int32)
    pens = np.zeros((B, L), np.int32)
    refs = np.zeros((B, W), np.int32)
    for b in range(B):
        reads[b], pens[b], refs[b] = _rand_problem(
            rng, L, W, nmut=int(rng.integers(0, 6)), ngap=0
        )
    rdlens = np.full(B, L, np.int32)
    wlens = np.full(B, W, np.int32)
    best, brow, bcol, ops_p, stc, str_ = map(
        np.asarray,
        sw.sw_local_backtrace_batch(reads, pens, rdlens, refs, wlens, P),
    )
    ops = sw.unpack_ops2(ops_p)
    for b in range(B):
        H, E, F = sw.sw_local_full_numpy(reads[b], pens[b], refs[b], P)
        assert int(best[b]) == int(H[1:, :].max()), b
        # traced path re-scores to the reported best
        sc2, i_end, j_end = _rescore(
            reads[b], pens[b], refs[b], P, ops[b], str_[b], stc[b]
        )
        assert sc2 == int(best[b]), b
        assert i_end == int(brow[b]) and j_end == int(bcol[b]), b


def test_local_soft_clips_both_ends():
    """Garbage prefix/suffix on the read soft-clips; the matched core
    scores ma per base."""
    rng = np.random.default_rng(8)
    W = 120
    refw = rng.integers(0, 4, W).astype(np.int32)
    core = refw[30:90]  # 60 matching chars
    read = np.concatenate(
        [(core[:10] + 2) % 4, core, (core[:10] + 1) % 4]
    ).astype(np.int32)  # 10 garbage + 60 match + 10 garbage
    L = len(read)
    pen = np.full(L, 6, np.int32)
    best, brow, bcol, ops_p, stc, str_ = map(
        np.asarray,
        sw.sw_local_backtrace_batch(
            read[None], pen[None], np.array([L], np.int32),
            refw[None], np.array([W], np.int32), P,
        ),
    )
    # the garbage flanks can extend the local alignment only at a loss
    assert int(best[0]) == 2 * 60
    assert int(str_[0]) == 10 and int(brow[0]) == 70  # clips 10S / 10S
    assert int(stc[0]) == 30 and int(bcol[0]) == 90
    v = sw.unpack_ops2(ops_p)[0]
    assert (v[v != 0] == 1).all() and (v != 0).sum() == 60  # 60M core


def test_local_zero_floor_restarts():
    """A catastrophic mismatch run splits the alignment: the kernel keeps
    the better half rather than bridging at a loss."""
    rng = np.random.default_rng(9)
    W = 200
    refw = rng.integers(0, 4, W).astype(np.int32)
    # read = 20 matching + 30 garbage + 40 matching (all from one diagonal)
    seg = refw[50:140].copy()
    read = seg.copy()
    read[20:50] = (read[20:50] + 2) % 4
    L = len(read)
    pen = np.full(L, 6, np.int32)
    best, brow, bcol, ops_p, stc, str_ = map(
        np.asarray,
        sw.sw_local_backtrace_batch(
            read[None], pen[None], np.array([L], np.int32),
            refw[None], np.array([W], np.int32), P,
        ),
    )
    assert int(best[0]) == 2 * 40  # the 40-char tail segment wins
    assert int(str_[0]) == 50 and int(brow[0]) == 90


def test_local_gap_alignment():
    """A read-deletion (missing ref char) still aligns with a D op when
    the flanks pay for the gap."""
    rng = np.random.default_rng(10)
    W = 120
    refw = rng.integers(0, 4, W).astype(np.int32)
    seg = refw[20:80]
    read = np.concatenate([seg[:30], seg[31:]]).astype(np.int32)  # drop 1
    L = len(read)
    pen = np.full(L, 6, np.int32)
    best, brow, bcol, ops_p, stc, str_ = map(
        np.asarray,
        sw.sw_local_backtrace_batch(
            read[None], pen[None], np.array([L], np.int32),
            refw[None], np.array([W], np.int32), P,
        ),
    )
    full = 2 * 59 - (P.rdg_open)  # 59 matches minus one-gap open cost
    # clipping one flank instead must score less, so the gap is taken
    assert int(best[0]) == full
    v = sw.unpack_ops2(ops_p)[0]
    assert (v == 3).sum() == 1  # exactly one D


def test_local_never_negative_and_respects_window():
    """All-garbage reads yield score 0 (no alignment) and stay in-window."""
    rng = np.random.default_rng(11)
    B, L, W = 8, 40, 64
    reads = rng.integers(0, 4, (B, L)).astype(np.int32)
    refs = rng.integers(0, 4, (B, W)).astype(np.int32)
    pens = np.full((B, L), 6, np.int32)
    best, brow, bcol, *_ = map(
        np.asarray,
        sw.sw_local_backtrace_batch(
            reads, pens, np.full(B, L, np.int32),
            refs, np.full(B, W, np.int32), P,
        ),
    )
    assert (best >= 0).all()
    assert (bcol <= W).all()
