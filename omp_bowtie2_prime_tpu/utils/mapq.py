"""MAPQ model V2 — the bowtie2 default mapping-quality table.

Re-expression of BowtieMapq2::mapq (ref: unique.h:171-390) for the
end-to-end (monotone) case, driven by:
  bestOver  = best - scMin          (how far above barely-valid)
  bestdiff  = |best - secbest|      (gap to second best)
  diff      = max(1, scPer - scMin) (dynamic range)
Buckets produce 0..42 end-to-end. 255 = unique-but-unsearched.
"""

from __future__ import annotations

import numpy as np


def _f32(x: float) -> float:
    """The reference multiplies by float literals ((double)0.8f etc,
    unique.h:224-383): round constants through float32."""
    return float(np.float32(x))



def mapq_v2_e2e(
    best: int,
    secbest: int | None,
    sc_min: int,
    sc_perfect: int,
) -> int:
    diff = max(1, sc_perfect - sc_min)
    best_over = best - sc_min
    if secbest is None:
        if best_over >= diff * _f32(0.8):
            return 42
        if best_over >= diff * _f32(0.7):
            return 40
        if best_over >= diff * _f32(0.6):
            return 24
        if best_over >= diff * _f32(0.5):
            return 23
        if best_over >= diff * _f32(0.4):
            return 8
        if best_over >= diff * _f32(0.3):
            return 3
        return 0
    bestdiff = abs(abs(best) - abs(secbest))
    if bestdiff >= diff * _f32(0.9):
        return 39 if best_over == diff else 33
    if bestdiff >= diff * _f32(0.8):
        return 38 if best_over == diff else 27
    if bestdiff >= diff * _f32(0.7):
        return 37 if best_over == diff else 26
    if bestdiff >= diff * _f32(0.6):
        return 36 if best_over == diff else 22
    if bestdiff >= diff * _f32(0.5):
        if best_over == diff:
            return 35
        if best_over >= diff * _f32(0.84):
            return 25
        if best_over >= diff * _f32(0.68):
            return 16
        return 5
    if bestdiff >= diff * _f32(0.4):
        if best_over == diff:
            return 34
        if best_over >= diff * _f32(0.84):
            return 21
        if best_over >= diff * _f32(0.68):
            return 14
        return 4
    if bestdiff >= diff * _f32(0.3):
        if best_over == diff:
            return 32
        if best_over >= diff * _f32(0.88):
            return 18
        if best_over >= diff * _f32(0.67):
            return 15
        return 3
    if bestdiff >= diff * _f32(0.2):
        if best_over == diff:
            return 31
        if best_over >= diff * _f32(0.88):
            return 17
        if best_over >= diff * _f32(0.67):
            return 11
        return 0
    if bestdiff >= diff * _f32(0.1):
        if best_over == diff:
            return 30
        if best_over >= diff * _f32(0.88):
            return 12
        if best_over >= diff * _f32(0.67):
            return 7
        return 0
    if bestdiff > 0:
        return 6 if best_over >= diff * _f32(0.67) else 2
    return 1 if best_over >= diff * _f32(0.67) else 0


def mapq_v2_local(
    best: int,
    secbest: int | None,
    sc_min: int,
    sc_perfect: int,
) -> int:
    """Local-mode table (ref: unique.h:330-383); 0..44."""
    diff = max(1, sc_perfect - sc_min)
    best_over = best - sc_min
    if secbest is None:
        if best_over >= diff * _f32(0.8):
            return 44
        if best_over >= diff * _f32(0.7):
            return 42
        if best_over >= diff * _f32(0.6):
            return 41
        if best_over >= diff * _f32(0.5):
            return 36
        if best_over >= diff * _f32(0.4):
            return 28
        if best_over >= diff * _f32(0.3):
            return 24
        return 22
    bestdiff = abs(abs(best) - abs(secbest))
    if bestdiff >= diff * _f32(0.9):
        return 40
    if bestdiff >= diff * _f32(0.8):
        return 39
    if bestdiff >= diff * _f32(0.7):
        return 38
    if bestdiff >= diff * _f32(0.6):
        return 37
    if bestdiff >= diff * _f32(0.5):
        if best_over == diff:
            return 35
        return 25 if best_over >= diff * _f32(0.5) else 20
    if bestdiff >= diff * _f32(0.4):
        if best_over == diff:
            return 34
        return 21 if best_over >= diff * _f32(0.5) else 19
    if bestdiff >= diff * _f32(0.3):
        if best_over == diff:
            return 33
        return 18 if best_over >= diff * _f32(0.5) else 16
    if bestdiff >= diff * _f32(0.2):
        if best_over == diff:
            return 32
        return 17 if best_over >= diff * _f32(0.5) else 12
    if bestdiff >= diff * _f32(0.1):
        if best_over == diff:
            return 31
        return 14 if best_over >= diff * _f32(0.5) else 9
    if bestdiff > 0:
        return 11 if best_over >= diff * _f32(0.5) else 2
    return 1 if best_over >= diff * _f32(0.5) else 0


def mapq_v3(best: int, secbest, sc_min: int, sc_perfect: int) -> int:
    """Simplified V3 table (ref: BowtieMapq3... unique.h:96-166), selected
    with --mapqv 3: coarse buckets on bestOver and bestdiff."""
    diff = max(1, sc_perfect - sc_min)
    best_over = best - sc_min
    if secbest is None:
        if best_over >= diff * _f32(0.8):
            return 42
        if best_over >= diff * _f32(0.7):
            return 40
        if best_over >= diff * _f32(0.61):
            return 24
        if best_over >= diff * _f32(0.5):
            return 23
        if best_over >= diff * _f32(0.42):
            return 8
        if best_over >= diff * _f32(0.3):
            return 3
        return 0
    bestdiff = abs(abs(best) - abs(secbest))
    if bestdiff >= diff * _f32(0.9):
        return 39 if best_over == diff else 33
    if bestdiff >= diff * _f32(0.76):
        return 38 if best_over == diff else 27
    if bestdiff >= diff * _f32(0.61):
        return 37 if best_over == diff else 26
    if bestdiff >= diff * _f32(0.42):
        return 36 if best_over == diff else 22
    if bestdiff >= diff * _f32(0.3):
        return 25 if best_over == diff else 19
    if bestdiff >= diff * _f32(0.2):
        return 14
    if bestdiff >= diff * _f32(0.1):
        return 10
    if bestdiff > 0:
        return 6
    return 0
