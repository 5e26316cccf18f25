#!/usr/bin/env python3
"""Isolate the mat-path DP overhead: row gathers from [2n,160]u8 vs
padded layouts, gather_ref_windows, and the packed wrapper."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
print(f"## devices {jax.devices()}", flush=True)

rng = np.random.default_rng(0)


def bench(label, f, *args, n=5):
    np.asarray(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"## {label}: best {min(ts)*1e3:.1f} ms", flush=True)


B, L, C = 16384, 160, 224
rows = jnp.asarray(rng.integers(0, 2 * 32768, B).astype(np.int32))

for W in (160, 256):
    mat = jnp.asarray(rng.integers(0, 4, (2 * 32768, W)).astype(np.int8))
    f = jax.jit(lambda m, r: jnp.sum(m[r].astype(jnp.int32)))
    bench(f"rowgather [64K,{W}]i8 B=16K", f, mat, rows)
    del mat

from omp_bowtie2_prime_tpu.ops.sw import gather_ref_windows, SWParams
from omp_bowtie2_prime_tpu.utils.scoring import Scoring
from omp_bowtie2_prime_tpu.index.format import FMIndex

fm = FMIndex.load("/tmp/bt2prof/idx46M.npz")
refw = jnp.asarray(np.concatenate([fm.ref_words, np.zeros(128, np.uint32)]))
ws = jnp.asarray(rng.integers(0, fm.n - C, B).astype(np.int32))
wl = jnp.asarray(np.full(B, C, np.int32))
g = jax.jit(lambda rw, ws, wl: jnp.sum(
    gather_ref_windows(rw, ws, wl, C).astype(jnp.int32)))
bench("gather_ref_windows B=16K C=224", g, refw, ws, wl)

# full mat-path wrapper vs direct kernel
from omp_bowtie2_prime_tpu.models.aligner import TPUAligner

al = TPUAligner(fm)
matr = jnp.asarray(rng.integers(0, 4, (2 * 32768, L)).astype(np.int8))
matp = jnp.asarray(np.full((2 * 32768, L), 6, np.uint8))
small = np.zeros((B, 4), np.int32)
small[:, 0] = rng.integers(0, 2 * 32768, B)
small[:, 1] = 100
small[:, 2] = C
small[:, 3] = rng.integers(0, fm.n - C, B)
d_small = jnp.asarray(small)
bench("mat-path DP 16K", lambda: al._sw_bt_fn_mat(
    d_small, matr, matp, al.idx.ref_words, al.swp, L, C))

# direct kernel with pre-gathered inputs
from omp_bowtie2_prime_tpu.ops.sw_pallas import sw_e2e_backtrace_pallas

reads = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int8))
pens = jnp.asarray(np.full((B, L), 6, np.uint8))
rdl = jnp.asarray(np.full(B, 100, np.int32))
refs = jnp.asarray(rng.integers(0, 4, (B, C)).astype(np.int8))
wld = jnp.asarray(np.full(B, C, np.int32))


@jax.jit
def direct(reads, pens, rdl, refs, wld):
    out = sw_e2e_backtrace_pallas(reads, pens, rdl, refs, wld, al.swp)
    return out[0].sum()


bench("direct pallas DP 16K (sum only)", direct, reads, pens, rdl, refs, wld)

# gathers + kernel but WITHOUT the packed-int32 output re-pack
@jax.jit
def mat_nopack(small, matr, matp, refw):
    rows = small[:, 0]
    r = matr[rows]
    p = matp[rows]
    refs = gather_ref_windows(refw, small[:, 3], small[:, 2], C)
    out = sw_e2e_backtrace_pallas(r, p, small[:, 1], refs, small[:, 2],
                                  al.swp)
    return out[0].sum()


bench("mat gathers + kernel, no output pack", mat_nopack, d_small, matr,
      matp, al.idx.ref_words)
