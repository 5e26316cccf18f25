#!/usr/bin/env python3
"""Map the TPU gather fast path (row widths around 128 lanes), confirm
at GRCh38-scale row counts, and isolate the Pallas DP kernel's on-chip
cost vs the mat-gather wrapper."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
print(f"## devices {jax.devices()}", flush=True)

rng = np.random.default_rng(0)
B = 65536


def chain_gather(tab, N, K, b=B):
    @jax.jit
    def f(i):
        def body(_, i):
            rows = tab[i]
            s = jnp.sum(rows.astype(jnp.uint32), axis=-1)
            return ((i + s) % N).astype(jnp.int32)

        return jnp.sum(jax.lax.fori_loop(0, K, body, i))

    return f


def per_gather(label, tab, N, b=B):
    i0 = jnp.asarray(rng.integers(0, N, b).astype(np.int32))
    f1, f2 = chain_gather(tab, N, 4, b), chain_gather(tab, N, 36, b)
    np.asarray(f1(i0)); np.asarray(f2(i0))
    t1 = min(_t(lambda: np.asarray(f1(i0))) for _ in range(4))
    t2 = min(_t(lambda: np.asarray(f2(i0))) for _ in range(4))
    per = (t2 - t1) / 32 * 1e3
    print(f"## {label}: {per:.3f} ms ({b*tab.shape[1]*tab.dtype.itemsize/(per/1e3)/1e9:.0f} GB/s)",
          flush=True)


def _t(fn):
    t0 = time.perf_counter(); fn(); return time.perf_counter() - t0


N = 360_000
for W in (96, 128, 256):
    tab = jnp.asarray(np.zeros((N, W), np.uint32))
    per_gather(f"[360K,{W}]u32 B=64K", tab, N)
    del tab

# GRCh38-scale: 3M blocks of 128 words (1024 rows/block)
N3 = 3_000_000
tab3 = jnp.asarray(np.zeros((N3, 128), np.uint32))
per_gather("[3M,128]u32 B=64K", tab3, N3)
del tab3

# 8-bit rows at the same byte width
tab8 = jnp.asarray(np.zeros((N, 512), np.uint8))
per_gather("[360K,512]u8 B=64K", tab8, N)
del tab8

# ---- DP kernel isolation ----
from omp_bowtie2_prime_tpu.ops.sw_pallas import sw_e2e_backtrace_pallas
from omp_bowtie2_prime_tpu.ops.sw import SWParams
from omp_bowtie2_prime_tpu.utils.scoring import Scoring

p = SWParams.from_scoring(Scoring())
L, C = 160, 224
for Bdp in (2048, 16384):
    reads = jnp.asarray(rng.integers(0, 4, (Bdp, L)).astype(np.int8))
    pens = jnp.asarray(np.full((Bdp, L), 6, np.uint8))
    rdlens = jnp.asarray(np.full(Bdp, 100, np.int32))
    refs = jnp.asarray(rng.integers(0, 4, (Bdp, C)).astype(np.int8))
    wlens = jnp.asarray(np.full(Bdp, C, np.int32))

    @jax.jit
    def dp(reads, pens, rdlens, refs, wlens):
        out = sw_e2e_backtrace_pallas(reads, pens, rdlens, refs, wlens, p)
        return jnp.sum(out[0])

    np.asarray(dp(reads, pens, rdlens, refs, wlens))
    ts = [_t(lambda: np.asarray(dp(reads, pens, rdlens, refs, wlens)))
          for _ in range(5)]
    cells = Bdp * 100 * C
    print(f"## pallas DP B={Bdp} direct: best {min(ts)*1e3:.1f} ms "
          f"({cells/min(ts)/1e9:.1f} GCUPS)", flush=True)
