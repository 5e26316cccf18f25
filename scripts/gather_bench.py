#!/usr/bin/env python3
"""How does TPU row-gather cost scale with row width / index order /
batch? Gates the FM block-record layout redesign."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

print(f"## devices {jax.devices()}", flush=True)

N = 360_000  # ~46 Mbp / 128 blocks
B = 65536
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
idx_sorted = jnp.asarray(np.sort(rng.integers(0, N, B).astype(np.int32)))


def timed(label, fn, n=5):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"## {label}: best {min(ts)*1e3:.2f} ms", flush=True)
    return min(ts)


for W in (4, 8, 16, 17, 32, 64, 128):
    tab = jnp.asarray(rng.integers(0, 2**31, (N, W)).astype(np.uint32))
    f = jax.jit(lambda t, i: jnp.sum(t[i], axis=-1))
    timed(f"gather [N,{W}]u32 B=64K rand", lambda t=tab, i=idx: f(t, i))
    del tab

tab17 = jnp.asarray(rng.integers(0, 2**31, (N, 17)).astype(np.uint32))
f = jax.jit(lambda t, i: jnp.sum(t[i], axis=-1))
timed("gather [N,17] B=64K SORTED idx", lambda: f(tab17, idx_sorted))
for b in (8192, 16384, 32768, 131072):
    ib = jnp.asarray(rng.integers(0, N, b).astype(np.int32))
    timed(f"gather [N,17] B={b} rand", lambda i=ib: f(tab17, i))

# int8 view
tab8 = jnp.asarray(rng.integers(0, 255, (N, 68)).astype(np.uint8))
f8 = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.int32), axis=-1))
timed("gather [N,68]u8 B=64K rand", lambda: f8(tab8, idx))

# smaller table (fits VMEM?)
N2 = 40_000  # lambda-scale
tabs = jnp.asarray(rng.integers(0, 2**31, (N2, 17)).astype(np.uint32))
idx2 = jnp.asarray(rng.integers(0, N2, B).astype(np.int32))
timed("gather [40K,17] B=64K rand (small table)", lambda: f(tabs, idx2))

# big table (GRCh38-scale row count)
N3 = 24_000_000
tabb = jnp.asarray(
    np.zeros((N3, 17), np.uint32)
)
idx3 = jnp.asarray(rng.integers(0, N3, B).astype(np.int32))
timed("gather [24M,17] B=64K rand (3Gbp-scale)", lambda: f(tabb, idx3))
