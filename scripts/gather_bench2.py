#!/usr/bin/env python3
"""Gather-cost measurement robust to async dispatch: run K CHAINED
gathers inside one jit (each feeding the next index), copy one scalar
back; per-gather cost = (t(K) - t(1)) / (K-1)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

print(f"## devices {jax.devices()}", flush=True)

N = 360_000
B = 65536
rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(0, N, B).astype(np.int32))


def chain(tab, K):
    W = tab.shape[1]

    @jax.jit
    def f(i):
        def body(_, i):
            rows = tab[i]
            s = jnp.sum(rows.astype(jnp.uint32), axis=-1)
            return ((i + s) % N).astype(jnp.int32)

        i = jax.lax.fori_loop(0, K, body, i)
        return jnp.sum(i)

    return f


def timed_chain(label, tab, K1=4, K2=68, n=4):
    f1, f2 = chain(tab, K1), chain(tab, K2)
    np.asarray(f1(idx0)); np.asarray(f2(idx0))
    t1s, t2s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); np.asarray(f1(idx0))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(f2(idx0))
        t2s.append(time.perf_counter() - t0)
    per = (min(t2s) - min(t1s)) / (K2 - K1) * 1e3
    bw = B * tab.shape[1] * 4 / (per / 1e3) / 1e9 if per > 0 else 0
    print(f"## {label}: {per:.3f} ms/gather ({bw:.0f} GB/s eff) "
          f"[t{K1}={min(t1s)*1e3:.0f}ms t{K2}={min(t2s)*1e3:.0f}ms]",
          flush=True)


for W in (8, 16, 17, 32, 128):
    tab = jnp.asarray(rng.integers(0, 2**31, (N, W)).astype(np.uint32))
    timed_chain(f"[N,{W}]u32 B=64K chained", tab)
    del tab

# B scaling at W=17
tab17 = jnp.asarray(rng.integers(0, 2**31, (N, 17)).astype(np.uint32))


def chainB(tab, K, b):
    i0 = jnp.asarray(rng.integers(0, N, b).astype(np.int32))

    @jax.jit
    def f(i):
        def body(_, i):
            rows = tab[i]
            s = jnp.sum(rows.astype(jnp.uint32), axis=-1)
            return ((i + s) % N).astype(jnp.int32)

        return jnp.sum(jax.lax.fori_loop(0, K, body, i))

    return f, i0


for b in (8192, 65536, 262144):
    f1, i1 = chainB(tab17, 4, b)
    f2, i2 = chainB(tab17, 68, b)
    np.asarray(f1(i1)); np.asarray(f2(i2))
    t1 = min(
        [
            (lambda t0=time.perf_counter(): (np.asarray(f1(i1)), time.perf_counter() - t0)[1])()
            for _ in range(4)
        ]
    )
    t2 = min(
        [
            (lambda t0=time.perf_counter(): (np.asarray(f2(i2)), time.perf_counter() - t0)[1])()
            for _ in range(4)
        ]
    )
    per = (t2 - t1) / 64 * 1e3
    print(f"## [N,17] B={b}: {per:.3f} ms/gather "
          f"({b*17*4/(per/1e3)/1e9:.0f} GB/s eff)", flush=True)
