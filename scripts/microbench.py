#!/usr/bin/env python3
"""Decompose the two dominant phases (searchResolve, extendDP) into
put / on-chip / copy-back components on the real chip, plus the raw
dispatch round-trip floor. Feeds the BASELINE phase table."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print(f"## devices {jax.devices()}", flush=True)

from omp_bowtie2_prime_tpu.index.format import FMIndex
from omp_bowtie2_prime_tpu.models.aligner import (
    TPUAligner, AlignOpts, _rank_frame_mega, P_CAP,
)

IDX = "/tmp/bt2prof/idx46M.npz"
fm = FMIndex.load(IDX)
al = TPUAligner(fm)
o = al.opts


def timed(label, fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"## {label}: best {min(ts)*1e3:.1f} ms of {[f'{t*1e3:.0f}' for t in ts]}",
          flush=True)
    return min(ts)


# ---- dispatch round-trip floor ----
one = jnp.ones(8, jnp.int32)
f_triv = jax.jit(lambda x: x + 1)
np.asarray(f_triv(one))
timed("roundtrip_trivial (jit add + copy 32B)", lambda: np.asarray(f_triv(one)))

# ---- searchResolve decomposition ----
rng = np.random.default_rng(0)
NC, SB, L = 8, o.seed_batch, o.seed_len
seeds3 = rng.integers(0, 4, (NC, SB, L)).astype(np.int8)
valid2 = np.ones((NC, SB), bool)
npad = 16384
lens_pad = np.full(npad, 100, np.int32)
mgn_pad = np.full(npad, 15, np.int32)
rok_pad = np.ones(npad, bool)
m_ri = rng.integers(0, npad, NC * SB).astype(np.int32)
m_ri.sort()
m_fw = np.ones(NC * SB, bool)
m_off = rng.integers(0, 70, NC * SB).astype(np.int32)

put = timed("put seeds3 (8x32768x22 int8 = 5.8MB)",
            lambda: jax.block_until_ready(jnp.asarray(seeds3)))
dev_seeds = jnp.asarray(seeds3)
dev_valid = jnp.asarray(valid2)
dev_ri = jnp.asarray(m_ri)
dev_fw = jnp.asarray(m_fw)
dev_off = jnp.asarray(m_off)
dev_lens = jnp.asarray(lens_pad)
dev_mgn = jnp.asarray(mgn_pad)
dev_rok = jnp.asarray(rok_pad)
tn = np.int32(fm.n)

kw = dict(range_cap=o.range_cap, expand=o.resolve_expand,
          max_elts=o.max_elts_per_read, max_dp=o.max_dp_per_read,
          p_cap=P_CAP)


def mega():
    return _rank_frame_mega(al.idx, dev_seeds, dev_valid, dev_ri, dev_fw,
                            dev_off, dev_lens, dev_mgn, dev_rok, tn, **kw)


r = jax.block_until_ready(mega())  # compile
timed("rank_frame_mega ON-CHIP (8x32K seeds, block_until_ready)",
      lambda: jax.block_until_ready(mega()))
timed("rank_frame_mega result copy (np.asarray of ready result)",
      lambda: np.asarray(r))

# seed search alone (no resolve/rank): isolate the LF-loop cost
from omp_bowtie2_prime_tpu.ops import seed_search


@jax.jit
def search_only(idx, s3, v2):
    def one(args):
        s, v = args
        return seed_search.search_seeds(idx, s, v)

    return jax.lax.map(one, (s3, v2))


jax.block_until_ready(search_only(al.idx, dev_seeds, dev_valid))
timed("search_seeds only ON-CHIP (8x32K, 10 LF steps)",
      lambda: jax.block_until_ready(search_only(al.idx, dev_seeds, dev_valid)))

# one chunk (not lax.map'ed) for per-chunk scaling
@jax.jit
def search_one(idx, s, v):
    return seed_search.search_seeds(idx, s, v)


jax.block_until_ready(search_one(al.idx, dev_seeds[0], dev_valid[0]))
timed("search_seeds 1x32K ON-CHIP",
      lambda: jax.block_until_ready(search_one(al.idx, dev_seeds[0], dev_valid[0])))

# resolve walk alone
from omp_bowtie2_prime_tpu.ops import walk

rows = rng.integers(0, fm.nrows, SB // 2).astype(np.int32)
dev_rows = jnp.asarray(rows)
dev_rv = jnp.asarray(np.ones(SB // 2, bool))


@jax.jit
def resolve_only(idx, r, v):
    return walk.resolve_rows(idx, r, v)


jax.block_until_ready(resolve_only(al.idx, dev_rows, dev_rv))
timed("resolve_rows 16K lanes ON-CHIP (srate=8 steps)",
      lambda: jax.block_until_ready(resolve_only(al.idx, dev_rows, dev_rv)))

# ---- extendDP decomposition ----
B, Lr, C = 16384, o.l_max, o.dp_cols
reads_m = rng.integers(0, 4, (2 * B, Lr)).astype(np.int8)
pens_m = np.full((2 * B, Lr), 6, np.uint8)
al._mat_lens = np.full(B, 100, np.int32)
al._dev_mat = (jnp.asarray(reads_m), jnp.asarray(pens_m))
small = np.zeros((B, 4), np.int32)
small[:, 0] = rng.integers(0, 2 * B, B)
small[:, 1] = 100
small[:, 2] = C
small[:, 3] = rng.integers(0, fm.n - C, B)

put_small = timed("put DP small (16384x4 int32)",
                  lambda: jax.block_until_ready(jnp.asarray(small)))
dev_small = jnp.asarray(small)
matr, matp = al._dev_mat


def dp():
    return al._sw_bt_fn_mat(dev_small, matr, matp, al.idx.ref_words,
                            al.swp, Lr, C)


rd = jax.block_until_ready(dp())
timed("DP+trace 16384x160x224 ON-CHIP (mat path)",
      lambda: jax.block_until_ready(dp()))
timed(f"DP result copy ({rd.shape} int32 = {rd.size*4/1e6:.1f}MB)",
      lambda: np.asarray(rd))

from omp_bowtie2_prime_tpu.ops import sw

a = np.asarray(rd)
timed("unpack_ops2 host (16384 rows)",
      lambda: sw.unpack_ops2(np.ascontiguousarray(a[:, 3:]).view(np.uint8)))
