"""Pallas SW kernel: output equality with the XLA formulation.

The compiled-equality tests run on TPU only; the interpret-mode tests
run the same kernels through the Pallas interpreter on any backend
(semantics without Mosaic — lowering is covered separately by
tests/test_sw_pallas_lowering.py)."""

import functools

import jax
import numpy as np
import pytest
from jax.experimental import pallas as pl

from omp_bowtie2_prime_tpu.ops import sw

on_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas TPU kernel needs a TPU backend",
)


@pytest.fixture
def pallas_interpret(monkeypatch):
    """Run pl.pallas_call in interpreter mode inside sw_pallas (fresh
    jit caches so compiled traces don't leak across modes)."""
    import omp_bowtie2_prime_tpu.ops.sw_pallas as swp

    monkeypatch.setattr(
        swp.pl, "pallas_call", functools.partial(pl.pallas_call,
                                                 interpret=True)
    )
    jax.clear_caches()
    yield
    jax.clear_caches()


def _e2e_case(seed=3):
    rng = np.random.default_rng(seed)
    B, L, W = 256, 160, 96
    return (
        rng.integers(0, 5, (B, L)).astype(np.int32),
        rng.integers(2, 7, (B, L)).astype(np.int32),
        rng.integers(30, L, B).astype(np.int32),
        rng.integers(0, 5, (B, W)).astype(np.int32),
        rng.integers(60, W, B).astype(np.int32),
    )


def test_e2e_pallas_interpret_matches_xla(pallas_interpret):
    from omp_bowtie2_prime_tpu.ops.sw_pallas import sw_e2e_backtrace_pallas

    args = _e2e_case(3)
    p = sw.SWParams()
    o1 = sw.sw_e2e_backtrace_batch(*args, p)
    o2 = sw_e2e_backtrace_pallas(*args, p)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_local_pallas_interpret_matches_xla(pallas_interpret):
    from omp_bowtie2_prime_tpu.ops.sw_pallas import sw_local_backtrace_pallas

    args = _e2e_case(11)
    p = sw.SWParams(ma=2, rdg_open=5, rdg_ext=3, rfg_open=5, rfg_ext=3)
    o1 = sw.sw_local_backtrace_batch(*args, p)
    o2 = sw_local_backtrace_pallas(*args, p)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@on_tpu


def test_pallas_matches_xla():
    from omp_bowtie2_prime_tpu.ops.sw_pallas import sw_e2e_backtrace_pallas

    rng = np.random.default_rng(3)
    B, L, W = 256, 160, 200
    reads = rng.integers(0, 5, (B, L)).astype(np.int32)
    pens = rng.integers(2, 7, (B, L)).astype(np.int32)
    rdlens = rng.integers(30, L, B).astype(np.int32)
    refs = rng.integers(0, 5, (B, W)).astype(np.int32)
    wlens = rng.integers(60, W, B).astype(np.int32)
    p = sw.SWParams()
    o1 = jax.jit(sw.sw_e2e_backtrace_batch, static_argnums=5)(
        reads, pens, rdlens, refs, wlens, p
    )
    o2 = jax.jit(sw_e2e_backtrace_pallas, static_argnums=5)(
        reads, pens, rdlens, refs, wlens, p
    )
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@on_tpu
def test_local_pallas_matches_xla():
    from omp_bowtie2_prime_tpu.ops.sw_pallas import sw_local_backtrace_pallas

    rng = np.random.default_rng(11)
    B, L, W = 256, 160, 200
    reads = rng.integers(0, 5, (B, L)).astype(np.int32)
    pens = rng.integers(2, 7, (B, L)).astype(np.int32)
    rdlens = rng.integers(30, L, B).astype(np.int32)
    refs = rng.integers(0, 5, (B, W)).astype(np.int32)
    wlens = rng.integers(60, W, B).astype(np.int32)
    p = sw.SWParams(ma=2, rdg_open=5, rdg_ext=3, rfg_open=5, rfg_ext=3)
    o1 = jax.jit(sw.sw_local_backtrace_batch, static_argnums=5)(
        reads, pens, rdlens, refs, wlens, p
    )
    o2 = jax.jit(sw_local_backtrace_pallas, static_argnums=5)(
        reads, pens, rdlens, refs, wlens, p
    )
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

