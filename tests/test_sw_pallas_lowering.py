"""Pallas DP kernel must lower for TPU under global x64 (large-index
pipelines flip jax_enable_x64 on). Lowering-only via jax.export — runs on
any backend, unlike tests/test_sw_pallas.py's execution tests."""

import jax
import pytest

from omp_bowtie2_prime_tpu.ops import sw

def test_pallas_lowers_for_tpu_under_x64():
    """Large-index (.bt2l-scale) pipelines enable jax_enable_x64 globally;
    the Pallas DP kernel must still lower for TPU (it recursed in Mosaic's
    convert_element_type rule before the scoped-x32 fix). Pure lowering —
    runs on any backend via jax.export."""
    import jax.numpy as jnp

    from omp_bowtie2_prime_tpu.ops.sw_pallas import sw_e2e_backtrace_pallas

    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        B, L, W = 256, 160, 224
        args = (
            jnp.zeros((B, L), jnp.int32), jnp.ones((B, L), jnp.int32),
            jnp.full((B,), 100, jnp.int32), jnp.zeros((B, W), jnp.int32),
            jnp.full((B,), 200, jnp.int32),
        )
        p = sw.SWParams()
        f = jax.jit(sw_e2e_backtrace_pallas, static_argnums=5)
        exp = jax.export.export(f, platforms=("tpu",))(*args, p)
        assert len(exp.mlir_module()) > 0
    finally:
        jax.config.update("jax_enable_x64", prev)


def test_local_pallas_lowers_for_tpu():
    """The local-mode Pallas kernel (match bonus, zero floor, H==0 stop
    bits, in-loop best-cell tracking) must lower for TPU, including under
    global x64 like its e2e sibling."""
    import jax.numpy as jnp

    from omp_bowtie2_prime_tpu.ops.sw_pallas import sw_local_backtrace_pallas

    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        B, L, W = 256, 160, 224
        args = (
            jnp.zeros((B, L), jnp.int32), jnp.ones((B, L), jnp.int32),
            jnp.full((B,), 100, jnp.int32), jnp.zeros((B, W), jnp.int32),
            jnp.full((B,), 200, jnp.int32),
        )
        p = sw.SWParams(ma=2, rdg_open=5, rdg_ext=3, rfg_open=5, rfg_ext=3)
        f = jax.jit(sw_local_backtrace_pallas, static_argnums=5)
        exp = jax.export.export(f, platforms=("tpu",))(*args, p)
        assert len(exp.mlir_module()) > 0
    finally:
        jax.config.update("jax_enable_x64", prev)
