"""Pallas SW kernel: output equality with the XLA formulation.

Runs compiled on TPU; in the CPU test environment the Pallas kernel runs
in interpreter mode (pl.pallas_call(interpret=...) is not plumbed through
here, so the test is skipped off-TPU — the TPU driver exercises it)."""

import jax
import numpy as np
import pytest

from omp_bowtie2_prime_tpu.ops import sw

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas TPU kernel needs a TPU backend",
)


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

