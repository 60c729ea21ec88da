"""Pallas quant/dequant/SATD kernels vs their jnp references —
element-identical (interpret mode on the CPU test backend; the TPU
lowering is exercised by bench/sol_audit and the engine pins)."""

import os

import numpy as np
import pytest

os.environ["KVZ_TPU_PALLAS_INTERPRET"] = "1"

import jax.numpy as jnp  # noqa: E402

from kvazzup_tpu.ops import ctu_kernels as ck  # noqa: E402
from kvazzup_tpu.ops.pallas_q import (dequantize_2d, quantize_2d,  # noqa: E402
                                      satd_2d)
from kvazzup_tpu.ops.quant import dequantize, quantize  # noqa: E402


@pytest.fixture(autouse=True)
def _interp_env(monkeypatch):
    monkeypatch.setenv("KVZ_TPU_PALLAS_INTERPRET", "1")


def _ref_quantize(coef, qp_col, dz_col, log2):
    """jnp reference path (force non-pallas by passing 3D)."""
    b, k = coef.shape
    n = 1 << log2
    c3 = coef.reshape(b, k // n, n)
    qp = jnp.asarray(qp_col[:, 0])
    intra = dz_col[:, 0] == 171
    out = quantize(c3, qp, log2, jnp.asarray(intra))
    return np.asarray(out).reshape(b, k)


@pytest.mark.parametrize("log2", [4, 5])
def test_quantize_matches(log2):
    rng = np.random.default_rng(3)
    b, k = 300, (1 << log2) ** 2
    coef = rng.integers(-30000, 30000, (b, k)).astype(np.int32)
    qp = rng.integers(0, 52, (b, 1)).astype(np.int32)
    dz = np.where(rng.integers(0, 2, (b, 1)) > 0, 171, 85).astype(np.int32)
    got = np.asarray(quantize_2d(jnp.asarray(coef), jnp.asarray(qp),
                                 jnp.asarray(dz), log2))
    want = _ref_quantize(jnp.asarray(coef), qp, dz, log2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("log2", [4, 5])
def test_dequantize_matches(log2):
    rng = np.random.default_rng(5)
    b, k = 300, (1 << log2) ** 2
    n = 1 << log2
    lev = rng.integers(-32768, 32767, (b, k)).astype(np.int32)
    qp = rng.integers(0, 52, (b, 1)).astype(np.int32)
    got = np.asarray(dequantize_2d(jnp.asarray(lev), jnp.asarray(qp), log2))
    want = np.asarray(dequantize(
        jnp.asarray(lev).reshape(b, k // n, n),
        jnp.asarray(qp[:, 0]), log2)).reshape(b, k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("log2", [4, 5])
def test_satd_matches(log2):
    rng = np.random.default_rng(7)
    b, k = 300, (1 << log2) ** 2
    a = rng.integers(0, 256, (b, k)).astype(np.int32)
    c = rng.integers(0, 256, (b, k)).astype(np.int32)
    w = jnp.asarray(ck._satd_weights(log2))
    got = np.asarray(satd_2d(jnp.asarray(a), jnp.asarray(c), w, log2))
    os.environ["KVZ_TPU_NO_PALLAS"] = "1"
    try:
        want = np.asarray(ck.satd_flat(
            jnp.asarray(a[None]), jnp.asarray(c[None]), log2))[0]
    finally:
        os.environ.pop("KVZ_TPU_NO_PALLAS", None)
    np.testing.assert_array_equal(got, want)
