"""Matmul (MXU) kernel formulations must be bit-identical to reference ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvazzup_tpu.ops import ctu_kernels as ck
from kvazzup_tpu.ops import intra as intra_ops
from kvazzup_tpu.ops.satd import satd_blocks
from kvazzup_tpu.ops.transforms import fwd_transform, inv_transform


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("dst", [False, True])
def test_transforms_flat_match(log2, dst):
    if dst and log2 != 2:
        dst = False
    n = 1 << log2
    rng = np.random.default_rng(log2)
    resid = rng.integers(-255, 256, (8, n, n)).astype(np.int32)
    ref_c = fwd_transform(jnp.asarray(resid), log2, dst)
    flat_c = ck.fwd_transform_flat(jnp.asarray(resid.reshape(8, n * n)), log2, dst)
    np.testing.assert_array_equal(np.asarray(ref_c).reshape(8, -1), np.asarray(flat_c))

    coef = rng.integers(-32768, 32768, (8, n, n)).astype(np.int32)
    ref_r = inv_transform(jnp.asarray(coef), log2, dst)
    flat_r = ck.inv_transform_flat(jnp.asarray(coef.reshape(8, n * n)), log2, dst)
    np.testing.assert_array_equal(np.asarray(ref_r).reshape(8, -1), np.asarray(flat_r))


@pytest.mark.parametrize("log2", [3, 4])
def test_satd_flat_match(log2):
    n = 1 << log2
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (12, n, n)).astype(np.int32)
    b = rng.integers(0, 256, (12, n, n)).astype(np.int32)
    ref = satd_blocks(jnp.asarray(a), jnp.asarray(b))
    flat = ck.satd_flat(jnp.asarray(a.reshape(12, -1)), jnp.asarray(b.reshape(12, -1)), log2)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(flat))


@pytest.mark.parametrize("log2,is_luma", [(3, False), (3, True), (4, True), (5, True), (2, True)])
def test_intra_flat_match(log2, is_luma):
    n = 1 << log2
    rng = np.random.default_rng(log2 * 10 + is_luma)
    for trial in range(4):
        a = rng.integers(0, 256, (6, 4 * n + 1)).astype(np.int32)
        ref = np.stack(
            [np.asarray(intra_ops.predict_all_modes(jnp.asarray(ai), log2, is_luma)) for ai in a]
        )
        flat = np.asarray(ck.predict_all_modes_flat(jnp.asarray(a), log2, is_luma))
        np.testing.assert_array_equal(ref.reshape(6, 35, -1), flat)
