"""Pallas sao_apply == the XLA reference, bit for bit (interpret mode).

The TPU path runs the fused strip kernel (ops/sao._sao_apply_pallas);
CPU CI validates it with the Pallas interpreter against the reference
one-hot-select implementation on randomized params/planes.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from kvazzup_tpu.ops.sao import _sao_apply_pallas, sao_apply


@pytest.mark.parametrize("ctb", [16, 32, 64])
def test_sao_pallas_matches_reference(ctb):
    rng = np.random.default_rng(ctb)
    h, w = 2 * ctb + ctb, 4 * ctb  # non-square, multiple strips
    rec = rng.integers(0, 256, (h, w), np.uint8)
    cbh, cbw = h // ctb, w // ctb
    typ = rng.integers(0, 3, (cbh, cbw), np.int32)
    aux = np.where(typ == 2, rng.integers(0, 4, (cbh, cbw)),
                   rng.integers(0, 29, (cbh, cbw))).astype(np.int32)
    offs = rng.integers(-7, 8, (cbh, cbw, 4), np.int32)
    ref = np.asarray(sao_apply(jnp.asarray(rec), jnp.asarray(typ),
                               jnp.asarray(aux), jnp.asarray(offs), ctb=ctb))
    got = np.asarray(_sao_apply_pallas(
        jnp.asarray(rec, jnp.int32), jnp.asarray(typ), jnp.asarray(aux),
        jnp.asarray(offs), ctb=ctb, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_sao_pallas_band_only():
    rng = np.random.default_rng(7)
    ctb, h, w = 32, 64, 128
    rec = rng.integers(0, 256, (h, w), np.uint8)
    cbh, cbw = h // ctb, w // ctb
    typ = np.full((cbh, cbw), 1, np.int32)
    aux = rng.integers(0, 29, (cbh, cbw)).astype(np.int32)
    offs = rng.integers(-7, 8, (cbh, cbw, 4), np.int32)
    ref = np.asarray(sao_apply(jnp.asarray(rec), jnp.asarray(typ),
                               jnp.asarray(aux), jnp.asarray(offs), ctb=ctb))
    got = np.asarray(_sao_apply_pallas(
        jnp.asarray(rec, jnp.int32), jnp.asarray(typ), jnp.asarray(aux),
        jnp.asarray(offs), ctb=ctb, interpret=True))
    np.testing.assert_array_equal(ref, got)
