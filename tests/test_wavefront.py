"""The wavefront (WPP-skew) schedule must be bit-exact vs the raster scan."""

import numpy as np
import jax.numpy as jnp
import pytest

from kvazzup_tpu.encoder.frame_intra import encode_frame_intra, encode_frame_intra_raster
from kvazzup_tpu.io.yuv import synthetic_frames

KEYS = ["mode", "lev_y", "lev_cb", "lev_cr", "recon_y", "recon_u", "recon_v"]


@pytest.mark.parametrize("wh", [(64, 48), (48, 96), (160, 32)])
def test_wavefront_matches_raster(wh):
    w, h = wh
    y, u, v = synthetic_frames(w, h, 1, seed=11)[0]
    args = (jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), jnp.int32(30))
    a = encode_frame_intra_raster(*args, width=w, height=h)
    b = encode_frame_intra(*args, width=w, height=h)
    for k in KEYS:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
