"""DisplaySink: the live render surface (DisplayFilter + VideoYUVWidget
parity — mirroring, YUV->RGB, real blit targets with honest fallback)."""

import io
import os

import numpy as np

from kvazzup_tpu.io.display import DisplaySink
from kvazzup_tpu.io.yuv import synthetic_frames


def test_fbdev_blit(tmp_path):
    fw, fh, bpp = 160, 120, 4
    fb = tmp_path / "fb0"
    fb.write_bytes(b"\0" * (fw * fh * bpp))
    sink = DisplaySink("fbdev", fb_path=str(fb), fb_geometry=(fw, fh, bpp))
    y, u, v = synthetic_frames(96, 64, 1, seed=6)[0]
    sink(y, u, v)
    assert sink.frames_presented == 1
    buf = np.frombuffer(fb.read_bytes(), np.uint8).reshape(fh, fw, bpp)
    assert buf.any()  # pixels landed
    # centered blit: corners stay black
    assert not buf[0, 0].any() and not buf[-1, -1].any()
    # spot-check BGRX channel order against the converter
    rgb = sink.last_rgb
    oh, ow = rgb.shape[:2]
    x0, y0 = (fw - ow) // 2, (fh - oh) // 2
    np.testing.assert_array_equal(buf[y0, x0, 2], rgb[0, 0, 0])  # R
    np.testing.assert_array_equal(buf[y0, x0, 0], rgb[0, 0, 2])  # B


def test_kitty_and_sixel_emit():
    y, u, v = synthetic_frames(32, 32, 1, seed=7)[0]
    out = io.StringIO()
    sink = DisplaySink("kitty", out=out)
    sink(y, u, v)
    s = out.getvalue()
    assert s.startswith("\x1b_Gf=24,a=T,s=32,v=32")
    out2 = io.StringIO()
    sink2 = DisplaySink("sixel", out=out2)
    sink2(y, u, v)
    s2 = out2.getvalue()
    assert s2.startswith("\x1bPq") and s2.endswith("\x1b\\")


def test_null_auto_and_mirror():
    os.environ.pop("TERM", None)
    sink = DisplaySink("auto", fb_path="/nonexistent/fb", mirror_h=True)
    assert sink.backend == "null"
    y, u, v = synthetic_frames(32, 32, 1, seed=8)[0]
    sink(y, u, v)
    plain = DisplaySink("null")
    plain(y, u, v)
    np.testing.assert_array_equal(sink.last_rgb, plain.last_rgb[:, ::-1])


def test_receive_pipeline_accepts_sink():
    """DisplaySink is a drop-in display callback for the receive path."""
    from kvazzup_tpu.io.display import DisplaySink

    sink = DisplaySink("null")
    y, u, v = synthetic_frames(32, 32, 1, seed=9)[0]
    sink(np.asarray(y), np.asarray(u), np.asarray(v))
    assert sink.frames_presented == 1
