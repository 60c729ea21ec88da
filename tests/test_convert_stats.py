"""Format-conversion funnel + screen source + statistics dashboard
(reference: libyuvconverter.cpp, screensharefilter.cpp, statisticswindow)."""

import time

import numpy as np
import pytest

from kvazzup_tpu.io.convert import convert_to_i420


@pytest.fixture(scope="module")
def rgb():
    return np.random.default_rng(0).integers(0, 255, (32, 64, 3)).astype(np.uint8)


def test_rgb_bgr_agree(rgb):
    y1, u1, v1 = convert_to_i420("RGB24", rgb)
    y2, u2, v2 = convert_to_i420("BGR24", np.ascontiguousarray(rgb[:, :, ::-1]))
    assert np.array_equal(y1, y2) and np.array_equal(u1, u2)


def test_alpha_formats(rgb):
    h, w, _ = rgb.shape
    a = np.full((h, w, 1), 255, np.uint8)
    y0, _, _ = convert_to_i420("RGB24", rgb)
    for f, arr in (("RGBA", np.concatenate([rgb, a], -1)),
                   ("BGRA", np.concatenate([rgb[:, :, ::-1], a], -1)),
                   ("ARGB", np.concatenate([a, rgb], -1))):
        y, _, _ = convert_to_i420(f, np.ascontiguousarray(arr))
        assert np.array_equal(y, y0), f


def test_planar_and_semiplanar(rgb):
    y1, u1, v1 = convert_to_i420("RGB24", rgb)
    h, w = y1.shape
    raw = np.concatenate([y1.ravel(), u1.ravel(), v1.ravel()]).tobytes()
    assert np.array_equal(convert_to_i420("I420", raw, w, h)[0], y1)
    nv12 = np.concatenate([y1.ravel(), np.dstack([u1, v1]).ravel()]).tobytes()
    _, u2, v2 = convert_to_i420("NV12", nv12, w, h)
    assert np.array_equal(u2, u1) and np.array_equal(v2, v1)
    nv21 = np.concatenate([y1.ravel(), np.dstack([v1, u1]).ravel()]).tobytes()
    _, u3, v3 = convert_to_i420("NV21", nv21, w, h)
    assert np.array_equal(u3, u1)


def test_yuyv_uyvy():
    h, w = 16, 32
    rng = np.random.default_rng(1)
    yuyv = rng.integers(0, 255, (h, w * 2)).astype(np.uint8)
    y1, u1, v1 = convert_to_i420("YUY2", yuyv.tobytes(), w, h)
    assert y1.shape == (h, w) and u1.shape == (h // 2, w // 2)
    # UYVY byte-swapped input produces identical planes
    pairs = yuyv.reshape(h, w, 2)[..., ::-1]
    y2, u2, v2 = convert_to_i420("UYVY", pairs.tobytes(), w, h)
    assert np.array_equal(y1, y2) and np.array_equal(u1, u2)


def test_mjpeg(rgb):
    cv2 = pytest.importorskip("cv2")
    ok, jpg = cv2.imencode(".jpg", rgb[:, :, ::-1])
    assert ok
    y, u, v = convert_to_i420("MJPG", jpg.tobytes())
    assert y.shape == rgb.shape[:2]
    # lossy but close
    y0, _, _ = convert_to_i420("RGB24", rgb)
    assert np.abs(y.astype(int) - y0.astype(int)).mean() < 16


def test_gray_and_unknown(rgb):
    y0, _, _ = convert_to_i420("RGB24", rgb)
    y, u, v = convert_to_i420("GRAY", y0)
    assert np.array_equal(y, y0) and int(u[0, 0]) == 128
    with pytest.raises(ValueError):
        convert_to_i420("XXXX", b"")


def test_screen_source_paces():
    from kvazzup_tpu.io.capture import ScreenSource

    got = []
    s = ScreenSource(got.append, 128, 64, fps=100.0)
    s.start()
    time.sleep(0.15)
    s.stop()
    assert len(got) >= 5
    assert got[0].y.shape == (64, 128)
    assert not np.array_equal(got[0].y, got[-1].y)  # cursor moves


def test_dashboard_renders():
    from kvazzup_tpu.utils.stats import Statistics, render_dashboard

    st = Statistics()
    st.record_delay("encode", 0.02)
    st.record_delay("encode", 0.025)
    st.record_bytes("video_send", 50_000)
    st.update_buffer_level("video_send", 3, 10)
    st.increment("video_frames_dropped", 2)
    st.add_sip_message("out", "INVITE sip:x@y SIP/2.0")
    text = render_dashboard(st)
    for frag in ("encode", "video_send", "video_frames_dropped", "INVITE"):
        assert frag in text, frag
