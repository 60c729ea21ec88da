"""UI-layer analogues: scale filter, hardware auto-tuning, device
enumeration, and the chart/HTML statistics window (SURVEY §2.2/§2.5:
ScaleFilter, DefaultSettings, camerainfo/microphoneinfo/screeninfo,
StatisticsWindow + ChartPainter)."""

import numpy as np

from kvazzup_tpu.io.devices import DeviceInfo, list_devices
from kvazzup_tpu.ops.colorspace import scale_i420, scale_plane, scale_rgb
from kvazzup_tpu.utils.charts import render_html, svg_line_chart
from kvazzup_tpu.utils.defaults import apply_defaults, auto_settings
from kvazzup_tpu.utils.settings import Settings
from kvazzup_tpu.utils.stats import SessionInfo, Statistics


def test_scale_plane_identity_and_mean():
    rng = np.random.default_rng(1)
    p = rng.integers(0, 256, (64, 96), np.uint8)
    assert np.array_equal(np.asarray(scale_plane(p, 64, 96)), p)
    down = np.asarray(scale_plane(p, 32, 48))
    assert down.shape == (32, 48)
    assert abs(float(down.mean()) - float(p.mean())) < 2.0
    up = np.asarray(scale_plane(p, 128, 192))
    assert up.shape == (128, 192)
    assert abs(float(up.mean()) - float(p.mean())) < 2.0


def test_scale_plane_constant_exact():
    p = np.full((40, 56), 173, np.uint8)
    for shape in ((17, 23), (80, 112), (40, 56)):
        out = np.asarray(scale_plane(p, *shape))
        assert np.all(out == 173), shape


def test_scale_i420_and_rgb_shapes():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 256, (48, 64), np.uint8)
    u = rng.integers(0, 256, (24, 32), np.uint8)
    v = rng.integers(0, 256, (24, 32), np.uint8)
    sy, su, sv = scale_i420(y, u, v, 24, 32)
    assert sy.shape == (24, 32) and su.shape == (12, 16) and sv.shape == (12, 16)
    rgb = rng.integers(0, 256, (48, 64, 3), np.uint8)
    out = np.asarray(scale_rgb(rgb, 96, 128))
    assert out.shape == (96, 128, 3)


def test_auto_settings_tiers():
    a = auto_settings()
    assert a.width >= 176 and a.height >= 144
    assert a.bitrate > 0 and a.complexity_points >= 1
    assert a.tier_source in ("tpu", "cpu")
    capped = auto_settings(max_height=480)
    assert capped.height <= 480


def test_apply_defaults_respects_user_values():
    s = Settings()
    s.set("video/width", 640)
    a = apply_defaults(s)
    assert s.value("video/width") == 640  # user value kept
    assert s.value("video/fps") == a.fps  # auto-filled


def test_list_devices_accelerator_present():
    devs = list_devices()
    assert all(isinstance(d, DeviceInfo) for d in devs)
    assert any(d.kind == "accelerator" for d in devs)


def test_charts_and_html_window():
    st = Statistics()
    st.add_session(SessionInfo(session_id=1, address="sip:bob@example"))
    for i in range(30):
        st.record_delay("encode", 0.010 + 0.001 * (i % 5))
        st.record_delay("network", 0.030)
        st.record_bytes("video#1", 4000 + 100 * i)
    st.update_buffer_level("encoder", 3, 10)
    st.increment("frames_sent", 30)
    st.add_sip_message("out", "INVITE sip:bob@example SIP/2.0")
    svg = svg_line_chart({"encode": [1, 2, 3], "net": [3, 2, 1]},
                         title="delay", y_unit="ms")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "polyline" in svg and "delay" in svg
    page = render_html(st)
    assert "<html>" in page and "</html>" in page
    assert "sip:bob@example" in page and "INVITE" in page
    assert "<svg" in page  # charts embedded
