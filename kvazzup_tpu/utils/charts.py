"""Chart rendering for the statistics window — the ChartPainter analogue
(/root/reference/src/ui/gui/chartpainter.cpp, 601 LoC of QPainter line
charts) re-targeted at a headless stack: pure-Python SVG line charts plus
an HTML assembly of the StatisticsWindow tabs (statisticswindow.h:18-234:
sessions / delivery / filter / SIP).  No dependencies; the output renders
in any browser and embeds in reports.
"""

from __future__ import annotations

import html
import time


def svg_line_chart(series: dict[str, list[float]], *, title: str = "",
                   width: int = 480, height: int = 160, y_unit: str = "",
                   max_points: int = 240) -> str:
    """One multi-series line chart as an SVG string.

    series: name -> samples (oldest first).  Axes auto-scale over the
    union; a small legend maps colors to names (the reference draws the
    same layout per chartpainter.cpp: frame, ticks, legend, polyline)."""
    palette = ("#1f77b4", "#d62728", "#2ca02c", "#9467bd", "#ff7f0e",
               "#8c564b", "#17becf")
    pad_l, pad_r, pad_t, pad_b = 46, 10, 22, 18
    iw, ih = width - pad_l - pad_r, height - pad_t - pad_b
    clipped = {k: list(v)[-max_points:] for k, v in series.items() if v}
    allv = [x for v in clipped.values() for x in v]
    lo = min(allv) if allv else 0.0
    hi = max(allv) if allv else 1.0
    if hi == lo:
        hi = lo + 1.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="sans-serif" font-size="10">',
        f'<rect x="0" y="0" width="{width}" height="{height}" fill="white"/>',
        f'<rect x="{pad_l}" y="{pad_t}" width="{iw}" height="{ih}" '
        f'fill="none" stroke="#888"/>',
    ]
    if title:
        parts.append(f'<text x="{pad_l}" y="14" font-size="12">'
                     f"{html.escape(title)}</text>")
    for frac in (0.0, 0.5, 1.0):  # y ticks
        yv = lo + (hi - lo) * (1 - frac)
        yy = pad_t + ih * frac
        parts.append(f'<line x1="{pad_l}" y1="{yy:.1f}" x2="{pad_l + iw}" '
                     f'y2="{yy:.1f}" stroke="#eee"/>')
        parts.append(f'<text x="{pad_l - 4}" y="{yy + 3:.1f}" '
                     f'text-anchor="end">{yv:.3g}{y_unit}</text>')
    for i, (name, vals) in enumerate(sorted(clipped.items())):
        color = palette[i % len(palette)]
        n = len(vals)
        pts = []
        for j, v in enumerate(vals):
            x = pad_l + (iw * j / max(n - 1, 1))
            y = pad_t + ih * (1 - (v - lo) / (hi - lo))
            pts.append(f"{x:.1f},{y:.1f}")
        parts.append(f'<polyline fill="none" stroke="{color}" '
                     f'stroke-width="1.5" points="{" ".join(pts)}"/>')
        lx = pad_l + 6 + 110 * i
        parts.append(f'<line x1="{lx}" y1="{height - 6}" x2="{lx + 14}" '
                     f'y2="{height - 6}" stroke="{color}" stroke-width="2"/>')
        parts.append(f'<text x="{lx + 18}" y="{height - 3}">'
                     f"{html.escape(name)}</text>")
    parts.append("</svg>")
    return "".join(parts)


def render_html(stats) -> str:
    """The StatisticsWindow as one self-contained HTML page: session
    table, per-stage delay chart, per-stream bitrate chart, buffer
    levels, counters, and the SIP log tab."""
    with stats._lock:
        sessions = list(stats._sessions.values())
        delays = {k: [1e3 * x for x in v] for k, v in stats._delays.items() if v}
        streams = {k: list(v) for k, v in stats._bitrate_samples.items() if v}
        buffers = dict(stats._buffer_levels)
        counters = dict(stats._counters)
        values = dict(stats._values)
        sip_log = list(stats._sip_log)[-40:]
    # bitrate series: windowed kbit/s from (t, nbytes) samples
    rates = {}
    for name, samples in streams.items():
        pts, win = [], []
        for t, nb in samples:
            win.append((t, nb))
            win = [(a, b) for a, b in win if t - a <= 2.0]
            span = max(t - win[0][0], 1e-3)
            pts.append(8e-3 * sum(b for _, b in win) / span)
        rates[name] = pts

    def table(rows, headers):
        out = ["<table border='1' cellspacing='0' cellpadding='3'>",
               "<tr>" + "".join(f"<th>{html.escape(h)}</th>" for h in headers) + "</tr>"]
        for r in rows:
            out.append("<tr>" + "".join(
                f"<td>{html.escape(str(c))}</td>" for c in r) + "</tr>")
        out.append("</table>")
        return "".join(out)

    doc = ["<!doctype html><html><head><meta charset='utf-8'>"
           "<title>kvazzup_tpu statistics</title></head><body>",
           f"<h2>kvazzup_tpu statistics</h2><p>{time.strftime('%F %T')}</p>"]
    doc.append("<h3>Sessions</h3>")
    doc.append(table([(s.session_id, getattr(s, "address", ""))
                      for s in sessions], ("id", "address")) or "")
    if delays:
        doc.append("<h3>Stage delays</h3>")
        doc.append(svg_line_chart(delays, title="per-stage delay",
                                  y_unit="ms"))
    if rates:
        doc.append("<h3>Stream bitrates</h3>")
        doc.append(svg_line_chart(rates, title="bitrate", y_unit="kb/s"))
    if buffers:
        doc.append("<h3>Buffers</h3>")
        doc.append(table([(k, f"{l}/{s}") for k, (l, s) in buffers.items()],
                         ("filter", "level")))
    if counters or values:
        doc.append("<h3>Counters</h3>")
        doc.append(table(sorted(counters.items()) + sorted(values.items()),
                         ("key", "value")))
    if sip_log:
        doc.append("<h3>SIP log</h3>")
        doc.append(table([(time.strftime("%T", time.localtime(t)), d, f)
                          for t, d, f, _ in sip_log],
                         ("time", "dir", "first line")))
    doc.append("</body></html>")
    return "".join(doc)
