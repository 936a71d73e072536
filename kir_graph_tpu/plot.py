"""
Observability plots (reference graphkir/plot.py) rendered as dependency-free
inline SVG: CN-model fit, per-gene depth profiles, read-mapping stats.
`savePlot` writes one self-contained HTML with hover-readout + drag-zoom
(inline JS, no plotly); `showPlot` serves it on localhost like the
reference's dash server (plot.py:131-138) via stdlib http.server.
"""
from __future__ import annotations

import html as _html
import json
from typing import Sequence

import numpy as np
import pandas as pd

from .utils import logger


class Figure:
    """A minimal figure: title + SVG body."""

    def __init__(self, title: str, svg: str):
        self.title = title
        self.svg = svg

    def toHtml(self) -> str:
        return f"<h3>{_html.escape(self.title)}</h3>\n{self.svg}\n"


def _polyline(xs, ys, w, h, color, x_range=None, y_range=None) -> str:
    xs, ys = np.asarray(xs, float), np.asarray(ys, float)
    if x_range is None:
        x_range = (xs.min(), xs.max() or 1)
    if y_range is None:
        y_range = (min(ys.min(), 0), ys.max() or 1)
    x0, x1 = x_range
    y0, y1 = y_range
    px = (xs - x0) / max(x1 - x0, 1e-9) * (w - 40) + 30
    py = h - 20 - (ys - y0) / max(y1 - y0, 1e-9) * (h - 40)
    pts = " ".join(f"{a:.1f},{b:.1f}" for a, b in zip(px, py))
    return f'<polyline fill="none" stroke="{color}" stroke-width="1" points="{pts}"/>'


def lineFigure(
    title: str,
    series: Sequence[tuple[str, Sequence[float], Sequence[float]]],
    w: int = 720,
    h: int = 240,
) -> Figure:
    """series: list of (label, xs, ys)."""
    colors = ["#3366cc", "#dc3912", "#ff9900", "#109618", "#990099", "#0099c6",
              "#dd4477", "#66aa00", "#b82e2e", "#316395", "#994499", "#22aa99",
              "#aaaa11", "#6633cc", "#e67300", "#8b0707"]
    all_x = np.concatenate([np.asarray(s[1], float) for s in series if len(s[1])])
    all_y = np.concatenate([np.asarray(s[2], float) for s in series if len(s[2])])
    if not len(all_x):
        return Figure(title, "<svg></svg>")
    xr = (all_x.min(), all_x.max())
    yr = (min(all_y.min(), 0), all_y.max())
    parts = [
        f'<svg width="{w}" height="{h}" class="kgt-fig" '
        f'viewBox="0 0 {w} {h}" data-x0="{xr[0]}" data-x1="{xr[1]}" '
        f'data-y0="{yr[0]}" data-y1="{yr[1]}" '
        f'xmlns="http://www.w3.org/2000/svg">'
        f'<rect width="{w}" height="{h}" fill="white" stroke="#ccc"/>'
    ]
    legend_y = 14
    for i, (label, xs, ys) in enumerate(series):
        if not len(xs):
            continue
        c = colors[i % len(colors)]
        parts.append(_polyline(xs, ys, w, h, c, xr, yr))
        parts.append(
            f'<text x="{w - 180}" y="{legend_y}" font-size="10" fill="{c}">'
            f"{_html.escape(str(label))}</text>"
        )
        legend_y += 12
    parts.append(
        f'<text x="4" y="12" font-size="10">y: {yr[0]:.3g}..{yr[1]:.3g} '
        f"x: {xr[0]:.3g}..{xr[1]:.3g}</text>"
    )
    parts.append("</svg>")
    return Figure(title, "".join(parts))


def barFigure(
    title: str,
    labels: Sequence[str],
    values: Sequence[float],
    w: int = 720,
    h: int = 240,
    y_range: tuple[float, float] | None = None,
) -> Figure:
    """Categorical bar chart with per-bar x labels (vertical text)."""
    vals = np.asarray(values, float)
    if not len(vals):
        return Figure(title, "<svg></svg>")
    y0, y1 = y_range if y_range is not None else (min(vals.min(), 0), vals.max() or 1)
    n = len(vals)
    slot = (w - 60) / n
    bw = max(slot * 0.7, 1.0)
    parts = [
        f'<svg width="{w}" height="{h}" class="kgt-fig" '
        f'viewBox="0 0 {w} {h}" xmlns="http://www.w3.org/2000/svg">'
        f'<rect width="{w}" height="{h}" fill="white" stroke="#ccc"/>'
    ]
    for i, (label, v) in enumerate(zip(labels, vals)):
        x = 40 + i * slot + (slot - bw) / 2
        frac = (min(max(v, y0), y1) - y0) / max(y1 - y0, 1e-9)
        bh = frac * (h - 70)
        y = h - 50 - bh
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw:.1f}" '
            f'height="{bh:.1f}" fill="#3366cc"/>'
        )
        parts.append(
            f'<text x="{x + bw / 2:.1f}" y="{h - 46}" font-size="8" '
            f'transform="rotate(90 {x + bw / 2:.1f} {h - 46})">'
            f"{_html.escape(str(label))}</text>"
        )
        parts.append(
            f'<text x="{x + bw / 2 - 8:.1f}" y="{max(y - 2, 10):.1f}" '
            f'font-size="8">{v:.3g}</text>'
        )
    parts.append(
        f'<text x="4" y="12" font-size="10">y: {y0:.3g}..{y1:.3g}</text>'
    )
    parts.append("</svg>")
    return Figure(title, "".join(parts))


def histFigure(title: str, values, bins: int = 60, w: int = 720, h: int = 240) -> Figure:
    values = np.asarray(values, float)
    if not len(values):
        return Figure(title, "<svg></svg>")
    counts, edges = np.histogram(values, bins=bins)
    centers = (edges[:-1] + edges[1:]) / 2
    return lineFigure(title, [("count", centers, counts)], w, h)


# ---------------------------------------------------------------------------
# reference-equivalent plot entry points
# ---------------------------------------------------------------------------

def plotCN(model_json: str) -> list[Figure]:
    """CN model plots: likelihood curve + depth histogram with mixture."""
    with open(model_json) as f:
        params = json.load(f)
    figs = []
    if isinstance(params, list):  # per-gene models
        for p in params:
            figs.extend(_plotOneCN(p, p.get("gene", "")))
    else:
        figs.extend(_plotOneCN(params, model_json))
    return figs


def _plotOneCN(params: dict, title: str) -> list[Figure]:
    figs = []
    if params.get("method") == "CNgroup":
        lik = np.asarray(params.get("likelihood", []))
        if lik.size:
            figs.append(
                lineFigure(
                    f"CNgroup likelihood {title} (base={params.get('base'):.2f})",
                    [("loglik", lik[:, 0], lik[:, 1])],
                )
            )
        data = params.get("data", [])
        if data:
            figs.append(histFigure(f"Depth histogram {title}", data))
    elif params.get("method") == "KDEcut":
        prob = params.get("prob", [])
        if prob:
            x = np.linspace(0, 1.1, len(prob)) * params.get("x_max", 1)
            figs.append(lineFigure(f"KDE {title}", [("log density", x, prob)]))
    return figs


def plotGeneDepths(depth_tsv: str, title: str = "") -> list[Figure]:
    df = pd.read_csv(depth_tsv, sep="\t", header=None, names=["gene", "pos", "depth"])
    series = []
    for gene, sub in df.groupby("gene"):
        # downsample to <=500 points per gene
        step = max(1, len(sub) // 500)
        series.append((str(gene), sub["pos"][::step], sub["depth"][::step]))
    return [lineFigure(title or f"Depth {depth_tsv}", series, h=320)]


def plotReadMappingStat(stats: list[dict], names: list[str] | None = None) -> list[Figure]:
    """stats: per sample {'total': n, 'mapped': n, 'unique': n}."""
    if not stats:
        return []
    names = names or [str(i) for i in range(len(stats))]
    xs = np.arange(len(stats))
    series = [
        (key, xs, [s.get(key, 0) for s in stats])
        for key in ("total", "mapped", "unique")
    ]
    return [lineFigure("Read mapping statistics", series)]


# hover readout (data coordinates from the svg's data-x0/x1/y0/y1 ranges,
# matching _polyline's 30/20-px margins) + drag-zoom via viewBox, dblclick
# resets — the interactivity slice of the reference's dash/plotly viewer
_VIEWER_JS = """
<script>
document.querySelectorAll('svg.kgt-fig').forEach(function (svg) {
  var W = +svg.getAttribute('width'), H = +svg.getAttribute('height');
  var x0 = +svg.dataset.x0, x1 = +svg.dataset.x1;
  var y0 = +svg.dataset.y0, y1 = +svg.dataset.y1;
  var tip = document.createElementNS(svg.namespaceURI, 'text');
  tip.setAttribute('font-size', '11'); tip.setAttribute('fill', '#333');
  svg.appendChild(tip);
  function dataXY(evt) {
    var pt = svg.createSVGPoint(); pt.x = evt.clientX; pt.y = evt.clientY;
    var p = pt.matrixTransform(svg.getScreenCTM().inverse());
    return [x0 + (p.x - 30) / (W - 40) * (x1 - x0),
            y0 + (H - 20 - p.y) / (H - 40) * (y1 - y0), p.x, p.y];
  }
  svg.addEventListener('mousemove', function (evt) {
    var d = dataXY(evt);
    tip.setAttribute('x', Math.min(d[2] + 8, W - 150));
    tip.setAttribute('y', Math.max(d[3] - 6, 12));
    tip.textContent = d[0].toFixed(1) + ', ' + d[1].toFixed(2);
  });
  svg.addEventListener('mouseleave', function () { tip.textContent = ''; });
  var drag = null, band = null;
  svg.addEventListener('mousedown', function (evt) {
    drag = dataXY(evt);
    band = document.createElementNS(svg.namespaceURI, 'rect');
    band.setAttribute('fill', 'rgba(51,102,204,0.15)');
    svg.appendChild(band);
  });
  svg.addEventListener('mousemove', function (evt) {
    if (!drag || !band) return;
    var d = dataXY(evt);
    band.setAttribute('x', Math.min(drag[2], d[2]));
    band.setAttribute('y', 0);
    band.setAttribute('width', Math.abs(d[2] - drag[2]));
    band.setAttribute('height', H);
  });
  svg.addEventListener('mouseup', function (evt) {
    if (!drag) return;
    var d = dataXY(evt);
    var a = Math.min(drag[2], d[2]), b = Math.max(drag[2], d[2]);
    if (band) { svg.removeChild(band); band = null; }
    if (b - a > 5) {
      var vb = svg.viewBox.baseVal;
      var scale = vb.width / W;
      svg.setAttribute('viewBox',
        (vb.x + (a - 0) * scale) + ' ' + vb.y + ' ' +
        Math.max((b - a) * scale, 1) + ' ' + vb.height);
    }
    drag = null;
  });
  svg.addEventListener('dblclick', function () {
    svg.setAttribute('viewBox', '0 0 ' + W + ' ' + H);
  });
});
</script>
"""


def savePlot(filename: str, figs: list[Figure]) -> None:
    with open(filename, "w") as f:
        f.write("<html><head><meta charset='utf-8'><title>kir_graph_tpu report"
                "</title></head><body>\n")
        for fig in figs:
            f.write(fig.toHtml())
        f.write(_VIEWER_JS)
        f.write("</body></html>\n")
    logger.info(f"[Plot] saved {filename} ({len(figs)} figures)")


def showPlot(
    figs: list[Figure], port: int = 8051, block: bool = False
) -> "object":
    """Serve the figures on http://localhost:{port} (the reference serves
    dash on 8051, plot.py:131-138).  Returns the server; non-blocking by
    default so pipelines can continue."""
    import http.server
    import os
    import tempfile
    import threading

    with tempfile.NamedTemporaryFile(
        suffix=".html", delete=False
    ) as tf:
        path = tf.name
    try:
        savePlot(path, figs)
        with open(path, "rb") as f:
            payload = f.read()
    finally:
        os.unlink(path)

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib handler contract)
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
    logger.info(f"[Plot] serving {len(figs)} figures at http://127.0.0.1:{port}")
    if block:
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
