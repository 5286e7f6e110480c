#!/usr/bin/env python3
"""Benchmark report artifacts: CSV + SVG chart from BENCH_DETAIL.json.

Reference parity: performance_analyzer.py:85-125 writes
``performance_results.csv`` (operation,time for the create/reuse pair)
and a matplotlib bar chart PNG. This container has no matplotlib, so
the chart is a self-contained SVG built from stdlib only — same
content: create-vs-reuse bars, value labels, speedup annotation — plus
a second figure ranking the slowest headline queries (magnitude, one
hue). Colors are a validated colorblind-safe pair on a light surface;
text wears ink, never the series color.

Run directly (``python tools/perf_report.py [BENCH_DETAIL.json]``) or
via ``bench.py``, which refreshes ``outputs/`` after every run.
"""
from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

INK = "#1a1a19"  # primary text
INK2 = "#66655e"  # secondary text / axis
GRID = "#e8e7e0"
SERIES_1 = "#2a78d6"  # categorical slot 1 (blue)
SERIES_2 = "#eb6834"  # categorical slot 2 (orange)
FONT = "font-family='system-ui, -apple-system, sans-serif'"


def _bar(x, y, w, h, fill) -> str:
    """Baseline-anchored bar with a 4px rounded data end: rounding only
    the top corners by drawing the rect 4px taller than the visible
    area is wrong; instead use a path with rounded top corners."""
    r = min(4, w / 2, h)
    return (
        f"<path d='M{x},{y + h} v{-(h - r)} q0,-{r} {r},-{r} h{w - 2 * r} "
        f"q{r},0 {r},{r} v{h - r} z' fill='{fill}'/>"
    )


def cache_chart(t_create: float, t_reuse: float) -> str:
    """Create-vs-reuse figure (the reference's chart, re-expressed)."""
    W, H = 560, 360
    pl, pr, pt, pb = 64, 24, 72, 56
    plot_w, plot_h = W - pl - pr, H - pt - pb
    vmax = max(t_create, t_reuse) * 1.25 or 1.0
    speedup = t_create / t_reuse if t_reuse else float("nan")
    bars = []
    labels = []
    ticks = []
    # y gridlines at 4 even steps
    for i in range(5):
        v = vmax * i / 4
        y = pt + plot_h - plot_h * i / 4
        ticks.append(
            f"<line x1='{pl}' y1='{y:.1f}' x2='{pl + plot_w}' y2='{y:.1f}' "
            f"stroke='{GRID}' stroke-width='1'/>"
            f"<text x='{pl - 8}' y='{y + 4:.1f}' text-anchor='end' "
            f"font-size='12' fill='{INK2}' {FONT}>{v:.2f}</text>"
        )
    bw = 120
    gap = (plot_w - 2 * bw) / 3
    for i, (name, val, color) in enumerate(
        [("create", t_create, SERIES_1), ("reuse", t_reuse, SERIES_2)]
    ):
        x = pl + gap + i * (bw + gap)
        h = plot_h * val / vmax
        y = pt + plot_h - h
        bars.append(_bar(x, y, bw, h, color))
        labels.append(
            f"<text x='{x + bw / 2:.1f}' y='{y - 8:.1f}' text-anchor='middle' "
            f"font-size='13' font-weight='600' fill='{INK}' {FONT}>{val:.3f}s</text>"
            f"<text x='{x + bw / 2:.1f}' y='{pt + plot_h + 20}' text-anchor='middle' "
            f"font-size='13' fill='{INK}' {FONT}>{name}</text>"
        )
    return f"""<svg xmlns='http://www.w3.org/2000/svg' width='{W}' height='{H}'
     viewBox='0 0 {W} {H}' role='img'
     aria-label='Partition cache: create {t_create:.3f}s vs reuse {t_reuse:.3f}s'>
  <rect width='{W}' height='{H}' fill='#ffffff'/>
  <text x='{pl}' y='28' font-size='16' font-weight='600' fill='{INK}' {FONT}>Partition cache: create vs reuse</text>
  <text x='{pl}' y='48' font-size='12' fill='{INK2}' {FONT}>min-of-passes wall seconds, 5 keys per pass &#8212; reuse is {speedup:.2f}&#215; faster</text>
  {''.join(ticks)}
  <line x1='{pl}' y1='{pt + plot_h}' x2='{pl + plot_w}' y2='{pt + plot_h}' stroke='{INK2}' stroke-width='1'/>
  {''.join(bars)}
  {''.join(labels)}
  <text x='{18}' y='{pt + plot_h / 2:.0f}' font-size='12' fill='{INK2}' {FONT}
        transform='rotate(-90 18 {pt + plot_h / 2:.0f})' text-anchor='middle'>seconds</text>
</svg>
"""


def headline_chart(times: dict[str, float], top: int = 10) -> str:
    """Slowest headline queries — horizontal bars, one hue (magnitude
    of a single measure; the query name on the axis carries identity)."""
    rows = sorted(times.items(), key=lambda kv: -kv[1])[:top]
    if not rows:
        return ""
    W = 680
    pl, pr, pt, pb = 230, 64, 64, 28
    rh, rgap = 22, 8
    plot_w = W - pl - pr
    H = pt + pb + len(rows) * (rh + rgap)
    vmax = rows[0][1] * 1.08 or 1.0
    parts = []
    for i in range(5):
        v = vmax * i / 4
        x = pl + plot_w * i / 4
        parts.append(
            f"<line x1='{x:.1f}' y1='{pt}' x2='{x:.1f}' y2='{H - pb}' "
            f"stroke='{GRID}' stroke-width='1'/>"
            f"<text x='{x:.1f}' y='{H - pb + 18}' text-anchor='middle' "
            f"font-size='11' fill='{INK2}' {FONT}>{v:.1f}</text>"
        )
    for i, (name, val) in enumerate(rows):
        y = pt + i * (rh + rgap)
        w = plot_w * val / vmax
        r = min(4, rh / 2, w)
        parts.append(
            f"<path d='M{pl},{y} h{w - r} q{r},0 {r},{r} v{rh - 2 * r} "
            f"q0,{r} -{r},{r} h-{w - r} z' fill='{SERIES_1}'/>"
            f"<text x='{pl - 8}' y='{y + rh / 2 + 4}' text-anchor='end' "
            f"font-size='12' fill='{INK}' {FONT}>{name}</text>"
            f"<text x='{pl + w + 6:.1f}' y='{y + rh / 2 + 4}' font-size='11' "
            f"fill='{INK2}' {FONT}>{val:.2f}s</text>"
        )
    return f"""<svg xmlns='http://www.w3.org/2000/svg' width='{W}' height='{H}'
     viewBox='0 0 {W} {H}' role='img' aria-label='Slowest headline queries'>
  <rect width='{W}' height='{H}' fill='#ffffff'/>
  <text x='24' y='28' font-size='16' font-weight='600' fill='{INK}' {FONT}>Slowest headline queries</text>
  <text x='24' y='46' font-size='12' fill='{INK2}' {FONT}>warm min-of-passes seconds at the bench scale factor</text>
  {''.join(parts)}
</svg>
"""


def write_report(detail_path: Path, out_dir: Path) -> list[Path]:
    detail = json.loads(detail_path.read_text())
    times = dict(detail.get("queries", {}))
    t_create = times.pop("cache_create", None)
    t_reuse = times.pop("cache_reuse", None)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []

    if t_create is not None and t_reuse is not None:
        # Reference-shaped CSV: performance_analyzer.py:87-92.
        p = out_dir / "performance_results.csv"
        with p.open("w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["operation", "time"])
            w.writerow(["create", f"{t_create:.3f}"])
            w.writerow(["reuse", f"{t_reuse:.3f}"])
        written.append(p)
        p = out_dir / "performance_analysis.svg"
        p.write_text(cache_chart(t_create, t_reuse))
        written.append(p)

    p = out_dir / "headline_times.csv"
    with p.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query", "seconds", "passes"])
        passes = detail.get("passes", {})
        for name, val in sorted(times.items(), key=lambda kv: -kv[1]):
            w.writerow(
                [name, f"{val:.4f}", " ".join(f"{x:.4f}" for x in passes.get(name, []))]
            )
    written.append(p)
    svg = headline_chart(times)
    if svg:
        p = out_dir / "headline_times.svg"
        p.write_text(svg)
        written.append(p)
    return written


def main() -> None:
    here = Path(__file__).resolve().parent.parent
    detail = Path(sys.argv[1]) if len(sys.argv) > 1 else here / "BENCH_DETAIL.json"
    for p in write_report(detail, here / "outputs"):
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
