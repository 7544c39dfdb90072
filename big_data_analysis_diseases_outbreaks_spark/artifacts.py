"""Choropleth artifact for the anomaly map feed — the engine-side twin
of the reference's published visualization (``anomaly map.ipynb`` cells
3-7 render ``anim_2020.gif``: a geopandas world map colored by anomaly
intensity per region per month; ``README.md:813-833`` shows it).

The rendering stack differs by necessity, not design: this container
has neither geopandas nor matplotlib, so the artifact is a hand-written
SVG — a tile cartogram, one cell per region (the synthetic fixtures'
regions are event-type categories, not countries, so tiles lose
nothing). The ENGINE contract is identical to the reference: the plot
consumes exactly the ``anomaly_region_map`` / ``anomaly_map_series``
query outputs (both driver-oracle-checked), aggregated in Spark; only
tiny already-reduced rows reach the renderer — at 100 TB the feed is
still a handful of (date, region, score) rows.

Usage::

    python -m big_data_analysis_diseases_outbreaks_spark.artifacts \
        [sf_dir] [out.svg]
"""

from __future__ import annotations

import html
import os

from pyspark.sql import SparkSession

# Bundled "geometry" table: tile-grid cells per region (col, row). The
# reference joins on a world-countries shapefile; fixtures' regions are
# the five event types, laid out as one tile row.
REGION_GEOMETRY: dict[str, tuple[int, int]] = {
    "click": (0, 0),
    "error": (1, 0),
    "purchase": (2, 0),
    "signup": (3, 0),
    "view": (4, 0),
}

_CELL = 120
_PAD = 8
_LEGEND_H = 40


def _color(frac: float) -> str:
    """White → deep red sequential ramp (reference notebook uses the
    'OrRd' colormap; this is its two-stop linear skeleton)."""
    frac = max(0.0, min(1.0, frac))
    r = 255
    g = int(245 - 197 * frac)
    b = int(240 - 228 * frac)
    return f"rgb({r},{g},{b})"


def render_choropleth_svg(
    rows: list[tuple],
    title: str = "Anomaly intensity by region",
) -> str:
    """rows: [(region, score)] → SVG markup (pure string, no deps)."""
    scores = {str(r): float(s) for r, s in rows}
    lo = min(scores.values(), default=0.0)
    hi = max(scores.values(), default=1.0)
    span = (hi - lo) or 1.0
    ncols = max(c for c, _ in REGION_GEOMETRY.values()) + 1
    nrows = max(r for _, r in REGION_GEOMETRY.values()) + 1
    w = ncols * _CELL + 2 * _PAD
    h = nrows * _CELL + 2 * _PAD + _LEGEND_H + 24
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'font-family="sans-serif">',
        f'<text x="{_PAD}" y="18" font-size="15" font-weight="bold">'
        f"{html.escape(title)}</text>",
    ]
    for region, (col, row) in sorted(REGION_GEOMETRY.items()):
        x = _PAD + col * _CELL
        y = 24 + _PAD + row * _CELL
        score = scores.get(region)
        fill = _color((score - lo) / span) if score is not None else "#eee"
        label = f"{score:.1f}" if score is not None else "n/a"
        parts += [
            f'<rect x="{x}" y="{y}" width="{_CELL - 4}" height="{_CELL - 4}" '
            f'fill="{fill}" stroke="#555"/>',
            f'<text x="{x + 8}" y="{y + 22}" font-size="13">'
            f"{html.escape(region)}</text>",
            f'<text x="{x + 8}" y="{y + 42}" font-size="12" fill="#333">'
            f"{label}</text>",
        ]
    # legend: lo → hi ramp
    ly = 24 + _PAD + nrows * _CELL + 10
    for i in range(10):
        parts.append(
            f'<rect x="{_PAD + i * 24}" y="{ly}" width="24" height="14" '
            f'fill="{_color(i / 9)}"/>'
        )
    parts += [
        f'<text x="{_PAD}" y="{ly + 30}" font-size="11">{lo:.1f}</text>',
        f'<text x="{_PAD + 216}" y="{ly + 30}" font-size="11">{hi:.1f}</text>',
        "</svg>",
    ]
    return "\n".join(parts)


def render_series_panels_svg(rows: list[tuple]) -> str:
    """(date, region, score) rows → one tile-map panel per month, the
    still-frame equivalent of the reference's ``anim_2020.gif``."""
    by_month: dict[str, dict[str, float]] = {}
    for d, region, score in rows:
        month = str(d)[:7]
        acc = by_month.setdefault(month, {})
        acc[str(region)] = acc.get(str(region), 0.0) + float(score)
    panels = []
    for month in sorted(by_month):
        panels.append(
            render_choropleth_svg(
                sorted(by_month[month].items()),
                title=f"Anomaly intensity — {month}",
            )
        )
    # Stride/width come from the same geometry render_choropleth_svg
    # uses, so panels never overlap when REGION_GEOMETRY grows.
    ncols = max(c for c, _ in REGION_GEOMETRY.values()) + 1
    nrows = max(r for _, r in REGION_GEOMETRY.values()) + 1
    panel_w = ncols * _CELL + 2 * _PAD
    panel_h = nrows * _CELL + 2 * _PAD + _LEGEND_H + 24
    inner = []
    y = 0
    for svg in panels:
        body = svg.split(">", 1)[1].rsplit("</svg>", 1)[0]
        inner.append(f'<g transform="translate(0,{y})">{body}</g>')
        y += panel_h
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{panel_w}" '
        f'height="{y or 1}" font-family="sans-serif">'
        + "\n".join(inner)
        + "</svg>"
    )


def write_anomaly_map(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """Run the (oracle-checked) map feed queries and write the SVG(s)."""
    from .queries import all_queries

    qs = all_queries()
    agg_rows = [
        (r["region"], r["total_score"])
        for r in qs["anomaly_region_map"].fn(spark, sf_dir).collect()
    ]
    with open(out_path, "w") as f:
        f.write(render_choropleth_svg(agg_rows))
    series_rows = [
        (r["date"], r["region"], r["total_score"])
        for r in qs["anomaly_map_series"].fn(spark, sf_dir).collect()
    ]
    series_path = out_path.removesuffix(".svg") + "_series.svg"
    with open(series_path, "w") as f:
        f.write(render_series_panels_svg(series_rows))
    return out_path


def main() -> None:
    import sys

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else "anomaly_map.svg"
    from .session import get_spark

    spark = get_spark(app_name="anomaly-map-artifact")
    path = write_anomaly_map(spark, sf_dir, out)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
