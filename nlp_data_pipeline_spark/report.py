"""Presentation layer: self-contained HTML report over the engine's feeds.

Reference parity: the reference ships a Streamlit dashboard —
word-cloud render (`/root/reference/nlp_data_tagging.py:333-342`),
tag/frequency bar charts (`:288-344`), corpus-metrics panels and export
views (`:346-566`). That UI is a presentation layer over the same
computations this engine exposes as declared queries (t01 token
frequencies, t12 summary word frequencies, t11 tags, t02 corpus stats).
This module closes the gap engine-side: an OFFLINE, dependency-free
renderer that consumes those exact DataFrames and emits one static HTML
file with inline SVG — no Streamlit/plotly/wordcloud imports, so it
runs anywhere the engine runs.

Scale design: every feed is an already-aggregated, driver-safe result
(top-k lists and scalar corpus stats — tens of rows), so the renderer
collects only presentation-sized data no matter the corpus size; the
heavy lifting stays in the distributed queries.

Chart discipline (kept deliberately boring): single-series horizontal
bars in one hue, values labeled in text ink, a data table under every
chart, light/dark via CSS custom properties, native SVG tooltips.
"""

from __future__ import annotations

import html
import math

from pyspark.sql import SparkSession

# Slot-1 categorical hue (light/dark) + ink/surface tokens; the chart
# body is written against these roles so modes swap in one place.
_CSS = """
.viz-root {
  color-scheme: light;
  --surface-1: #fcfcfb;
  --surface-2: #f1f0ee;
  --text-primary: #0b0b0b;
  --text-secondary: #52514e;
  --series-1: #2a78d6;
  font-family: system-ui, sans-serif;
  background: var(--surface-1);
  color: var(--text-primary);
  max-width: 880px; margin: 0 auto; padding: 24px;
}
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root {
    color-scheme: dark;
    --surface-1: #1a1a19;
    --surface-2: #262624;
    --text-primary: #ffffff;
    --text-secondary: #c3c2b7;
    --series-1: #3987e5;
  }
}
:root[data-theme="dark"] .viz-root {
  color-scheme: dark;
  --surface-1: #1a1a19;
  --surface-2: #262624;
  --text-primary: #ffffff;
  --text-secondary: #c3c2b7;
  --series-1: #3987e5;
}
.viz-root h1 { font-size: 22px; }
.viz-root h2 { font-size: 16px; margin: 28px 0 8px; }
.tiles { display: flex; gap: 12px; flex-wrap: wrap; }
.tile { background: var(--surface-2); border-radius: 8px; padding: 12px 18px; }
.tile .v { font-size: 24px; font-weight: 600; }
.tile .k { font-size: 12px; color: var(--text-secondary); }
table.data { border-collapse: collapse; font-size: 12px; margin-top: 6px; }
table.data th, table.data td {
  text-align: left; padding: 2px 12px 2px 0;
  color: var(--text-secondary);
}
table.data th { color: var(--text-primary); }
details > summary { font-size: 12px; color: var(--text-secondary); cursor: pointer; }
"""


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:,.2f}"
    if isinstance(v, int):
        return f"{v:,}"
    return html.escape(str(v))


def stat_tiles(stats: list[tuple[str, object]]) -> str:
    """Hero stat row — headline corpus numbers are tiles, not a chart."""
    cells = "".join(
        f'<div class="tile"><div class="v">{_fmt(v)}</div>'
        f'<div class="k">{html.escape(k)}</div></div>'
        for k, v in stats
    )
    return f'<div class="tiles">{cells}</div>'


def bar_svg(pairs: list[tuple[str, float]], title: str, width: int = 640) -> str:
    """Horizontal single-series bar chart: one hue (the title names the
    series, so no legend), thin 18px bars with rounded data-ends, value
    labels in text ink at the bar end, a native <title> tooltip per bar."""
    if not pairs:
        return "<p>(no data)</p>"
    vmax = max(v for _, v in pairs) or 1
    row_h, label_w, pad = 26, 150, 4
    chart_w = width - label_w - 80
    h = row_h * len(pairs) + pad * 2
    rows = []
    for i, (label, v) in enumerate(pairs):
        y = pad + i * row_h
        bw = max(2.0, chart_w * v / vmax)
        lab = html.escape(str(label))
        rows.append(
            f'<text x="{label_w - 8}" y="{y + 17}" text-anchor="end" '
            f'font-size="12" fill="var(--text-secondary)">{lab}</text>'
            f'<rect x="{label_w}" y="{y + 4}" width="{bw:.1f}" height="18" '
            f'rx="4" fill="var(--series-1)">'
            f"<title>{lab}: {_fmt(v)}</title></rect>"
            f'<text x="{label_w + bw + 6:.1f}" y="{y + 17}" font-size="11" '
            f'fill="var(--text-primary)">{_fmt(v)}</text>'
        )
    table = data_table(["label", "value"], [(k, v) for k, v in pairs])
    return (
        f"<h2>{html.escape(title)}</h2>"
        f'<svg role="img" aria-label="{html.escape(title)}" width="{width}" '
        f'height="{h}" viewBox="0 0 {width} {h}">{"".join(rows)}</svg>'
        f"<details><summary>data table</summary>{table}</details>"
    )


def wordcloud_svg(pairs: list[tuple[str, float]], title: str, width: int = 640) -> str:
    """Reference-parity word cloud (nlp_data_tagging.py:333-342) with a
    DETERMINISTIC row-packing layout: frequency-descending, font size ∝
    sqrt(freq), left-to-right wrap — same input, same pixels, no RNG.
    All words wear text ink (size is the encoding, not color); the
    exact counts live in the table below."""
    if not pairs:
        return "<p>(no data)</p>"
    vmax = max(v for _, v in pairs) or 1
    x, y, row_max_h = 8.0, 8.0, 0.0
    words = []
    for word, v in pairs:
        size = 11 + 25 * math.sqrt(v / vmax)
        est_w = 0.62 * size * len(str(word)) + 10
        if x + est_w > width and x > 8:
            x, y, row_max_h = 8.0, y + row_max_h + 6, 0.0
        words.append(
            f'<text x="{x:.1f}" y="{y + size:.1f}" font-size="{size:.1f}" '
            f'fill="var(--text-primary)" fill-opacity="{0.55 + 0.45 * v / vmax:.2f}">'
            f"{html.escape(str(word))}<title>{html.escape(str(word))}: {_fmt(v)}</title></text>"
        )
        x += est_w
        row_max_h = max(row_max_h, size)
    h = int(y + row_max_h + 14)
    table = data_table(["word", "count"], pairs)
    return (
        f"<h2>{html.escape(title)}</h2>"
        f'<svg role="img" aria-label="{html.escape(title)}" width="{width}" '
        f'height="{h}" viewBox="0 0 {width} {h}">{"".join(words)}</svg>'
        f"<details><summary>data table</summary>{table}</details>"
    )


def data_table(headers: list[str], rows: list[tuple]) -> str:
    head = "".join(f"<th>{html.escape(h)}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{_fmt(c)}</td>" for c in r) + "</tr>" for r in rows
    )
    return f'<table class="data"><tr>{head}</tr>{body}</table>'


def render_report(spark: SparkSession, sf_dir: str) -> str:
    """Run the dashboard's feed queries and assemble the HTML report.

    Feeds (all declared, driver-verified queries — the report adds zero
    new computation): t02 corpus stats, t01 token top-10, t11 tag
    distribution, t12 summary word frequencies.
    """
    from pyspark.sql import functions as F

    from nlp_data_pipeline_spark.operators.text_analytics import (
        t01_token_freq_top10,
        t02_doc_token_stats,
        t11_fallback_tags,
        t12_summary_word_freq,
    )

    corpus = (
        t02_doc_token_stats(spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.round(F.avg("clean_chars"), 2).alias("avg_chars"),
        )
        .collect()[0]
    )
    tokens = [(r[0], r[1]) for r in t01_token_freq_top10(spark, sf_dir).collect()]
    tags = [
        (r[0], r[1])
        for r in (
            t11_fallback_tags(spark, sf_dir)
            .groupBy("tag")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("tag"))
            .limit(10)
        ).collect()
    ]
    cloud = [
        (r["word"], r["freq"])
        for r in t12_summary_word_freq(spark, sf_dir).limit(40).collect()
    ]

    body = "".join(
        [
            "<h1>Corpus report</h1>",
            stat_tiles(
                [
                    ("documents", corpus["n_docs"]),
                    ("total tokens", corpus["total_tokens"]),
                    ("avg tokens / doc", corpus["avg_tokens"]),
                    ("avg clean chars / doc", corpus["avg_chars"]),
                ]
            ),
            bar_svg(tokens, "Top tokens (corpus)"),
            bar_svg(tags, "Top tags (documents tagged)"),
            wordcloud_svg(cloud, "Summary word cloud"),
        ]
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>Corpus report</title><style>{_CSS}</style></head>"
        f"<body><div class='viz-root'>{body}</div></body></html>"
    )


def write_report(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    html_text = render_report(spark, sf_dir)
    with open(out_path, "w") as f:
        f.write(html_text)
    return out_path
