"""Dashboard-feed export — the analogue of the reference's Tableau
workbook (`analysis/Tableau시각화.twb`).

The workbook itself is a BI artifact, not engine behavior; what the
engine owes a dashboard is the workbook's DATA SOURCE: the nine
analytical queries of `analysis/flink-analysis.sql` plus the two
feature-store tables, materialized somewhere any BI tool (Tableau,
Superset, a spreadsheet) can point at. This script runs exactly those
registry queries and writes each result as

  - one CSV per query (the universal BI connector), and
  - a single self-contained `index.html` with every result as a plain
    table — a zero-dependency visual sanity check of the same rows.

No plotting libraries, no services: the engine's job ends at correct,
cheap-to-refresh relations (every one of these is driver-oracle-checked
at sf0.01); presentation stays in the BI layer, exactly as the
reference splits responsibilities between Postgres and Tableau.

Run:  python examples/dashboard_export.py [--sf-dir /root/testdata/sf0.01]
                                          [--out /tmp/kfsp_dashboard]
"""

from __future__ import annotations

import argparse
import html
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

#: the workbook's data surface: the nine reference dashboard queries
#: (analysis/flink-analysis.sql) + the two feature-store relations
DASHBOARD_QUERIES = [
    "q1_events_per_min",
    "q2_top_docs_6h",
    "q3_geo_pv_24h",
    "q4_traffic_source_24h",
    "q5_session_stats_12h",
    "q6_avg_delay_5m",
    "q7_heatmap_7d",
    "q8_hourly_top20_24h",
    "q9_retention_d7",
    "fp2_user_features_5m",
    "fp3_features_20m",
]

#: cap per-query rows in the HTML preview (CSV always gets everything)
_HTML_ROWS = 50


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default="/tmp/kfsp_dashboard")
    args = p.parse_args()

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.plans import merged

    spark = get_spark("kfsp-dashboard-export")
    spark.sparkContext.setLogLevel("ERROR")
    plans = merged()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    sections: list[str] = []
    for name in DASHBOARD_QUERIES:
        df = plans[name].build(spark, args.sf_dir)
        # single-file CSV: dashboard feeds are presentation-sized
        # (top-N / per-window aggregates), never corpus-sized
        df.toPandas().to_csv(out / f"{name}.csv", index=False)
        rows = df.limit(_HTML_ROWS).collect()
        head = "".join(f"<th>{html.escape(c)}</th>" for c in df.columns)
        body = "".join(
            "<tr>" + "".join(f"<td>{html.escape(str(v))}</td>" for v in r) + "</tr>"
            for r in rows
        )
        sections.append(
            f"<h2>{html.escape(name)}</h2>"
            f"<p>{html.escape(plans[name].desc)} — full result: "
            f"<code>{html.escape(name)}.csv</code></p>"
            f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
        )
        print(f"wrote {name}.csv")

    (out / "index.html").write_text(
        "<!doctype html><meta charset='utf-8'>"
        "<title>kafka-flink-streaming-pipeline-spark dashboard feeds</title>"
        "<style>body{font-family:sans-serif;margin:2rem}"
        "table{border-collapse:collapse;margin-bottom:2rem}"
        "td,th{border:1px solid #ccc;padding:2px 8px;font-size:13px}"
        "th{background:#f0f0f0}</style>"
        "<h1>Dashboard feeds</h1>"
        "<p>The reference Tableau workbook's data surface "
        "(analysis/flink-analysis.sql Q1–Q9 + FP2/FP3), engine-refreshed.</p>"
        + "".join(sections)
    )
    print(f"wrote {out}/index.html")


if __name__ == "__main__":
    main()
