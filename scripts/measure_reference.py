#!/usr/bin/env python3
"""Measure the reference's pandas query surface on this host over an
sf-equivalent frame (the r17 verdict's item 5: make bench_vs_baseline
a measured number instead of "effectively 1.0").

What runs: the reference is a pandas app (streamlit dashboard +
viz + knowledge-base builder). Its exact pandas expressions are
replayed here over the SAME observations panel the repo's B/C gate
queries serve (built from the sf TPC-H-ish tables), with the repo's
filter values substituted for the reference's Eurostat codes:

  - panel build        ~ etl/main.py's aggregate step (pandas
                         merge + groupby over the raw orders rows —
                         the analogue of the repo's builds.observations)
  - b1_top_n_latest    = app/streamlit_app.py:94-107
  - b2_country_trend   = app/streamlit_app.py:115-124
  - b3_explorer_filter = app/streamlit_app.py:157-167
  - b4_top_countries   = app/streamlit_app.py:170-183
  - b5_top_sum         = viz/viz_utils.py:51-66
  - b6_pivot_heatmap   = viz/viz_utils.py:69-81
  - c_insights_loop    = llm_app/build_knowledge_base.py:124-177
                         (the per-(geo,indicator) python loop)

NOT measurable in this container (library absent, noted in
BASELINE.md): the sklearn TF-IDF retrieval (rag_engine.py) and the
XGBoost/ES forecasts (forecast_utils.py).

Usage: python3 scripts/measure_reference.py /root/testdata/sf0.1
"""
import json
import sys
import time

import pandas as pd


def timeit(f, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def main(sfdir):
    orders = pd.read_parquet(f"{sfdir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_orderdate",
                 "o_totalprice"])
    customer = pd.read_parquet(f"{sfdir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sfdir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pd.read_parquet(f"{sfdir}/region.parquet",
        columns=["r_regionkey", "r_name"])

    out = {"sf_dir": sfdir, "n_orders": len(orders)}

    # panel build: the observations aggregate (region, geo, indicator,
    # year) -> (sum value, count) — the reference does this shape in
    # its ETL before the app ever queries it
    def build_panel():
        df = (orders
              .merge(customer, left_on="o_custkey", right_on="c_custkey")
              .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
              .merge(region, left_on="n_regionkey", right_on="r_regionkey"))
        df["year"] = pd.to_datetime(df["o_orderdate"]).dt.year
        g = (df.groupby(["r_name", "n_name", "o_orderpriority", "year"])
               .agg(value=("o_totalprice", "sum"),
                    n_obs=("o_totalprice", "count"))
               .reset_index()
               .rename(columns={"r_name": "region", "n_name": "geo",
                                "o_orderpriority": "indicator"}))
        g["dataset_code"] = "orders"
        return g

    out["ref_panel_build_sec"] = timeit(build_panel, reps=3)
    data = build_panel()
    out["n_panel_rows"] = len(data)

    # --- streamlit_app.py:94-107 (top countries, latest year) -------
    def b1():
        latest_year = data["year"].max()
        df_latest = data[
            (data["year"] == latest_year)
            & (data["dataset_code"] == "orders")
            & (data["indicator"] == "1-URGENT")
        ]
        return (df_latest.groupby("geo")["value"]
                .mean().sort_values(ascending=False).head(10))

    # --- streamlit_app.py:115-124 (one-geo trend) --------------------
    def b2():
        return (data[(data["geo"] == "NATION_0")
                     & (data["dataset_code"] == "orders")
                     & (data["indicator"] == "1-URGENT")]
                [["year", "value"]].drop_duplicates().set_index("year"))

    # --- streamlit_app.py:157-167 (explorer filter) ------------------
    def b3():
        return data[(data["geo"] == "NATION_1")
                    & (data["indicator"] == "5-LOW")
                    & (data["year"].between(1996, 2000))]

    # --- streamlit_app.py:170-183 (top countries, mean over range) ---
    def b4():
        top_df = data[(data["indicator"] == "1-URGENT")
                      & (data["year"].between(1996, 2000))]
        return (top_df.groupby("geo")["value"]
                .mean().sort_values(ascending=False).head(10))

    # --- viz_utils.py:51-66 (top countries by sum, latest) -----------
    def b5():
        latest_year = data["year"].max()
        subset = data[(data["indicator"] == "1-URGENT")
                      & (data["year"] == latest_year)]
        return (subset.groupby("geo")["value"]
                .sum().nlargest(10).reset_index())

    # --- viz_utils.py:69-81 (heatmap pivot) ---------------------------
    def b6():
        subset = data[data["indicator"] == "1-URGENT"]
        return subset.pivot_table(index="geo", columns="year",
                                  values="value", aggfunc="sum")

    # --- build_knowledge_base.py:124-177 (per-pair insight loop) -----
    def c_insights():
        records = []
        for (geo, indicator), grp in data.groupby(["geo", "indicator"]):
            grp = grp.sort_values("year")
            years = grp["year"].to_numpy()
            values = grp["value"].to_numpy(dtype=float)
            if len(values) < 2:
                continue
            start_year, end_year = int(years[0]), int(years[-1])
            start_val, end_val = float(values[0]), float(values[-1])
            n_years = max(end_year - start_year, 1)
            slope = (end_val - start_val) / n_years
            growth_pct = ((end_val - start_val) / start_val
                          if start_val != 0 else None)
            trend = ("rising" if slope > 0.01
                     else "declining" if slope < -0.01 else "stable")
            if growth_pct is not None:
                change_phrase = f"{growth_pct:+.1%} over {n_years} years"
            else:
                change_phrase = (f"{end_val - start_val:+.2f} units "
                                 f"over {n_years} years")
            insight_text = (
                f"For {geo}, the indicator '{indicator}' changed from "
                f"{start_val:.2f} in {start_year} to {end_val:.2f} in "
                f"{end_year} ({change_phrase}). Overall trend: {trend}.")
            records.append({"geo": geo, "indicator": indicator,
                            "slope_per_year": slope,
                            "growth_pct": growth_pct,
                            "trend_label": trend,
                            "insight_text": insight_text})
        return pd.DataFrame(records)

    for name, f in [("b1_top_n_latest", b1), ("b2_country_trend", b2),
                    ("b3_explorer_filter", b3),
                    ("b4_top_countries_mean", b4),
                    ("b5_top_countries_sum", b5),
                    ("b6_pivot_heatmap", b6),
                    ("c_insights_loop", c_insights)]:
        out[f"ref_{name}_sec"] = timeit(f)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
