"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>}

Query set = the scale-representative operators (scan-heavy agg, multi-join,
window/sessionize, spatial grid + join + knn, dedup, ANN, text profile) —
each exercises a distinct physical-plan shape; see SURVEY.md §6.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q18_large_volume",
    "q19_disjunctive",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "top3_orders_per_priority",
    "events_windowed_agg",
    "events_sessionize",
    "asof_join_events_orders",
    "geo_knn",
    "geo_grid_aggregate",
    "geo_pip_join_count",
    "geo_extent",
    "geo_nearest_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivfpq_topk",
    "text_profile",
    "text_ngram_topk",
    "text_repetition_profile",
    "corpus_token_budget",
    "doc_chunks",
    "corpus_clean",
    "corpus_split",
    "corpus_decontaminate",
    "pack_sequences",
    "embed_quantize_int8",
    "events_outliers",
    "corpus_source_stats",
    "cross_source_overlap",
    "events_distinct_salted",
    "mm_media_stats",
]


def main() -> None:
    from iceberg_geospatial_api_server_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # warm the JVM/python-worker pools once (excluded from timings)
    qs["q1_pricing_summary"](spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        # noop-format write: full materialization of every output column
        # (count() lets Catalyst prune deterministic projections, timing
        # the scan instead of the work — r3 VERDICT item 2)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }

    if "--compare-duckdb" in sys.argv:
        out["duckdb_sec"] = _duckdb_reference_timings()

    print(json.dumps(out))


def _duckdb_reference_timings() -> dict[str, float]:
    """Time the oracle SQL in DuckDB on the same data — the reference
    engine IS DuckDB (query/engine.py builds DuckDB SQL), so this is the
    'reference single-node throughput' yardstick at the same SF."""
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    con.execute(f"SET threads={CPUS}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entry_mod.oracle_sql()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in oracles:
            continue
        t0 = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


if __name__ == "__main__":
    main()
