"""Physical-plan shape assertions — the 100 TB posture, checked in CI.

These tests pin the *plan*, not the result: filters reach the parquet
scan (PushedFilters), column pruning holds (ReadSchema), dimension joins
broadcast, and spatial/NN joins never degenerate into cartesian products.
"""

import re

import pytest
from pyspark.sql import functions as F


from iceberg_geospatial_api_server_spark.plans import (
    formatted_plan as _plan,
    hash_exchange_count,
    range_exchange_count,
    single_partition_exchange_count,
)


def test_q1_filter_pushdown_and_pruning(tables):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q1_pricing_summary,
    )

    plan = _plan(q1_pricing_summary(tables["lineitem"]))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: unused columns (e.g. l_partkey) must not be read
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "l_partkey" not in m.group(1)
    assert "HashAggregate" in plan


def test_q3_broadcasts_customer(tables):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q3_shipping_priority,
    )

    plan = _plan(
        q3_shipping_priority(tables["customer"], tables["orders"], tables["lineitem"])
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # final top-k must be TakeOrderedAndProject, not a global Sort+Limit
    assert "TakeOrderedAndProject" in plan


def test_q5_all_dims_broadcast(tables):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q5_local_supplier_volume,
    )

    plan = _plan(
        q5_local_supplier_volume(
            tables["customer"], tables["orders"], tables["lineitem"],
            tables["supplier"], tables["nation"], tables["region"],
        )
    )
    # exactly one non-broadcast join allowed (lineitem ⋈ orders)
    n_smj = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_smj <= 1, f"expected ≤1 shuffle join, plan:\n{plan}"
    assert plan.count("BroadcastHashJoin") >= 2


def test_knn_is_take_ordered(tables):
    from iceberg_geospatial_api_server_spark.geo.functions import knn
    from iceberg_geospatial_api_server_spark.sources.synthetic import lineitem_points

    pts = lineitem_points(tables["lineitem"])
    plan = _plan(knn(pts, "x", "y", 0.0, 0.0, 10, id_cols=["l_orderkey"]))
    assert "TakeOrderedAndProject" in plan
    assert range_exchange_count(plan) == 0  # no global sort shuffle


def test_pip_join_no_cartesian(tables):
    from iceberg_geospatial_api_server_spark.geo.functions import (
        point_in_polygon_join,
    )
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_points,
        nation_rect_polygons,
    )

    pts = lineitem_points(tables["lineitem"])
    polys = nation_rect_polygons(tables["nation"]).select(
        "n_nationkey", "n_name", "geometry"
    )
    plan = _plan(point_in_polygon_join(pts, polys, res=30.0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nearest_join_broadcast_no_shuffle_of_left(tables):
    from iceberg_geospatial_api_server_spark.geo.functions import (
        nearest_join_broadcast,
    )
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        customer_points,
        supplier_points,
    )

    out = nearest_join_broadcast(
        supplier_points(tables["supplier"]),
        customer_points(tables["customer"]),
        "s_suppkey", "x", "y", "x", "y", ["c_custkey"],
    )
    plan = _plan(out)
    # one mapInPandas over the left scan: no join, no shuffle — the
    # dim-sized right side rides a broadcast variable, not a plan node
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert hash_exchange_count(plan) == 0


def test_dedup_exact_partial_aggregation(tables):
    from iceberg_geospatial_api_server_spark.operators.dedup import dedup_exact

    plan = _plan(dedup_exact(tables["documents"]))
    # two HashAggregates (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning" in plan


def test_bbox_prefilter_stays_jvm(tables):
    """The bbox filter itself must be plain comparisons (a Filter node),
    with the python kernel only in the projection that computed the bbox."""
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_point_geoms,
    )

    geoms = lineitem_point_geoms(tables["lineitem"])
    res = query_features(
        geoms,
        QueryParams(bbox=(-50, -40, 30, 25), return_geometry=False, limit=None,
                    out_fields="l_orderkey"),
        oid_order=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                   "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    plan = _plan(res.features)
    # the bbox comparisons appear as a plain Filter over the decoded
    # struct fields (Catalyst collapses the __bbox_* aliases)
    assert re.search(r"Condition : .*xmax >= -50\.0", plan)
    assert re.search(r"Condition : .*ymin <= 25\.0", plan)


def test_q17_window_reuses_join_partitioning(tables):
    """The correlated-AVG rewrite must share ONE partkey exchange between
    the part join and the per-part window — not shuffle twice."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q17_small_quantity_revenue,
    )

    plan = _plan(q17_small_quantity_revenue(tables["lineitem"], tables["part"]))
    assert hash_exchange_count(plan) <= 1, plan
    assert "CartesianProduct" not in plan


def test_q21_no_nested_loop_and_bounded_exchanges(tables):
    """EXISTS/NOT-EXISTS as collect_set windows: no nested-loop joins, and
    the two windows reuse the orderkey partitioning (≤2 hash exchanges
    total, i.e. only the lineitem⋈orders join's own shuffles)."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q21_waiting_suppliers,
    )

    plan = _plan(
        q21_waiting_suppliers(
            tables["lineitem"], tables["orders"], tables["supplier"], tables["nation"]
        )
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert hash_exchange_count(plan) <= 2, plan


def test_q13_outer_join_survives_to_plan(tables):
    """The zero-order customers must be preserved: plan keeps an outer
    join (Catalyst must not be able to rewrite it to inner)."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q13_customer_distribution,
    )

    plan = _plan(q13_customer_distribution(tables["customer"], tables["orders"]))
    assert "LeftOuter" in plan or "RightOuter" in plan, plan


def test_with_oid_no_single_partition_exchange(tables):
    """OID assignment must rank in parallel: the fq_attribute_filter plan
    may not funnel the fact table through Exchange SinglePartition (the
    window runs per quantile-bucket instead)."""
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams

    res = query_features(
        tables["lineitem"],
        QueryParams(
            where="l_quantity > 45.0",
            out_fields="l_orderkey,l_linenumber,l_quantity",
            return_geometry=False,
            limit=50,
        ),
        oid_order=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                   "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    plan = _plan(res.features)
    assert single_partition_exchange_count(plan) == 0, plan
    assert "hashpartitioning(__bkt" in plan, plan


def test_with_oid_string_key_buckets_in_parallel(spark):
    """String leading keys must ALSO rank in parallel (sampled string
    cutpoints instead of approxQuantile), with OIDs equal to the rank in
    lexicographic order."""
    import pandas as pd

    from iceberg_geospatial_api_server_spark.engine import with_oid

    n = 30000
    keys = [f"k{(i * 7919) % n:06d}" for i in range(n)]  # permuted, distinct
    df = spark.createDataFrame(
        pd.DataFrame({"name": keys, "v": range(n)}),
        "name string, v long",
    ).repartition(8)

    out = with_oid(df, ["name"])
    plan = _plan(out)
    assert single_partition_exchange_count(plan) == 0, plan
    assert "hashpartitioning(__bkt" in plan, plan

    got = {r["name"]: r["__oid"] for r in out.select("name", "__oid").collect()}
    for rank, k in enumerate(sorted(keys)[:500]):  # spot-check the head
        assert got[k] == rank
    assert sorted(got.values()) == list(range(n))


def test_with_oid_low_cardinality_string_key_still_parallel(spark):
    """A big frame with FEW distinct string keys (e.g. a source/domain
    column) must not collapse to one partition — the distinct keys
    themselves become the bucket cutpoints."""
    import pandas as pd

    from iceberg_geospatial_api_server_spark.engine import with_oid

    n = 20000
    srcs = [f"src{i % 40:02d}" for i in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame({"source": srcs, "v": range(n)}),
        "source string, v long",
    ).repartition(8)
    out = with_oid(df, ["source", "v"])
    plan = _plan(out)
    assert single_partition_exchange_count(plan) == 0, plan
    assert "hashpartitioning(__bkt" in plan, plan
    got = out.select("source", "v", "__oid").collect()
    expect = {
        (r["source"], r["v"]): i
        for i, r in enumerate(
            sorted(got, key=lambda r: (r["source"], r["v"]))
        )
    }
    for r in got[:2000]:
        assert r["__oid"] == expect[(r["source"], r["v"])]


def test_aqe_splits_planted_skew_join(spark):
    """The §H skew claim, pinned: a join with one hot key must execute
    as SortMergeJoin(skew=true) with the hot partition split by
    AQEShuffleRead — the runtime re-plan a 100 TB skewed join relies on.
    (Thresholds lowered so toy data crosses them; restored after.)"""
    import numpy as np
    import pandas as pd

    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    )
    prev = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "16KB")
        spark.conf.set(keys[1], "16KB")
        spark.conf.set(keys[2], "2")
        spark.conf.set(keys[3], "-1")
        spark.conf.set(keys[4], "32")  # hot partition ≫ median at 32-way
        n = 200_000
        ks = np.where(np.arange(n) % 10 == 0, 7, np.arange(n) % 5000)
        fact = spark.createDataFrame(
            pd.DataFrame({"k": ks.astype("int64"), "pad": ["x" * 40] * n})
        )
        dim = spark.createDataFrame(
            pd.DataFrame(
                {"k": np.arange(5000, dtype="int64"), "v": np.arange(5000)}
            )
        )
        joined = fact.join(dim, "k")
        out = joined.toPandas()  # executes THIS DataFrame's query
        assert len(out) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_with_oid_string_key_small_frame_fallback(spark):
    import pandas as pd

    from iceberg_geospatial_api_server_spark.engine import with_oid

    df = spark.createDataFrame(
        pd.DataFrame({"name": ["b", "a", "c"]}), "name string"
    )
    out = with_oid(df, ["name"])
    assert {r["name"]: r["__oid"] for r in out.collect()} == {
        "a": 0, "b": 1, "c": 2,
    }


def test_query_features_pushdown_with_persisted_bbox(spark, tmp_path_factory):
    """VERDICT r2 #8: over a production-shaped table (persisted __oid +
    __bbox_*), the engine's attribute WHERE and bbox envelope must BOTH
    reach the parquet scan as PushedFilters, and ReadSchema must exclude
    every unselected column (geometry above all)."""
    from iceberg_geospatial_api_server_spark.engine import (
        query_features,
        with_oid,
    )
    from iceberg_geospatial_api_server_spark.geo import functions as G
    from iceberg_geospatial_api_server_spark.models import QueryParams
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_point_geoms,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    geoms = with_oid(
        G.with_bbox(lineitem_point_geoms(li), "geometry"),
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
         "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    path = str(tmp_path_factory.mktemp("persisted") / "geoms")
    geoms.write.parquet(path)

    res = query_features(
        spark.read.parquet(path),
        QueryParams(
            where="l_quantity > 30",
            bbox=(-50, -40, 30, 25),
            return_geometry=False,
            limit=None,
            out_fields="l_orderkey,l_quantity",
        ),
    )
    plan = _plan(res.features)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no PushedFilters line — nothing reached the scan"
    pushed = m.group(1)
    # sanitized attribute predicate
    assert "GreaterThan(l_quantity,30.0)" in pushed
    # all four bbox envelope comparisons
    assert "GreaterThanOrEqual(__bbox_xmax,-50.0)" in pushed
    assert "LessThanOrEqual(__bbox_xmin,30.0)" in pushed
    assert "GreaterThanOrEqual(__bbox_ymax,-40.0)" in pushed
    assert "LessThanOrEqual(__bbox_ymin,25.0)" in pushed
    # column pruning: only requested + bbox + __oid columns are read
    ms = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert ms is not None
    read = ms.group(1)
    assert "geometry" not in read
    for absent in ("l_partkey", "l_suppkey", "l_extendedprice", "l_shipdate"):
        assert absent not in read


def test_hash_split_no_exchange(tables, spark, sf_dir):
    """The split CASE must evaluate in the scan stage: no Exchange node
    anywhere — a doc's split is a pure function of its own id."""
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        hash_split,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(hash_split(docs))
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark n-gram set must broadcast (benchmarks are tiny next
    to a 100 TB corpus) and the candidate join must never be a cartesian
    product: corpus grams stream map-side into the broadcast hash join."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.text import (
        decontaminate,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    plan = _plan(decontaminate(docs, bench))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_q2_single_exchange_serves_groupby_and_window(tables):
    """The partkey repartition must satisfy BOTH the (partkey, suppkey)
    groupBy and the correlated-MIN window — one hash exchange on the fact
    path; every dimension (part filter, region suppliers) broadcasts."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q2_min_cost_supplier,
    )

    plan = _plan(
        q2_min_cost_supplier(
            tables["part"], tables["supplier"], tables["lineitem"],
            tables["nation"], tables["region"],
        )
    )
    assert hash_exchange_count(plan) <= 1, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_q9_only_orderkey_shuffle_join(tables):
    """part (LIKE-filtered) and supplier⋈nation broadcast; the only
    shuffle join is lineitem⋈orders on orderkey."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q9_product_type_profit,
    )

    plan = _plan(
        q9_product_type_profit(
            tables["part"], tables["supplier"], tables["lineitem"],
            tables["orders"], tables["nation"],
        )
    )
    n_shuffle_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_shuffle_joins <= 1, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_q11_scalar_total_broadcasts(tables):
    """The grand-total scalar joins back as a broadcast (1-row side);
    the per-part aggregate is the only fact shuffle. Statically the
    per-part subtree appears twice (value rows + grand total), so the
    pre-AQE plan shows 2 hash exchanges — the EXECUTED plan must fuse
    them into one computed stage plus a ReusedQueryStage (one fact scan,
    not two)."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q11_important_stock,
    )

    df = q11_important_stock(
        tables["supplier"], tables["lineitem"], tables["nation"]
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the total is a broadcast nested-loop over ONE row — acceptable; what
    # must not happen is a shuffle join against the scalar
    assert hash_exchange_count(plan) <= 2, plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert (
        executed.count("ReusedQueryStage") + executed.count("ReusedExchange")
        >= 1
    ), executed


def test_q16_anti_join_broadcasts(tables):
    """Complaint suppliers and the filtered part dim both broadcast; the
    count-distinct shuffles on the (brand, type, size) group key only."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q16_supplier_part_count,
    )

    plan = _plan(
        q16_supplier_part_count(
            tables["part"], tables["supplier"], tables["lineitem"]
        )
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan
    # countDistinct = two-phase agg → ≤2 hash exchanges on tiny group keys
    assert hash_exchange_count(plan) <= 2, plan


def test_q20_window_shares_groupby_exchange(tables):
    """The per-(part, supp) aggregate and the per-part window share the
    single partkey exchange (repartition-on-prefix pattern, as in q2)."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q20_excess_suppliers,
    )

    plan = _plan(
        q20_excess_suppliers(
            tables["part"], tables["supplier"], tables["lineitem"],
            tables["nation"],
        )
    )
    assert "CartesianProduct" not in plan
    # partkey exchange + the distinct-suppkey exchange; dims broadcast
    assert hash_exchange_count(plan) <= 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_pii_scrub_is_jvm_scan_stage(tables):
    """pii_scrub runs entirely as JVM regexp built-ins: no Python stage,
    no exchange — a pure scan transform at any corpus size."""
    from iceberg_geospatial_api_server_spark.operators.text import pii_scrub

    plan = _plan(pii_scrub(tables["documents"]))
    assert "Python" not in plan and "Arrow" not in plan
    assert hash_exchange_count(plan) == 0
    assert "Exchange" not in plan


def test_conic_projection_entries_are_scan_stage(spark, sf_dir):
    """geo_albers / geo_lcc: staged selectExpr column arithmetic — no
    Python stage, the domain box pushed into the scan, and only the
    final presentation sort exchanges."""
    import __spark_entry__ as E

    for name in ("geo_albers", "geo_lcc"):
        plan = _plan(E.queries()[name](spark, sf_dir))
        assert "Python" not in plan and "Arrow" not in plan, name
        assert hash_exchange_count(plan) == 0, name
        assert "PushedFilters" in plan, name


def test_nearest_join_broadcast_ignores_bad_right_rows(spark):
    """A right row with NULL keep column or NaN coordinates must not
    poison the argmin (NaN wins every np.argmin comparison) nor crash
    the None-unsafe tuple sort."""
    from iceberg_geospatial_api_server_spark.geo.functions import (
        nearest_join_broadcast,
    )

    left = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    right = spark.createDataFrame(
        [(10, 1.0, 1.0), (None, 9.0, 9.0), (30, float("nan"), 2.0)],
        "rid long, rx double, ry double",
    )
    out = nearest_join_broadcast(
        left, right, "id", "x", "y", "rx", "ry", ["rid"]
    ).collect()
    assert len(out) == 1
    assert out[0]["nn_rid"] == 10  # not the NaN row, no TypeError


def test_dim_stats_single_exchange(tables):
    """posexplode collapses map-side; the d-key groupBy is the only hash
    exchange (plus the single-partition sort of the d-row output)."""
    from iceberg_geospatial_api_server_spark.operators.ann import dim_stats
    from iceberg_geospatial_api_server_spark.plans.explain import (
        hash_exchange_count,
    )

    out = dim_stats(tables["embeddings"])
    assert hash_exchange_count(out) == 1


def test_pca_projection_pass_no_shuffle(tables):
    """The projection pass is pure map-side: scan → mapInPandas, zero
    exchanges (the moment pass's bounded collect happens at build time)."""
    from iceberg_geospatial_api_server_spark.operators.ann import pca_project
    from iceberg_geospatial_api_server_spark.plans.explain import shuffle_count

    out = pca_project(tables["embeddings"], k=4)
    assert shuffle_count(out) == 0


def test_phash_pairs_no_cartesian(spark, sf_dir):
    """The candidate join is an equi-join on (blk, val) — never a
    cartesian product, and the phash column (8 B/image) is all that
    shuffles."""
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        image_phash,
        phash_dedup_pairs,
        synthesize_image_corpus,
    )
    from iceberg_geospatial_api_server_spark.plans.explain import (
        assert_no_cartesian,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    hashes = image_phash(synthesize_image_corpus(docs), stub=False)
    assert_no_cartesian(phash_dedup_pairs(hashes))


def test_materialize_packs_single_hash_exchange(tables):
    """The shard sink's materialization shuffles ONCE: the doc-granular
    offset window exchanges on shard, the token posexplode is map-side,
    and the (shard, pack_id) groupBy reuses the shard partitioning
    (its grouping keys are a superset of the window's partition key, so
    EnsureRequirements inserts no second exchange — the token stream
    never shuffles at token granularity)."""
    from iceberg_geospatial_api_server_spark.plans.explain import (
        assert_no_cartesian,
        hash_exchange_count,
    )
    from iceberg_geospatial_api_server_spark.sources.shards import (
        materialize_packs,
    )

    out = materialize_packs(tables["documents"], max_tokens=64, n_shards=8)
    assert_no_cartesian(out)
    assert hash_exchange_count(out) == 1


def test_cohort_ltv_plan_shape(tables):
    """Cohort LTV: custkey agg + re-join + bounded cohort frames — no
    cartesian, the cohort-size join broadcasts, no single-partition
    funnel of raw rows, and the only global sort is the presentation
    orderBy over the bounded cohort×age frame."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        orders_cohort_ltv,
    )

    plan = _plan(orders_cohort_ltv(tables["orders"]))
    assert "CartesianProduct" not in plan
    assert hash_exchange_count(plan) <= 6, plan
    assert single_partition_exchange_count(plan) == 0, plan
    assert "BroadcastHashJoin" in plan


def test_seasonal_anomaly_plan_shape(tables):
    """Seasonal anomaly: ONE event-scale exchange class (the hourly
    counts); every single-partition exchange feeds an hours-bounded
    frame (bounds/spine/168-row baseline), and the baseline re-join
    broadcasts."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_seasonal_anomaly,
    )

    plan = _plan(events_seasonal_anomaly(tables["events"]))
    assert "CartesianProduct" not in plan
    assert hash_exchange_count(plan) <= 3, plan
    assert single_partition_exchange_count(plan) <= 3, plan
    assert "BroadcastHashJoin" in plan


def test_purchase_intervals_plan_shape(tables):
    """Histogram median: no single-partition exchange anywhere (the
    naive per-bucket rank window would funnel all gaps through 4
    reducers; the histogram form never ranks raw rows)."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        purchase_intervals,
    )

    plan = _plan(purchase_intervals(tables["orders"]))
    assert "CartesianProduct" not in plan
    assert hash_exchange_count(plan) <= 5, plan
    assert single_partition_exchange_count(plan) == 0, plan


def test_session_paths_plan_shape(tables):
    """Journey paths: two exchange classes (user, path) and a
    TakeOrdered top-k — never a global range sort."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        session_paths,
    )

    plan = _plan(session_paths(tables["events"]))
    assert "CartesianProduct" not in plan
    assert hash_exchange_count(plan) <= 2, plan
    assert range_exchange_count(plan) == 0, plan
    assert "TakeOrderedAndProject" in plan


def test_corpus_entropy_plan_shape(tables):
    """Vocabulary entropy: one token exchange; the single-partition
    exchange carries only per-partition partial aggregates."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        corpus_entropy,
    )

    plan = _plan(corpus_entropy(tables["documents"]))
    assert hash_exchange_count(plan) <= 1, plan
    assert single_partition_exchange_count(plan) <= 1, plan


def test_centroid_drift_plan_shape(tables):
    """Centroid drift: one (label, dim) exchange off the corpus; the
    pair join and closing aggregate run on the bounded labels×d frame."""
    from iceberg_geospatial_api_server_spark.operators.ann import (
        centroid_drift,
    )

    plan = _plan(centroid_drift(tables["embeddings"]))
    assert "CartesianProduct" not in plan
    assert hash_exchange_count(plan) <= 3, plan
    assert single_partition_exchange_count(plan) == 0, plan


def test_quality_report_plan_shape(tables):
    """Expectation suite: one aggregate pass per table (no per-rule
    scans — at most 3 scans total: lineitem agg, orders agg, anti
    join), no cartesian, and the anti join survives to the plan."""
    from iceberg_geospatial_api_server_spark.operators.quality import (
        quality_report,
    )

    plan = _plan(quality_report(tables["lineitem"], tables["orders"]))
    assert "CartesianProduct" not in plan
    n_scans = len(re.findall(r"\(\d+\) Scan ", plan))
    assert n_scans <= 4, plan
    assert "LeftAnti" in plan


def test_nearest_and_knn_join_drop_bad_left_rows(spark):
    """LEFT rows with null/NaN coordinates must drop rather than emit
    NaN-distance rows with arbitrary neighbors (ADVICE r4 — the mirror
    of the right-side filter)."""
    from iceberg_geospatial_api_server_spark.geo.functions import (
        knn_join_broadcast,
        nearest_join_broadcast,
    )

    left = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, float("nan"), 0.0), (3, None, 5.0)],
        "id long, x double, y double",
    )
    right = spark.createDataFrame(
        [(10, 1.0, 1.0), (20, 6.0, 6.0)], "rid long, rx double, ry double"
    )
    out = nearest_join_broadcast(
        left, right, "id", "x", "y", "rx", "ry", ["rid"]
    ).collect()
    assert sorted(r["id"] for r in out) == [1]
    import math as _math

    assert all(not _math.isnan(r["nn_dist"]) for r in out)

    out_k = knn_join_broadcast(
        left, right, "id", "x", "y", "rx", "ry", ["rid"], k=2
    ).collect()
    assert sorted(set(r["id"] for r in out_k)) == [1]
    assert len(out_k) == 2  # k rows for the one valid left row


def test_triangle_census_no_cartesian_bounded_joins(tables):
    """The oriented-edge triangle join must stay equi-join (never
    cartesian), and readability is pure scan-stage (zero shuffles)."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.graph import (
        triangle_stats,
    )
    from iceberg_geospatial_api_server_spark.operators.text import (
        lexical_complexity,
    )
    from iceberg_geospatial_api_server_spark.plans.explain import (
        assert_no_cartesian,
        shuffle_count,
    )

    li = tables["lineitem"].select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "ok").filter(F.col("src") < F.col("dst")).select("src", "dst")
    out = triangle_stats(edges)
    assert_no_cartesian(out)
    # r8 kernel: the count comes from per-edge adjacency INTERSECTION
    # against the broadcast out-neighborhoods — the O(m^1.5) wedge
    # stream is never materialized, so the plan must carry the two
    # adjacency broadcasts and the intersect expression, and no
    # range/global sort anywhere
    from iceberg_geospatial_api_server_spark.plans.explain import (
        assert_broadcast_join,
        formatted_plan,
        range_exchange_count,
    )

    plan = formatted_plan(out)
    assert "array_intersect" in plan
    assert_broadcast_join(out, min_count=2)
    assert range_exchange_count(plan) == 0
    row = out.first()
    # sanity: wedges >= 3 * triangles always (each triangle closes 3 wedges)
    assert row["n_wedges"] >= 3 * row["n_triangles"] > 0

    assert shuffle_count(lexical_complexity(tables["documents"])) == 0


def test_gapfill_single_shuffle_shape_per_branch(tables):
    """events_gapfill_ffill: the key repartition is the only shuffle
    shape — one HashPartitioning(key) per scan branch (bounds/hourly
    are column-pruned separately) and NOTHING downstream adds an
    exchange: the hourly agg, bounds agg, spine explode, join, LOCF
    window, and final agg all reuse it. No range exchange (no global
    sort), no single-partition funnel."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_gapfill_ffill,
    )
    from iceberg_geospatial_api_server_spark.plans.explain import (
        formatted_plan,
        hash_exchange_count,
        range_exchange_count,
        single_partition_exchange_count,
    )

    out = events_gapfill_ffill(tables["events"])
    plan = formatted_plan(out)
    assert hash_exchange_count(plan) <= 2, plan
    assert range_exchange_count(plan) == 0
    assert single_partition_exchange_count(plan) == 0
    assert "Window" in plan


def test_label_outliers_bounded_exchanges(tables):
    """embed_label_outlier_stats: the corpus shuffles never — centroids
    aggregate on (label, idx) (bounded labels x d) and broadcast back;
    remaining exchanges are over label-sized frames only."""
    from iceberg_geospatial_api_server_spark.operators.ann import (
        embed_label_outlier_stats,
    )
    from iceberg_geospatial_api_server_spark.plans.explain import (
        assert_broadcast_join,
        assert_no_cartesian,
    )

    out = embed_label_outlier_stats(tables["embeddings"])
    assert_no_cartesian(out)
    assert_broadcast_join(out, min_count=2)  # centroid arrays + stats


def test_runtime_bloom_filter_injects_on_selective_fact_join(spark, sf_dir):
    """The 100 TB semi-join-reduction path: with a selective filter on
    one fact side of a shuffled fact-fact join, Catalyst injects a
    runtime bloom filter on the probe side (bloom_filter_agg over the
    join key). Default thresholds gate it to big scans (10 GB
    application side) — exactly where it pays — so the test lowers the
    gate to prove the session config keeps the rewrite REACHABLE."""
    import pytest as _pytest

    if spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled"
    ) != "true":
        _pytest.fail("runtime bloom filter must stay enabled in-session")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = (
            li.join(sel, li["l_orderkey"] == sel["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold",
            old_scan,
        )


def test_geo_extent_pushes_aggregate_to_parquet_footer(spark, sf_dir):
    """The persisted bbox layer's whole reason to exist is that extent
    becomes a footer-stats answer: geo_layer reads the layer through the
    DSv2 parquet source (v1 parquet ignores aggregatePushdown — ADVICE
    r5), so the MIN/MAX plan must carry PushedAggregation and read no
    data pages beyond the aggregate columns' row-group stats."""
    from iceberg_geospatial_api_server_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["geo_extent"](spark, sf_dir))
    assert "PushedAggregation" in plan, plan[:3000]
    assert re.search(r"PushedAggregation: \[[^\]]*MIN", plan), plan[:3000]


def test_triangle_deg_joins_broadcast_no_smj(tables):
    """r10: with broadcast_adj=True the degree attachment joins (und⋈du,
    und⋈dv) broadcast the derived degree frame instead of sort-merging
    the edge stream — the plan must carry NO SortMergeJoin and at least
    four broadcast joins (2 degree legs + 2 adjacency legs)."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.graph import (
        triangle_stats,
    )
    from iceberg_geospatial_api_server_spark.plans.explain import (
        assert_broadcast_join,
        formatted_plan,
    )

    li = tables["lineitem"].select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "ok").filter(F.col("src") < F.col("dst")).select("src", "dst")
    out = triangle_stats(edges)
    plan = formatted_plan(out)
    assert "SortMergeJoin" not in plan
    assert_broadcast_join(out, min_count=4)


def test_phash_pairs_single_python_pipeline(spark, sf_dir):
    """r10: the bucket aggregation replaced the block self-join, so the
    Python decode+hash pipeline (2 MapInPandas kernels: synthesize +
    phash) appears ONCE in the plan — the join formulation evaluated it
    twice (4 MapInPandas nodes)."""
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        image_phash,
        phash_dedup_pairs,
        synthesize_image_corpus,
    )
    from iceberg_geospatial_api_server_spark.plans.explain import (
        formatted_plan,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    hashes = image_phash(synthesize_image_corpus(docs), stub=False)
    import re

    plan = formatted_plan(phash_dedup_pairs(hashes))
    nodes = re.findall(r"^\(\d+\) MapInPandas", plan, re.M)
    assert len(nodes) == 2, plan
