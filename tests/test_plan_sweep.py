"""Blanket plan-hygiene sweep: EVERY batch registry entry's physical
plan must be free of CartesianProduct — the one operator shape that is
always a scale-killer. (Broadcast nested-loop joins against bounded
sides — query batches, dimension frames — are a different operator and
are fine.) Entries whose CONSTRUCTION trains a model (k-means, BPE,
PQ codebooks) execute real jobs at plan-build time; they are still
swept, just on the smallest scale factor."""

import pytest


def _entry_names():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E

    return sorted(E.queries().keys())


@pytest.mark.parametrize("name", _entry_names())
def test_no_cartesian_product_anywhere(spark, sf_dir, name):
    import __spark_entry__ as E

    from iceberg_geospatial_api_server_spark.plans import formatted_plan

    df = E.queries()[name](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan[:2000]}"
    # row-at-a-time Python UDFs are banned everywhere: Python in the
    # data path must be Arrow-batched (ArrowEvalPython / MapInPandas /
    # FlatMapGroupsInPandas), never per-row BatchEvalPython
    assert "BatchEvalPython" not in plan, f"{name} uses a per-row UDF:\n{plan[:2000]}"
