"""Z-order clustered writes: correctness (same rows, both layouts) and a
MEASURED pruning win — bbox predicates must admit strictly fewer row
groups against the z-ordered layout's footer stats than against the
id-ordered baseline.
"""

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.sources.zorder import (
    row_groups_admitted,
    zorder_key,
    zorder_write,
)


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_points,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    return lineitem_points(load_table(spark, sf_dir, "lineitem"))


@pytest.fixture(scope="module")
def layouts(spark, points, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    plain = str(base / "plain")
    zordered = str(base / "zordered")
    # baseline: same file/row-group count, clustered by id order instead
    (
        points.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(plain)
    )
    zorder_write(points, ["x", "y"], zordered, n_files=8)
    return plain, zordered


def test_zorder_write_preserves_rows(spark, points, layouts):
    plain, zordered = layouts
    a = {tuple(r) for r in spark.read.parquet(plain).collect()}
    b = {tuple(r) for r in spark.read.parquet(zordered).collect()}
    assert a == b


def test_zorder_prunes_bbox_row_groups(spark, points, layouts):
    """The honest yardstick: for a small bbox, row-group footer stats on
    (x, y) must admit a strictly smaller fraction of the z-ordered file
    than of the id-ordered one (which is uncorrelated with x/y, so its
    per-group x/y ranges are wide → nothing prunes)."""
    plain, zordered = layouts
    mnx, mxx, mny, mxy = points.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).first()
    cx, cy = (mnx + mxx) / 2, (mny + mxy) / 2
    dx, dy = (mxx - mnx) / 8, (mxy - mny) / 8
    bbox = {"x": (cx - dx, cx + dx), "y": (cy - dy, cy + dy)}

    adm_plain, tot_plain = row_groups_admitted(plain, bbox)
    adm_z, tot_z = row_groups_admitted(zordered, bbox)
    assert tot_plain > 0 and tot_z > 0
    frac_plain = adm_plain / tot_plain
    frac_z = adm_z / tot_z
    assert frac_z < frac_plain, (
        f"zorder must prune: z={adm_z}/{tot_z} vs plain={adm_plain}/{tot_plain}"
    )
    # and the filtered scan returns identical rows from both layouts
    cond = (
        (F.col("x") >= bbox["x"][0]) & (F.col("x") <= bbox["x"][1])
        & (F.col("y") >= bbox["y"][0]) & (F.col("y") <= bbox["y"][1])
    )
    a = {tuple(r) for r in spark.read.parquet(plain).filter(cond).collect()}
    b = {tuple(r) for r in spark.read.parquet(zordered).filter(cond).collect()}
    assert a == b and a


def test_zorder_key_locality():
    """Morton-key sanity on a tiny grid: neighbors in (x, y) land nearer
    in key space than far-apart points (the property the layout relies
    on), and the interleave is exact on known bit patterns."""
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "qx LONG, qy LONG"
    )
    out = df.select(
        "qx", "qy", zorder_key([F.col("qx"), F.col("qy")], bits=2).alias("z")
    ).collect()
    got = {(r.qx, r.qy): r.z for r in out}
    # interleave: z = x0 y0 x1 y1 (x bit i → position 2i, y bit i → 2i+1)
    for (x, y), z in got.items():
        expect = (
            (x & 1) | ((y & 1) << 1) | (((x >> 1) & 1) << 2)
            | (((y >> 1) & 1) << 3)
        )
        assert z == expect, (x, y, z, expect)


def test_zorder_key_rejects_sign_bit_overflow():
    """bits x n_cols beyond 63 reaches the long sign bit -> negative
    keys that break Morton order; zorder_key must refuse (r3 ADVICE)."""
    import pytest
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.sources.zorder import zorder_key

    cols = [F.lit(1).cast("long")] * 4
    with pytest.raises(ValueError, match="sign bit"):
        zorder_key(cols, bits=16)  # 64 bits total


def test_zorder_write_auto_reduces_bits(spark, tmp_path):
    """zorder_write quantizes AND interleaves with the reduced bit
    width, so 4-column defaults stay correct (keys non-negative)."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({
        "a": range(100), "b": range(100), "c": range(100), "d": range(100),
    })
    df = spark.createDataFrame(pdf)
    from iceberg_geospatial_api_server_spark.sources.zorder import (
        zorder_write,
    )

    path = str(tmp_path / "z4")
    zorder_write(df, ["a", "b", "c", "d"], path, n_files=2, bits=16)
    assert spark.read.parquet(path).count() == 100
