"""Web-map tile and hexagon binning — the XYZ / HexagonLayer aggregation
analogs of the reference's server-side grid-aggregate mode.

The reference's webmap is a deck.gl client fed by the API's
``mode=aggregate`` grid binning (ref api/main.py:410-443); production map
stacks bin the same features into slippy-map XYZ tiles (OSM tile scheme)
and deck.gl ``HexagonLayer`` hexagons. Both assignments are closed-form
arithmetic on (lon, lat), so they compile to whole-stage-codegen JVM
expressions with no UDF and ONE hash exchange for the aggregation —
at 100 TB the bin key is uniform by construction (tiles/hexes partition
the plane), so the shuffle has no hot key.

Cross-engine contract (the geo_mercator / geo_utm pattern): every bin
expression is built ONCE as SQL text and used verbatim on both sides —
``F.expr`` in the Spark plan and string-substituted into the DuckDB
oracle — so the two engines execute an identical IEEE operation sequence
and integer bin ids match exactly (no rounding tolerance needed).

Hex rounding uses FLOOR(v + 0.5) instead of ROUND: the engines disagree
on ROUND's half mode (DuckDB half-away vs Spark HALF_UP on decimals) and
on the sign of a rounded zero, while FLOOR(v + 0.5) is one deterministic
IEEE sequence on both.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tile_expr_sql",
    "tile_cols",
    "tile_aggregate",
    "hex_steps_sql",
    "hex_bin",
    "hex_aggregate",
    "hex_oracle_cte",
]


# ---------------------------------------------------------------------------
# XYZ (slippy-map) tiles
# ---------------------------------------------------------------------------


def tile_expr_sql(x: str, y: str, zoom: int) -> tuple[str, str]:
    """(tile_x, tile_y) SQL expression text for the OSM XYZ tile scheme at
    ``zoom``: tx = floor((lon+180)/360 * 2^z), ty from the Web-Mercator
    latitude transform, both clamped to [0, 2^z - 1] (the poles clamp to
    the edge tile exactly as web map servers do).

    The text is valid — and IEEE-identical — in both Spark SQL and DuckDB:
    RADIANS/TAN/COS/LN/PI/FLOOR/LEAST/GREATEST all exist in both dialects.
    """
    n = repr(float(1 << zoom))
    top = repr(float((1 << zoom) - 1))
    tx = (
        f"CAST(LEAST(GREATEST(FLOOR((({x}) + 180.0) / CAST(360.0 AS DOUBLE)"
        f" * {n}), 0.0), {top}) AS BIGINT)"
    )
    ty = (
        f"CAST(LEAST(GREATEST(FLOOR((1.0 - LN(TAN(RADIANS({y}))"
        f" + 1.0 / COS(RADIANS({y}))) / PI()) / CAST(2.0 AS DOUBLE)"
        f" * {n}), 0.0), {top}) AS BIGINT)"
    )
    return tx, ty


def tile_cols(x_col: str, y_col: str, zoom: int) -> tuple[Column, Column]:
    tx, ty = tile_expr_sql(x_col, y_col, zoom)
    return F.expr(tx), F.expr(ty)


def tile_aggregate(
    df: DataFrame,
    x_col: str,
    y_col: str,
    zoom: int,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-tile aggregation at ``zoom``. Map-side arithmetic assigns the
    tile, then ONE hash exchange on (tile_x, tile_y) — partial aggregation
    is free via groupBy built-ins, and the tile grid is a uniform key
    space, so no salting is ever needed."""
    tx, ty = tile_cols(x_col, y_col, zoom)
    if aggs is None:
        aggs = [F.count(F.lit(1)).alias("n")]
    return (
        df.withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .groupBy("tile_x", "tile_y")
        .agg(*aggs)
    )


# ---------------------------------------------------------------------------
# Hexagon binning (pointy-top axial grid, deck.gl HexagonLayer semantics)
# ---------------------------------------------------------------------------

_SQRT3_3 = repr(math.sqrt(3.0) / 3.0)  # sqrt(3)/3
_SQRT3 = repr(math.sqrt(3.0))
_TWO_3 = repr(2.0 / 3.0)


def hex_steps_sql(x: str, y: str, size: float) -> list[tuple[str, str]]:
    """The hex-bin computation as an ordered list of (column, SQL text)
    steps, each referencing only input columns and earlier steps. Spark
    applies them as a withColumn chain; the oracle nests them as CTEs —
    identical text, identical IEEE sequence.

    Pointy-top axial coordinates (q, r) with cube rounding (the standard
    hex-grid assignment deck.gl's HexagonLayer uses): fractional axial
    coords, round each cube coordinate, then repair the one with the
    largest rounding error so q + r + s == 0 holds.
    """
    s = repr(float(size))
    return [
        ("hq_f", f"(({x}) * {_SQRT3_3} - ({y}) / CAST(3.0 AS DOUBLE)) / CAST({s} AS DOUBLE)"),
        ("hr_f", f"(({y}) * {_TWO_3}) / CAST({s} AS DOUBLE)"),
        ("hs_f", "-hq_f - hr_f"),
        ("rq", "FLOOR(hq_f + 0.5)"),
        ("rr", "FLOOR(hr_f + 0.5)"),
        ("rs", "FLOOR(hs_f + 0.5)"),
        ("dq", "ABS(rq - hq_f)"),
        ("dr", "ABS(rr - hr_f)"),
        ("ds", "ABS(rs - hs_f)"),
        (
            "hex_q",
            "CAST(CASE WHEN dq > dr AND dq > ds THEN -rr - rs ELSE rq END"
            " AS BIGINT)",
        ),
        (
            "hex_r",
            "CAST(CASE WHEN NOT (dq > dr AND dq > ds) AND dr > ds"
            " THEN -rq - rs ELSE rr END AS BIGINT)",
        ),
        # hex centers back in data coordinates (for rendering): the +0.0
        # normalizes IEEE -0.0, whose repr differs between engines
        ("hex_cx", f"CAST({s} AS DOUBLE) * {_SQRT3} * (hex_q + hex_r / CAST(2.0 AS DOUBLE)) + 0.0"),
        ("hex_cy", f"CAST({s} AS DOUBLE) * 1.5 * hex_r + 0.0"),
    ]


def hex_bin(df: DataFrame, x_col: str, y_col: str, size: float) -> DataFrame:
    """Append hex_q/hex_r/hex_cx/hex_cy bin columns — pure map-side JVM
    arithmetic (every step is an F.expr over prior columns; Catalyst
    collapses the chain into one projection)."""
    out = df
    for name, sql in hex_steps_sql(x_col, y_col, size):
        out = out.withColumn(name, F.expr(sql))
    return out.drop(
        "hq_f", "hr_f", "hs_f", "rq", "rr", "rs", "dq", "dr", "ds"
    )


def hex_aggregate(
    df: DataFrame,
    x_col: str,
    y_col: str,
    size: float,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-hexagon aggregation (HexagonLayer server-side analog): map-side
    bin assignment, one uniform hash exchange on (hex_q, hex_r)."""
    if aggs is None:
        aggs = [F.count(F.lit(1)).alias("n")]
    return (
        hex_bin(df, x_col, y_col, size)
        .groupBy("hex_q", "hex_r", "hex_cx", "hex_cy")
        .agg(*aggs)
    )


def tile_pyramid(
    df: DataFrame,
    x_col: str,
    y_col: str,
    zmax: int,
    zmin: int = 0,
    value_col: str | None = None,
) -> DataFrame:
    """Build the full tile pyramid zmin..zmax in ONE pass over the data:
    bin at zmax, then roll each level up from its children
    (parent = child DIV 2 — exact, because n_z = 2·n_{z-1} makes the two
    floor computations identical in IEEE, so rollup ≡ direct binning at
    every level; the oracle grades exactly that claim).

    Scale: the corpus is scanned and shuffled ONCE (the zmax exchange);
    the rollup then runs over the zmax TILE table (≤ min(4^zmax, n)
    rows — corpus-independent) as a single explode-to-ancestors pass:
    each zmax tile emits one (zoom, tile DIV 2^(zmax−z)) row per level,
    and ONE (zoom, x, y) aggregate sums them. Two exchanges total for
    the whole pyramid — the r6 rework of the per-level rollup chain,
    which paid one (tiny) exchange + query stage PER LEVEL (measured
    ~0.5s of stage floor at sf0.1, zmax=6) for the same associative
    sums. Parent keys are exact: tile DIV 2^k ≡ k successive DIV 2
    halvings, so rollup ≡ direct binning at every level (the oracle
    grades exactly that claim).
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    roll = [F.sum("n").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_val"))
        roll.append(F.sum("sum_val").alias("sum_val"))
    base = tile_aggregate(df, x_col, y_col, zmax, aggs=aggs)
    levels = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(z).cast("int").alias("zoom"),
                    F.expr(
                        f"CAST(tile_x DIV {2 ** (zmax - z)} AS BIGINT)"
                    ).alias("tile_x"),
                    F.expr(
                        f"CAST(tile_y DIV {2 ** (zmax - z)} AS BIGINT)"
                    ).alias("tile_y"),
                )
                for z in range(zmax, zmin - 1, -1)
            ]
        )
    )
    return (
        base.select(levels.alias("__l"), *[a for a in ["n", "sum_val"] if a in base.columns])
        .groupBy(
            F.col("__l.tile_x").alias("tile_x"),
            F.col("__l.tile_y").alias("tile_y"),
            F.col("__l.zoom").alias("zoom"),
        )
        .agg(*roll)
        .select("tile_x", "tile_y", *[c for c in ["n", "sum_val"] if c in base.columns], "zoom")
    )


def hex_oracle_cte(base_sql: str, x: str, y: str, size: float) -> str:
    """Wrap ``base_sql`` (a SELECT producing at least ``x``/``y``) in the
    chained-CTE form of hex_steps_sql, exposing every step column —
    the DuckDB half of the shared-expression contract."""
    steps = hex_steps_sql(x, y, size)
    sql = f"WITH hx0 AS ({base_sql})"
    prev = "hx0"
    for i, (name, expr) in enumerate(steps, start=1):
        cur = f"hx{i}"
        sql += f", {cur} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = cur
    return sql + f" SELECT * FROM {prev}"


def heatmap_grid(
    df: DataFrame,
    x_col: str,
    y_col: str,
    cell: float,
    sigma_cells: float = 1.0,
    reach: int = 2,
    weight_quant: int = 1_000_000,
) -> DataFrame:
    """Gaussian kernel-density heat grid (deck.gl HeatmapLayer semantics):
    every point splats exp(-d²/2σ²) onto the grid cells within ``reach``
    cells of its own — a constant (2·reach+1)² map-side fan-out, then ONE
    uniform (gx, gy) exchange sums the splats.

    Cross-engine exactness: the kernel weight quantizes to an integer
    (FLOOR(w·weight_quant)) BEFORE summation, so cell totals are exact
    integer sums on any partitioning/engine (the corpus_perplexity
    pattern); d² is measured point-to-CELL-CENTER in cell units — the
    same closed-form double arithmetic the DuckDB oracle runs.
    """
    inv2s2 = 1.0 / (2.0 * sigma_cells * sigma_cells)
    gx0 = F.floor(F.col(x_col) / F.lit(cell)).cast("long")
    gy0 = F.floor(F.col(y_col) / F.lit(cell)).cast("long")
    fx = F.col(x_col) / F.lit(cell)  # position in cell units
    fy = F.col(y_col) / F.lit(cell)
    off = F.sequence(F.lit(-reach), F.lit(reach))
    out = (
        df.withColumn("__gx0", gx0)
        .withColumn("__gy0", gy0)
        .withColumn("__fx", fx)
        .withColumn("__fy", fy)
        .withColumn("__dx", F.explode(off))
        .withColumn("__dy", F.explode(off))
    )
    cxc = (F.col("__gx0") + F.col("__dx")).cast("double") + F.lit(0.5)
    cyc = (F.col("__gy0") + F.col("__dy")).cast("double") + F.lit(0.5)
    d2 = (F.col("__fx") - cxc) * (F.col("__fx") - cxc) + (
        F.col("__fy") - cyc
    ) * (F.col("__fy") - cyc)
    w = F.floor(
        F.exp(-d2 * F.lit(inv2s2)) * F.lit(float(weight_quant))
    ).cast("long")
    return (
        out.groupBy(
            (F.col("__gx0") + F.col("__dx")).alias("gx"),
            (F.col("__gy0") + F.col("__dy")).alias("gy"),
        )
        .agg(F.sum(w).alias("heat"), F.count(F.lit(1)).alias("n_splats"))
        .filter(F.col("heat") > 0)
    )


# ---------------------------------------------------------------------------
# Getis-Ord Gi* hotspot analysis (the ArcGIS "Hot Spot Analysis" tool)
# ---------------------------------------------------------------------------

GI_STEPS: list[tuple[str, str]] = [
    # shared Spark/DuckDB expression steps over (n_cells, sx, sxx, wx, w):
    # identical text ⇒ identical IEEE sequence ⇒ the 6-dp-rounded z
    # hash-matches (inputs are exact integers, z's ties have measure 0)
    ("n_d", "CAST(n_cells AS DOUBLE)"),
    ("w_d", "CAST(w AS DOUBLE)"),
    ("xbar", "CAST(sx AS DOUBLE) / n_d"),
    ("s_dev", "SQRT(CAST(sxx AS DOUBLE) / n_d - xbar * xbar)"),
    (
        "gi_z",
        "(CAST(wx AS DOUBLE) - xbar * w_d)"
        " / (s_dev * SQRT((n_d * w_d - w_d * w_d) / (n_d - 1.0)))",
    ),
]


def hotspot_gi_star(
    df: DataFrame, x_col: str, y_col: str, cell: float
) -> DataFrame:
    """Getis-Ord Gi* hotspot z-scores over a binned grid (Getis & Ord
    1992; the ArcGIS Hot Spot Analysis tool, a first-class capability
    of any Esri-compatible analytics server). Universe = cells holding
    ≥1 point; weights are binary over the 3×3 neighborhood including
    self; x = per-cell point count.

    Scale shape: ONE corpus-sized exchange (the cell binning); the
    neighbor sums are a constant 3×3 map-side splat over the CELL frame
    joined back to universe cells, and the global moments ride a
    single-partition window over that bounded cell frame (the
    corpus_token_budget convention). All Gi* inputs (Σwx, W, n, Σx,
    Σx²) are exact integers; the z formula is shared expression text.
    gi_z is undefined for a degenerate universe (n ≤ 1 or zero
    variance): the NaN/±inf of the shared formula propagates identically
    on both engines.
    """
    gx = F.floor(F.col(x_col) / F.lit(cell)).cast("long")
    gy = F.floor(F.col(y_col) / F.lit(cell)).cast("long")
    cells = (
        df.withColumn("gx", gx)
        .withColumn("gy", gy)
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    off = F.sequence(F.lit(-1), F.lit(1))
    splat = (
        cells.withColumn("__dx", F.explode(off))
        .withColumn("__dy", F.explode(off))
        .select(
            (F.col("gx") + F.col("__dx")).alias("gx"),
            (F.col("gy") + F.col("__dy")).alias("gy"),
            F.col("n_points").alias("__contrib"),
        )
        .groupBy("gx", "gy")
        .agg(
            F.sum("__contrib").alias("wx"),
            F.count(F.lit(1)).alias("w"),
        )
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy(F.lit(1))
    out = (
        cells.join(splat, ["gx", "gy"])
        .withColumn("n_cells", F.count(F.lit(1)).over(w_all))
        .withColumn("sx", F.sum("n_points").over(w_all))
        .withColumn(
            "sxx", F.sum(F.col("n_points") * F.col("n_points")).over(w_all)
        )
    )
    for name, sql in GI_STEPS:
        out = out.withColumn(name, F.expr(sql))
    return out.select(
        "gx",
        "gy",
        F.col("n_points").cast("long").alias("n_points"),
        F.col("wx").cast("long").alias("wx"),
        F.col("w").cast("long").alias("w"),
        # + 0.0 maps a rounded -0.0 to +0.0 (engine reprs differ)
        (F.round(F.col("gi_z"), 6) + F.lit(0.0)).alias("gi_z"),
    ).orderBy("gx", "gy")


MORAN_STEPS: list[tuple[str, str]] = [
    # shared-text Moran's I over exact-integer inputs
    # (n_cells, sx, sxx, w_sum, s_cross, s_pairsum, s_deg2):
    ("n_d", "CAST(n_cells AS DOUBLE)"),
    ("w_d", "CAST(w_sum AS DOUBLE)"),
    ("xbar", "CAST(sx AS DOUBLE) / n_d"),
    # Σ_ij w (xi−x̄)(xj−x̄) = Σ w xi xj − x̄ Σ w (xi+xj) + W x̄²
    (
        "num",
        "CAST(s_cross AS DOUBLE) - xbar * CAST(s_pairsum AS DOUBLE)"
        " + w_d * xbar * xbar",
    ),
    ("den", "CAST(sxx AS DOUBLE) - n_d * xbar * xbar"),
    ("i_moran", "(n_d / w_d) * (num / den)"),
    ("e_i", "-1.0 / (n_d - 1.0)"),
    # normality-assumption variance: S1 = 2W (binary symmetric),
    # S2 = 4·Σdeg² →
    # Var = (n²S1 − nS2 + 3W²) / (W²(n²−1)) − E[I]²
    (
        "var_i",
        "(n_d * n_d * (2.0 * w_d) - n_d * (4.0 * CAST(s_deg2 AS DOUBLE))"
        " + 3.0 * w_d * w_d) / (w_d * w_d * (n_d * n_d - 1.0))"
        " - e_i * e_i",
    ),
    ("z_i", "(i_moran - e_i) / SQRT(var_i)"),
]


def moran_i(df: DataFrame, x_col: str, y_col: str, cell: float) -> DataFrame:
    """Global Moran's I spatial autocorrelation (Moran 1950) over the
    binned grid — the global complement of the local Gi* hotspot tool,
    with the normality-assumption z-score. Universe/weights as in
    hotspot_gi_star: occupied cells, binary 3×3 weights EXCLUDING self
    (Moran's w_ii = 0 by definition).

    Every sum entering the formula is an exact integer (cross products,
    pair sums, degrees, moments), aggregated in two tiny exchanges over
    the cell frame; the I/E/Var/z arithmetic is shared expression text,
    so the single output row hash-matches at 6 dp."""
    gx = F.floor(F.col(x_col) / F.lit(cell)).cast("long")
    gy = F.floor(F.col(y_col) / F.lit(cell)).cast("long")
    cells = (
        df.withColumn("gx", gx)
        .withColumn("gy", gy)
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("xv"))
    )
    off = F.sequence(F.lit(-1), F.lit(1))
    probe = (
        cells.withColumn("__dx", F.explode(off))
        .withColumn("__dy", F.explode(off))
        .filter((F.col("__dx") != 0) | (F.col("__dy") != 0))
        .select(
            (F.col("gx") + F.col("__dx")).alias("gx"),
            (F.col("gy") + F.col("__dy")).alias("gy"),
            F.col("xv").alias("xi"),
        )
    )
    pairs = probe.join(
        cells.select("gx", "gy", F.col("xv").alias("xj")), ["gx", "gy"]
    )
    deg = pairs.groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("deg"))
    pair_aggs = pairs.agg(
        F.sum(F.col("xi") * F.col("xj")).alias("s_cross"),
        F.sum(F.col("xi") + F.col("xj")).alias("s_pairsum"),
        F.count(F.lit(1)).alias("w_sum"),
    )
    deg_aggs = deg.agg(F.sum(F.col("deg") * F.col("deg")).alias("s_deg2"))
    cell_aggs = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("xv").alias("sx"),
        F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
    )
    out = cell_aggs.crossJoin(pair_aggs).crossJoin(deg_aggs)
    for name, sql in MORAN_STEPS:
        out = out.withColumn(name, F.expr(sql))
    return out.select(
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("w_sum").cast("long").alias("w_sum"),
        (F.round("i_moran", 6) + F.lit(0.0)).alias("i_moran"),
        (F.round("e_i", 6) + F.lit(0.0)).alias("e_i"),
        (F.round("z_i", 6) + F.lit(0.0)).alias("z_i"),
    )
