"""Group R — spatial analytics over hash-derived coordinates.

The ClickHouse deployment story ships geo functions (geohashEncode,
pointInPolygon, greatCircleDistance); this module covers the EXACT-
geometry members of that family with bit-exact DuckDB oracles, plus
the FLOAT member (r_geo_distance, round 13) as a ROWS-ONLY key: libm
sin/cos is not correctly rounded, so trig can never enter a hash
oracle — instead it pins to an independent numpy haversine within
stated bounds (tests/test_geo_distance.py, the l_pagerank pattern).

Coordinates are micro-degree BIGINTs derived from the shared md5 hash
(lat in [-90e6, 90e6), lon in [-180e6, 180e6)), so both engines
re-derive identical points from the raw tables.

Scale design: every key is row-local bit/compare math plus at most one
bounded broadcast join — the grid-bucket spatial join is the canonical
100 TB shape (cell key prunes candidates BEFORE exact containment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bristle_spark.catalog import load_table
from bristle_spark.functions.hashing import hash60, hash60_sql
from bristle_spark.functions.rounding import r6, r6_sql
from bristle_spark.registry import register

# micro-degree derivation (shared by every key, both engines)
_LAT_HASH = hash60_sql("CAST(event_id AS VARCHAR) || ':lat'")
_LON_HASH = hash60_sql("CAST(event_id AS VARCHAR) || ':lon'")
_LAT_SQL = f"({_LAT_HASH} % 180000000) - 90000000"
_LON_SQL = f"({_LON_HASH} % 360000000) - 180000000"


def _lat_col() -> F.Column:
    return (
        hash60(F.concat(F.col("event_id").cast("string"), F.lit(":lat")))
        % 180_000_000
        - 90_000_000
    )


def _lon_col() -> F.Column:
    return (
        hash60(F.concat(F.col("event_id").cast("string"), F.lit(":lon")))
        % 360_000_000
        - 180_000_000
    )


# ---------------------------------------------------------------------------
# r_geohash_encode

GEOHASH_BITS = 20  # per axis; 40 bits total = 8 base32 chars
_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

# Both engines render from ONE generator parameterized by the integer-
# division token ('//' DuckDB, 'DIV' Spark) — the _ray_terms pattern —
# so the 20-term interleave and 8-term base32 expressions cannot drift
# between sides.


def _interleave_terms(div: str) -> str:
    """Geohash bit interleave: lon (even positions from the top) and
    lat bits alternate.  With latq/lonq as 20-bit integers (bit 19 =
    MSB), code = Σ_i lon_bit(19-i) << (39-2i) + lat_bit(19-i) << (38-2i)."""
    return " + ".join(
        f"(((lonq {div} {1 << (19 - i)}) % 2) * {1 << (39 - 2 * i)})"
        f" + (((latq {div} {1 << (19 - i)}) % 2) * {1 << (38 - 2 * i)})"
        for i in range(20)
    )


def _b32_concat(div: str) -> str:
    """Per-digit base32 chars (no correlated subquery, no float pow):
    digit k = (code div 32^(7-k)) % 32 indexes the alphabet."""
    return " || ".join(
        f"substr('{_GEOHASH_ALPHABET}', CAST((code {div} {32 ** (7 - k)}) % 32 AS INT) + 1, 1)"
        for k in range(8)
    )


@register(
    "r_geohash_encode",
    oracle=f"""
    WITH pts AS (
        SELECT event_id,
               CAST({_LAT_SQL} AS BIGINT) AS ilat,
               CAST({_LON_SQL} AS BIGINT) AS ilon
        FROM events
    ),
    q AS (
        SELECT event_id, ilat, ilon,
               CAST((ilat + 90000000) * {1 << GEOHASH_BITS} // 180000000 AS BIGINT) AS latq,
               CAST((ilon + 180000000) * {1 << GEOHASH_BITS} // 360000000 AS BIGINT) AS lonq
        FROM pts
    ),
    coded AS (
        SELECT event_id, ilat, ilon, latq, lonq,
               CAST({_interleave_terms("//")} AS BIGINT) AS code
        FROM q
    ),
    hashed AS (
        SELECT event_id, ilat, ilon, latq, lonq, code,
               {_b32_concat("//")} AS geohash8
        FROM coded
    )
    SELECT event_id, ilat, ilon, geohash8,
           substr(geohash8, 1, 4) AS cell4,
           CAST(CASE WHEN
                    (code // {1 << 39}) % 2 = (lonq // {1 << 19}) % 2
                AND (code // {1 << 38}) % 2 = (latq // {1 << 19}) % 2
                THEN 1 ELSE 0 END AS INT) AS msb_witness
    FROM hashed
    """,
)
def r_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (the ClickHouse ``geohashEncode`` analog) of
    hash-derived micro-degree points: each axis quantizes to
    {GEOHASH_BITS} bits by pure integer floor-division, the bits
    interleave lon-first into a 40-bit cell code, and the code renders
    as the standard 8-character base32 geohash — the spatial bucketing
    key every geo warehouse groups and joins on (prefix length = cell
    size).  cell4 (the 4-char prefix) is the coarse aggregation key
    downstream keys reuse; msb_witness re-extracts the two top bits
    from the packed code against the quantized inputs.

    Determinism: hash-derived BIGINT micro-degrees; quantization is
    (x + offset) · 2^{GEOHASH_BITS} // span (exact — the product tops
    out near 2^48); the 40-term interleave expression is rendered once
    in Python for both engines; base32 digits are integer divides.

    Scale shape: pure row-local scan expressions, zero shuffles — the
    Group T codec discipline applied to a spatial key.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id", _lat_col().alias("ilat"), _lon_col().alias("ilon")
    )
    q = pts.select(
        "event_id",
        "ilat",
        "ilon",
        F.expr(f"CAST((ilat + 90000000) * {1 << GEOHASH_BITS} DIV 180000000 AS BIGINT)").alias(
            "latq"
        ),
        F.expr(f"CAST((ilon + 180000000) * {1 << GEOHASH_BITS} DIV 360000000 AS BIGINT)").alias(
            "lonq"
        ),
    )
    coded = q.select(
        "event_id",
        "ilat",
        "ilon",
        "latq",
        "lonq",
        F.expr(f"CAST({_interleave_terms('DIV')} AS BIGINT)").alias("code"),
    )
    geohash8 = F.expr(_b32_concat("DIV"))
    hashed = coded.select(
        "event_id",
        "ilat",
        "ilon",
        "latq",
        "lonq",
        "code",
        geohash8.alias("geohash8"),
    )
    msb = (
        (
            F.expr(f"(code DIV {1 << 39}) % 2 = (lonq DIV {1 << 19}) % 2")
        )
        & (F.expr(f"(code DIV {1 << 38}) % 2 = (latq DIV {1 << 19}) % 2"))
    ).cast("int")
    return hashed.select(
        "event_id",
        "ilat",
        "ilon",
        "geohash8",
        F.substring("geohash8", 1, 4).alias("cell4"),
        msb.alias("msb_witness"),
    )


# ---------------------------------------------------------------------------
# r_point_in_polygon

# Fixed test polygon (micro-degrees): a non-convex hexagon spanning a
# big slice of the coordinate space so both branches populate.  Edges
# are rendered per-vertex-pair in Python for both engines; containment
# is standard ray casting with EXACT integer cross-multiplication
# (the division-free form: for an upward-crossing edge, the ray at
# py crosses left of the point iff (px-x1)(y2-y1) > (x2-x1)(py-y1)
# with the sign flipped for downward edges).
_POLY = [
    (-120_000_000, -60_000_000),
    (-20_000_000, -80_000_000),
    (100_000_000, -40_000_000),
    (60_000_000, 30_000_000),
    (140_000_000, 70_000_000),
    (-80_000_000, 60_000_000),
]


def _ray_terms(px: str, py: str) -> str:
    """Division-free ray-cast crossing terms, one per edge (rendered
    once, shared by both engines — pure integer compares)."""
    terms = []
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        # half-open rule [min(y1,y2), max) excludes double-counting at
        # shared vertices
        cond = (
            f"(CASE WHEN (({y1} <= {py}) AND ({py} < {y2})"
            f" AND (({px} - {x1}) * {y2 - y1} < ({x2 - x1}) * ({py} - {y1})))"
            f" OR (({y2} <= {py}) AND ({py} < {y1})"
            f" AND (({px} - {x1}) * {y2 - y1} > ({x2 - x1}) * ({py} - {y1})))"
            f" THEN 1 ELSE 0 END)"
        )
        terms.append(cond)
    return " + ".join(terms)


# shared with s_stream_geofence: the streamed rollup must land the
# SAME final state this batch SQL defines
POINT_IN_POLYGON_ORACLE_SQL = f"""
    WITH pts AS (
        SELECT event_id, event_type,
               CAST({_LAT_SQL} AS BIGINT) AS py,
               CAST({_LON_SQL} AS BIGINT) AS px
        FROM events
    ),
    hits AS (
        SELECT event_type,
               CAST(({_ray_terms("px", "py")}) % 2 AS BIGINT) AS inside
        FROM pts
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(inside) AS BIGINT) AS n_inside,
           {r6_sql('CAST(sum(inside) AS DOUBLE) / count(*)')} AS inside_share
    FROM hits GROUP BY event_type
    """


@register("r_point_in_polygon", oracle=POINT_IN_POLYGON_ORACLE_SQL)
def r_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment (the ClickHouse ``pointInPolygon``
    analog) of hash-derived micro-degree points against a fixed
    non-convex hexagon, by division-free ray casting: per edge, the
    horizontal ray's crossing test cross-multiplies instead of
    dividing, so every comparison is exact BIGINT (products top out
    near 2^55) — no epsilon, no float geometry.  Aggregated to the
    per-event-type containment share (the geofence-rollup query shape).

    Determinism: the edge terms are rendered once in Python for both
    engines; the half-open vertical rule ([ymin, ymax) per edge) pins
    vertex-ray grazing identically.

    Scale shape: one map-side-combined aggregation over row-local
    integer predicates; the polygon is a compile-time literal (a
    production variant broadcasts a polygon table and grid-buckets
    first — r_spatial_grid_join's shape).
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        _lat_col().alias("py"),
        _lon_col().alias("px"),
    )
    inside = F.expr(f"CAST(({_ray_terms('px', 'py')}) % 2 AS BIGINT)")
    hits = pts.select("event_type", inside.alias("inside"))
    return hits.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("inside").cast("bigint").alias("n_inside"),
        r6(F.sum("inside").cast("double") / F.count(F.lit(1))).alias("inside_share"),
    )


# ---------------------------------------------------------------------------
# r_spatial_grid_join

GRID_DEG = 30  # 30-degree cells: 6 lat bands x 12 lon bands
_REGION_SALT = ":rg"


@register(
    "r_spatial_grid_join",
    oracle=f"""
    WITH pts AS (
        SELECT event_id,
               CAST({_LAT_SQL} AS BIGINT) AS py,
               CAST({_LON_SQL} AS BIGINT) AS px
        FROM events
    ),
    cells AS (
        SELECT event_id, px, py,
               CAST((py + 90000000) // {GRID_DEG * 1_000_000} AS BIGINT) AS gy,
               CAST((px + 180000000) // {GRID_DEG * 1_000_000} AS BIGINT) AS gx
        FROM pts
    ),
    boxes AS (
        SELECT n_nationkey AS box_id, n_name,
               CAST(({hash60_sql("n_name || ':x0'")} % 300000000) - 180000000 AS BIGINT) AS x0,
               CAST(({hash60_sql("n_name || ':y0'")} % 150000000) - 90000000 AS BIGINT) AS y0
        FROM nation
    ),
    boxes2 AS (
        SELECT box_id, n_name, x0, y0,
               x0 + 60000000 AS x1, y0 + 30000000 AS y1
        FROM boxes
    ),
    box_cells AS (
        SELECT boxes2.*, gy.gy, gx.gx
        FROM boxes2
        CROSS JOIN range(0, 6) gy(gy)
        CROSS JOIN range(0, 12) gx(gx)
        WHERE gy.gy BETWEEN (y0 + 90000000) // {GRID_DEG * 1_000_000}
                        AND (y1 + 90000000) // {GRID_DEG * 1_000_000}
          AND gx.gx BETWEEN (x0 + 180000000) // {GRID_DEG * 1_000_000}
                        AND (x1 + 180000000) // {GRID_DEG * 1_000_000}
    ),
    joined AS (
        SELECT b.box_id, b.n_name,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(CASE WHEN c.px >= b.x0 AND c.px < b.x1
                              AND c.py >= b.y0 AND c.py < b.y1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_contained
        FROM cells c JOIN box_cells b ON c.gy = b.gy AND c.gx = b.gx
        GROUP BY b.box_id, b.n_name
    )
    SELECT box_id, n_name, n_candidates, n_contained
    FROM joined
    """,
)
def r_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial containment join — the canonical 100 TB
    spatial-join shape: points and boxes both key to {GRID_DEG}-degree
    grid cells, the equi-join on cell ids prunes the candidate space,
    and the exact bounding-box predicate runs only on co-bucketed
    pairs (never the full cross product).  Boxes are one hash-derived
    60x30-degree rectangle per nation (a bounded broadcast dimension,
    expanded to every cell it overlaps); the output reports candidate
    vs contained counts per box — the join-selectivity readout that
    tells a pipeline whether the grid resolution is right.

    Determinism: all coordinates, cell ids, and predicates are exact
    BIGINT arithmetic.  Scale shape: the point side shuffles once on
    the cell key (map-side combinable after the join); the box-cell
    frame is |boxes| x overlapped-cells and BROADCAST; exact
    containment is a row-local filter after the prune — the blowup
    bound is (points per cell) x (boxes overlapping that cell).
    """
    ev = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    cell = GRID_DEG * 1_000_000
    pts = ev.select(
        "event_id", _lat_col().alias("py"), _lon_col().alias("px")
    ).select(
        "event_id",
        "px",
        "py",
        F.expr(f"CAST((py + 90000000) DIV {cell} AS BIGINT)").alias("gy"),
        F.expr(f"CAST((px + 180000000) DIV {cell} AS BIGINT)").alias("gx"),
    )
    boxes = nation.select(
        F.col("n_nationkey").alias("box_id"),
        "n_name",
        (
            hash60(F.concat(F.col("n_name"), F.lit(":x0"))) % 300_000_000
            - 180_000_000
        ).alias("x0"),
        (
            hash60(F.concat(F.col("n_name"), F.lit(":y0"))) % 150_000_000
            - 90_000_000
        ).alias("y0"),
    ).select(
        "box_id",
        "n_name",
        "x0",
        "y0",
        (F.col("x0") + 60_000_000).alias("x1"),
        (F.col("y0") + 30_000_000).alias("y1"),
    )
    gys = spark.range(0, 6, 1, 1).select(F.col("id").cast("bigint").alias("gy"))
    gxs = spark.range(0, 12, 1, 1).select(F.col("id").cast("bigint").alias("gx"))
    box_cells = (
        boxes.crossJoin(F.broadcast(gys))
        .crossJoin(F.broadcast(gxs))
        .filter(
            F.col("gy").between(
                F.expr(f"(y0 + 90000000) DIV {cell}"),
                F.expr(f"(y1 + 90000000) DIV {cell}"),
            )
            & F.col("gx").between(
                F.expr(f"(x0 + 180000000) DIV {cell}"),
                F.expr(f"(x1 + 180000000) DIV {cell}"),
            )
        )
    )
    contained = (
        (F.col("px") >= F.col("x0"))
        & (F.col("px") < F.col("x1"))
        & (F.col("py") >= F.col("y0"))
        & (F.col("py") < F.col("y1"))
    )
    return (
        pts.join(F.broadcast(box_cells), ["gy", "gx"])
        .groupBy("box_id", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(contained.cast("int")).cast("bigint").alias("n_contained"),
        )
    )


# ---------------------------------------------------------------------------
# r_geo_distance — the FLOAT member of the geo family (rows-only)

# fixed hub set (well-known city coordinates, micro-degree-exact
# literals so both the Spark plan and the numpy pin share them)
GEO_HUBS: tuple[tuple[str, float, float], ...] = (
    ("london", 51.507400, -0.127800),
    ("new_york", 40.712800, -74.006000),
    ("tokyo", 35.689500, 139.691700),
    ("sydney", -33.868800, 151.209300),
    ("sao_paulo", -23.550500, -46.633300),
    ("johannesburg", -26.204100, 28.047300),
)

R_EARTH_M = 6_371_000.0  # mean Earth radius (the ClickHouse constant)


@register("r_geo_distance", oracle=None)
def r_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) nearest-hub rollup — the ClickHouse
    ``greatCircleDistance`` family member this module's header excludes
    from the hash-oracle surface (libm trig is not correctly rounded,
    so no bit-exact cross-engine contract can hold; VERDICT r12 ask
    #4). Registered ROWS-ONLY on the l_pagerank pattern: the driver
    checks shape, and tests/test_geo_distance.py pins every value to
    an independent numpy haversine within stated bounds.

    Per event: distance from the hash-derived point to each of the
    {len(GEO_HUBS)} fixed hubs (2R·asin(√(sin²(Δφ/2) +
    cosφ₁cosφ₂sin²(Δλ/2))), R = 6371 km), nearest hub wins (ties →
    lowest hub id via the struct ordering). Distances quantize to
    INTEGER meters per row before any aggregation, so the per-hub
    rollup (count / min / max / exact BIGINT sum) is shuffle-order-
    independent — the only float steps are row-local trig, which is
    exactly the part the tolerance contract covers.

    Scale shape: the hub table is a plan literal (array of structs —
    nothing to broadcast), the trig is whole-stage-codegen JVM math
    (no Python), and the rollup is ONE map-side-combined aggregation
    to {len(GEO_HUBS)} rows. One corpus scan, one shuffle of
    {len(GEO_HUBS)}-key partials."""
    import math

    ev = load_table(spark, sf_dir, "events")
    la = F.radians(_lat_col().cast("double") / F.lit(1_000_000.0))
    lo = F.radians(_lon_col().cast("double") / F.lit(1_000_000.0))
    pts = ev.select(la.alias("la"), lo.alias("lo"))
    cands = F.array(
        *[
            F.struct(
                (
                    F.lit(2.0 * R_EARTH_M)
                    * F.asin(
                        F.sqrt(
                            F.pow(F.sin((F.col("la") - F.lit(math.radians(hlat))) / 2), 2)
                            + F.cos(F.col("la"))
                            * F.lit(math.cos(math.radians(hlat)))
                            * F.pow(
                                F.sin((F.col("lo") - F.lit(math.radians(hlon))) / 2), 2
                            )
                        )
                    )
                ).alias("d"),
                F.lit(i).alias("hub"),
            )
            for i, (_name, hlat, hlon) in enumerate(GEO_HUBS)
        ]
    )
    best = pts.select(F.array_min(cands).alias("b"))
    names = F.array(*[F.lit(name) for name, _la, _lo in GEO_HUBS])
    quant = best.select(
        F.col("b.hub").alias("hub_id"),
        F.floor(F.col("b.d") + F.lit(0.5)).cast("bigint").alias("dm"),
    )
    return (
        quant.groupBy("hub_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("dm").alias("min_m"),
            F.max("dm").alias("max_m"),
            F.sum("dm").alias("sum_m"),
        )
        .select(
            F.element_at(names, F.col("hub_id") + 1).alias("hub"),
            "n",
            "min_m",
            "max_m",
            "sum_m",
            F.round(F.col("sum_m") / F.col("n") / 1000.0, 3).alias("mean_km"),
        )
        .orderBy("hub")
    )
