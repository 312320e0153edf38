"""Geospatial operators: haversine distance and a grid-bucketed
radius join — the scale-safe core under the Maps-tool adapters
(sources/geo_source), and the standard nearest-store / within-R
analytics pass over geocoded tables.

Scale design (same pattern as the binned range join, joins.py):

- ``haversine_km`` is pure JVM trig columns — whole-stage codegen.
- A naive within-R join is a cross join. ``radius_join`` instead
  assigns every row to a lat/lon grid cell sized so that any pair
  within ``radius_km`` is at most one cell apart, replicates the
  LEFT side to its 3×3 cell neighborhood (constant ×9 — never
  data-dependent), equi-joins on cell id (hash join, co-partitioned
  shuffle), and applies the EXACT haversine predicate as the residual
  filter. Result is exactly the within-R pair set; the grid only
  bounds the candidate set.
- Longitude cells shrink with cos(latitude); the cell width uses the
  worst (highest) latitude the data is declared to span
  (``max_abs_lat``), so the neighborhood guarantee holds everywhere
  in range. Poleward of ~80° the cells degenerate — callers with
  polar data should band by latitude first (documented limit, not a
  silent wrong answer: inputs beyond ``max_abs_lat`` are rejected).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 111.0  # conservative (actual 110.57-111.70)


def haversine_km(lat1: Column, lon1: Column, lat2: Column,
                 lon2: Column) -> Column:
    """Great-circle distance in km (haversine form — numerically
    stable for small angles, the standard published formula)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlam = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlam) * F.sin(dlam)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    right_lat_col: str | None = None,
    right_lon_col: str | None = None,
    max_abs_lat: float = 66.0,
    dist_col: str = "dist_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — exact, via the
    grid-bucket candidate join described in the module docstring.

    Output: all left columns + all right columns + ``dist_col``.
    Column names must not collide (alias before joining). The caller
    declares the latitude span via ``max_abs_lat``; data beyond it
    voids the 3×3 neighborhood guarantee (band polar data first).
    """
    if radius_km <= 0:
        raise ValueError("radius_km must be positive")
    if not (0 < max_abs_lat < 80):
        raise ValueError("max_abs_lat must be in (0, 80)")
    rlat = right_lat_col or lat_col
    rlon = right_lon_col or lon_col

    # lat: central angle >= latitude difference on a sphere, so
    # |dlat_deg| <= R / (pi*Re/180) = R/111.195; 111.0 leaves slack.
    cell_lat = radius_km / KM_PER_DEG_LAT
    # lon: the EXACT spherical bound. From haversine with both points
    # at |lat| = L: dist = 2*Re*asin(cos L * sin(dlon/2)), so
    # dlon_max = 2*asin(sin(R/(2*Re)) / cos L). The linear
    # R/(111*cos L) approximation undershoots this by up to ~0.7% at
    # large R (asin convexity) — enough to push boundary pairs two
    # cells apart. The 1.001 factor absorbs float noise on top.
    sin_half = math.sin(radius_km / (2 * EARTH_RADIUS_KM)) / math.cos(
        math.radians(max_abs_lat)
    )
    if sin_half >= 1.0:
        cell_lon = 360.0  # any longitude separation is reachable
    else:
        cell_lon = math.degrees(2 * math.asin(sin_half)) * 1.001
    # longitude cells form a MODULAR RING so pairs across the
    # antimeridian (lon 179 vs -179) land in neighboring cells —
    # haversine is wrap-correct, the grid must be too. Ring width is
    # 360/n >= cell_lon; array_distinct dedupes neighbor cells when
    # the ring is tiny (huge radius), so no pair is emitted twice.
    n_lon = max(1, int(360.0 // cell_lon))
    lon_width = 360.0 / n_lon

    def lat_cell(lat):
        return F.floor(lat / F.lit(cell_lat)).cast("long")

    def lon_cell(lon):
        return F.pmod(
            F.floor((lon + 180.0) / F.lit(lon_width)).cast("long"),
            F.lit(n_lon),
        )

    glon = lon_cell(F.col(lon_col))
    lf = (
        left.withColumn("_glat", lat_cell(F.col(lat_col)))
        .withColumn("_glon", glon)
        .withColumn("_dlat", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_cell_lat", F.col("_glat") + F.col("_dlat"))
        .withColumn(
            "_cell_lon",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.pmod(F.col("_glon") - 1, F.lit(n_lon)),
                        F.col("_glon"),
                        F.pmod(F.col("_glon") + 1, F.lit(n_lon)),
                    )
                )
            ),
        )
        .drop("_glat", "_glon", "_dlat")
    )
    rf = (
        right.withColumn("_cell_lat", lat_cell(F.col(rlat)))
        .withColumn("_cell_lon", lon_cell(F.col(rlon)))
    )

    dist = haversine_km(F.col(lat_col), F.col(lon_col), F.col(rlat),
                        F.col(rlon))
    joined = (
        lf.join(rf, ["_cell_lat", "_cell_lon"])
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= radius_km)
        .drop("_cell_lat", "_cell_lon")
    )
    return joined
