"""The reference's public geo report queries over the place corpus.

Spark-first re-expressions of the three GeoJSON endpoints registered in
``OpenPlaceReviewsDbBoot.java:122-127`` (SURVEY.md §3):

- ``geo``    (§3.1): tile index scan S8 + live filter P1 + feature
  projection P3 (``BaseOprPlaceDataProvider.java:202-301``);
- ``geoall`` (A1): keys-only scan S7 → 4-char area counts with OLC
  cell centers (``OprSummaryPlaceDataProvider.java:26-59``);
- main-element selection P2 over the real nested document
  (``MergeUtil.java:209-229``).

All three run on the deterministic synthetic corpus
(`sources.places.synthetic_places`) whose flat mirror is a DuckDB CTE —
so each plan is value-hash-checked against an oracle, OLC tiles
included.

Scale notes: the corpus is blocked by ``tile_id``; `geo` is a
partition-pruned scan (tile prefix), `geoall` a single partial-agg
shuffle on the 4-char prefix.  Nothing here shuffles the nested
payload — projections happen before the exchange.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from ..sources import places as P

#: the geo report's demo tile prefix: the 2-char OLC area of customer 42
#: (deterministic; computed with the same closed form as the corpus)
GEO_AREA_PREFIX = geo.olc_encode_py(
    P.synthetic_lat_py(42), P.synthetic_lon_py(42), 2)


def geo_tile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geo` endpoint (§3.1): live places of one OLC area, projected to
    feature properties.

    The tile filter hits the corpus' blocking key, so at scale this is a
    partition-pruned scan (S8) — no shuffle at all; the projection (P3)
    runs entirely map-side, including the nested main-element selection.
    """
    pl = P.synthetic_places(spark, sf_dir)
    live_refs = F.filter(F.col("source.osm"), lambda x: x["deleted"].isNull())
    return (
        pl.where(F.col("tile_id").startswith(GEO_AREA_PREFIX))
        .where(F.col("deleted").isNull())  # P1 live filter
        .withColumn("main", F.element_at(live_refs, 1))
        .select(
            F.concat_ws(",", "tile_id", "suffix").alias("opr_id"),
            F.col("main.lat").alias("lat"),
            F.col("main.lon").alias("lon"),
            F.col("main.id").alias("main_osm_id"),
            F.col("main.tags")["name"].alias("title"),
            F.col("placetype").alias("place_type"),
            F.size("source.osm").cast("int").alias("n_sources"),
        )
    )


def geoall_area_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geoall` (A1): count of live places per 4-char OLC area + decoded
    area centers.  Keys-only scan (S7): only tile_id/deleted are read —
    column pruning reaches the parquet scan."""
    pl = P.synthetic_places(spark, sf_dir).select("tile_id", "deleted")
    area = F.substring("tile_id", 1, 4)
    clat, clon = geo.olc_decode_center(F.col("area"), 4)
    return (
        pl.where(F.col("deleted").isNull())
        .select(area.alias("area"))
        .groupBy("area")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("area", "cnt", clat.alias("center_lat"), clon.alias("center_lon"))
    )


def p2_main_osm_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 over the real nested document: first non-deleted source.osm
    element, falling back to the first element (MergeUtil.java:209-229)."""
    pl = P.synthetic_places(spark, sf_dir)
    live_refs = F.filter(F.col("source.osm"), lambda x: x["deleted"].isNull())
    main = F.coalesce(F.try_element_at(live_refs, F.lit(1)),
                      F.try_element_at(F.col("source.osm"), F.lit(1)))
    return pl.select(
        F.concat_ws(",", "tile_id", "suffix").alias("opr_id"),
        main["id"].alias("main_osm_id"),
        main["version"].alias("main_version"),
        F.size("source.osm").cast("int").alias("n_sources"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "geo_tile_report": geo_tile_report,
    "geoall_area_summary": geoall_area_summary,
    "p2_main_osm_element": p2_main_osm_element,
}

_DECODE_LAT4, _DECODE_LON4 = geo.olc_decode_center_sql("area", 4)

ORACLES: dict[str, str] = {
    "geo_tile_report": f"""
        WITH {P.places_sql_cte()}
        SELECT tile_id || ',' || suffix AS opr_id,
               lat, lon,
               main_osm_id,
               name AS title,
               placetype AS place_type,
               n_osm AS n_sources
        FROM places
        WHERE tile_id LIKE '{GEO_AREA_PREFIX}%' AND deleted IS NULL
    """,
    "geoall_area_summary": f"""
        WITH {P.places_sql_cte()},
        areas AS (
            SELECT substr(tile_id, 1, 4) AS area, COUNT(*) AS cnt
            FROM places WHERE deleted IS NULL GROUP BY 1
        )
        SELECT area, cnt, {_DECODE_LAT4} AS center_lat,
               {_DECODE_LON4} AS center_lon
        FROM areas
    """,
    "p2_main_osm_element": f"""
        WITH {P.places_sql_cte()}
        SELECT tile_id || ',' || suffix AS opr_id,
               main_osm_id,
               version AS main_version,
               n_osm AS n_sources
        FROM places
    """,
}
