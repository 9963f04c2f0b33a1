"""openplacereviews_db_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of OpenPlaceReviews/openplacereviews-db.

The reference (Java/Spring, `/root/reference/`) is a place database with
GeoJSON report endpoints, OSM-sync / merge / dedup batch bots, and a
blockchain-style operation changelog.  This package re-expresses each of
those capabilities Spark-first:

- ``session``   : SparkSession factory tuned for large-scale batch analytics
- ``schemas``   : StructTypes for the place / operation / OSM-entity model
- ``functions`` : scalar function library (geo, text-similarity, hashing)
- ``operators`` : dedup, similarity-search, text-analysis, changelog-apply,
                  merge-cascade, proximity clustering
- ``sources``   : parquet testdata loaders, OSM XML parser, GeoJSON reader
- ``plans``     : end-to-end query programs (the reference's endpoints and
                  bots re-expressed as DataFrame programs)
- ``streaming`` : Structured Streaming ingest skeleton

All logic is declared with the DataFrame/SQL API so Catalyst can optimize
(predicate pushdown, column pruning, AQE); Python UDFs appear only where
built-ins genuinely can't express the semantics (OpenLocationCode codec,
greedy clustering).
"""

__version__ = "0.1.0"
