"""Sources: testdata (driver parquet), places (synthetic nested corpus
with SQL mirrors), osm_xml (streaming XML pull-parser)."""
