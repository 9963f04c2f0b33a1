"""OSM XML as a registered Spark DATA SOURCE (S1 connector surface).

The same streaming pull parser as ``sources/osm_xml.py`` exposed
through PySpark 4's Python DataSource API, so OSM files read like any
first-class format::

    spark.dataSource.register(OsmXmlDataSource)
    spark.read.format("osmxml").load("/path/*.osm")

One ``InputPartition`` per file (the reference's per-extract layout,
``OsmParser.java:71-159``), gzip handled transparently, rows streamed
from ``iter_osm_stream`` so a partition's memory stays bounded by the
parse batch regardless of file size.

Positioning: this is the CONNECTOR surface — discovery, schema,
partition planning, option passing.  The row hand-off crosses the
Python data-source bridge tuple-at-a-time, so for hot-path bulk parses
the Arrow-batched ``osm_xml.read_osm_xml`` (binaryFile + mapInPandas)
remains the performance route; both share ``iter_osm_stream``, so the
parse semantics cannot drift apart (``s19_osm_datasource`` pins the
connector against the same oracle as the mapInPandas path's s1).
"""

from __future__ import annotations

import glob
import gzip
from collections.abc import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from .osm_xml import ENTITY_DDL, _COLS, iter_osm_stream


class OsmXmlDataSource(DataSource):
    """``format("osmxml")`` — OSM full-dump / Overpass-diff XML."""

    @classmethod
    def name(cls) -> str:
        return "osmxml"

    def schema(self) -> str:
        return ENTITY_DDL

    def reader(self, schema) -> "OsmXmlReader":
        return OsmXmlReader(self.options)


class OsmXmlReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("osmxml source requires a path")
        self._path = path

    def partitions(self) -> list[InputPartition]:
        files = sorted(glob.glob(self._path)) or [self._path]
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        path = partition.value
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as fh:
            for batch in iter_osm_stream(fh):
                for row in batch:
                    row["src_file"] = path
                    yield tuple(
                        [tuple(m.values()) if isinstance(m, dict) else m
                         for m in row[c]] if c == "members" else row[c]
                        for c in _COLS)


def register(spark) -> None:
    """Idempotently register the ``osmxml`` format on this session."""
    try:
        spark.dataSource.register(OsmXmlDataSource)
    except Exception:
        pass  # already registered on this session
