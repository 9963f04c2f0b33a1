"""TripAdvisor stars/reviews enrichment emission (operator M10).

Reference: ``TripAdvisorBot.java`` — the bot scans every ``opr.place``
object carrying a ``source.tripAdvisor`` list (:57-59), derives the
fetch URL ``https://www.tripadvisor.com/<id[0]>-<id[1]>`` per entry
(:64-65), and emits one edit op per place setting
``source.tripAdvisor[i].stars`` / ``.reviews`` through the dotted-path
grammar, recording the previous values in the op's ``current`` map when
the entry already had them ("oldValue.size() > 1", :97-116).  The
reference's HTTP fetch is dead code ("TODO load from tripadvisor",
:70-72); this operator replaces it with a DETERMINISTIC rating function
of the tripadvisor id itself — the numeric detail-code ``d`` yields
``stars = (d % 9 + 1) / 2`` and ``reviews = d % 500 + 1`` — so the
emission dataflow (the part the reference actually declares) is real
and oracle-checkable while the network call stays out of engine scope
(same stance as S16).

The change/current maps are serialized with TreeMap key order
(:98-105 uses ``TreeMap``), i.e. lexicographically sorted paths —
which for this op is simply index order with ``reviews`` before
``stars``.  Paths follow the repo's ``parse_path``/``format_path``
grammar (`operators/changelog.py:83-130`); the per-index path strings
are generated through :func:`~..operators.changelog.format_path` at
plan-build time and the roundtrip is pinned in
``tests/test_tripadvisor.py``.

Scale shape: a pure per-row projection over the place corpus — the
per-entry loop (:62-74) becomes ``transform`` over the nested array,
entirely inside whole-stage codegen.  Zero shuffles, zero Python; at
100 TB this is a partition-local map over the tile-partitioned corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .changelog import format_path

#: TripAdvisorBot.java:22
URL_PREFIX = "https://www.tripadvisor.com/"


def _path(i_col: Column, leaf: str) -> Column:
    """``source.tripAdvisor[<i>].<leaf>`` with the index spliced into the
    format_path-generated template (the grammar quotes nothing here —
    asserted by the parse_path roundtrip test)."""
    head, tail = format_path(["source", "tripAdvisor", 0, leaf]).split("[0]")
    return F.concat(F.lit(head + "["), i_col.cast("string"),
                    F.lit("]" + tail))


def tripadvisor_enrich_ops(places: DataFrame) -> DataFrame:
    """Emit one enrichment edit op per place with tripadvisor sources.

    Output (all scalar — driver-canonicalizer-safe):
    ``opr_id``, ``n_trip`` (entry count), ``fetch_urls`` (comma-joined
    per-entry URLs — the bot's :64-65 dataflow), ``change_json`` (the
    TreeMap-ordered ``{path: {"set": v}}`` map), ``current_json`` (old
    stars/reviews for entries that had them, ``{}`` otherwise).
    """
    trips = F.col("source.tripAdvisor")

    def d_code(x: Column) -> Column:
        # numeric part of the detail-code id segment ("d123" -> 123)
        return F.substring(F.element_at(x["id"], 2), 2, 19).cast("long")

    def chg_frag(x: Column, i: Column) -> Column:
        d = d_code(x)
        stars = ((d % 9 + 1).cast("double") / 2.0).cast("string")
        reviews = (d % 500 + 1).cast("string")
        return F.concat(
            F.lit('"'), _path(i, "reviews"), F.lit('":{"set":'), reviews,
            F.lit('},"'), _path(i, "stars"), F.lit('":{"set":'), stars,
            F.lit("}"))

    def cur_frag(x: Column, i: Column) -> Column:
        return F.when(
            x["stars"].isNotNull(),
            F.concat(F.lit('"'), _path(i, "reviews"), F.lit('":'),
                     x["reviews"].cast("string"),
                     F.lit(',"'), _path(i, "stars"), F.lit('":'),
                     x["stars"].cast("string")))

    def url(x: Column) -> Column:
        return F.concat(F.lit(URL_PREFIX), F.element_at(x["id"], 1),
                        F.lit("-"), F.element_at(x["id"], 2))

    return (
        places.where(trips.isNotNull())
        .select(
            F.concat_ws(",", "tile_id", "suffix").alias("opr_id"),
            F.size(trips).cast("int").alias("n_trip"),
            F.array_join(F.transform(trips, url), ",").alias("fetch_urls"),
            F.concat(F.lit("{"),
                     F.array_join(F.transform(trips, chg_frag), ","),
                     F.lit("}")).alias("change_json"),
            F.concat(F.lit("{"),
                     F.array_join(F.filter(F.transform(trips, cur_frag),
                                           lambda c: c.isNotNull()), ","),
                     F.lit("}")).alias("current_json"),
        ))
