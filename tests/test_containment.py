"""X50 prefix-filter containment join: completeness on crafted cases
the banded-MinHash operators would miss (small doc inside big doc),
plus the short-document fallback path."""

from __future__ import annotations

from openplacereviews_db_spark.operators.dedup import containment_pairs


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {(r["id_a"], r["id_b"]): (r["n_a"], r["containment"])
            for r in containment_pairs(df, **kw).collect()}


def test_small_in_big_is_found(spark):
    """A 12-word doc fully inside a 60-word doc: Jaccard is ~0.17 (all
    symmetric dedup misses it at usual thresholds) but containment is
    1.0 — and prefix filtering must find it despite the size skew."""
    small = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    big = small + " " + " ".join(f"w{i}" for i in range(48))
    got = _pairs(spark, [(1, small), (2, big), (3, "totally unrelated words here")])
    assert (1, 2) in got
    n_a, c = got[(1, 2)]
    assert n_a == 10 and c == 1.0  # 12 words -> 10 distinct 3-shingles
    assert (2, 1) not in got       # big is NOT contained in small
    assert not any(3 in p for p in got)


def test_threshold_boundary_integer_exact(spark):
    """Exactly at tau: 4 of 5 shingles shared -> containment 0.8 kept;
    3 of 5 -> dropped.  The integer threshold (5*|∩| >= 4*n) must not
    wobble on the float grid."""
    # 7 words -> 5 distinct 3-shingles; b shares the first 6 words
    # (4 shingles), c shares the first 5 words (3 shingles)
    a = "w1 w2 w3 w4 w5 w6 w7"
    b = "w1 w2 w3 w4 w5 w6 x1 x2 x3 x4"
    c = "w1 w2 w3 w4 w5 y1 y2 y3 y4 y5"
    got = _pairs(spark, [(1, a), (2, b), (3, c)])
    assert got[(1, 2)] == (5, 0.8)
    assert (1, 3) not in got


def test_stage_dir_path_is_value_identical(spark, sf_dir, tmp_path):
    """The at-scale stage_dir variant (rank frame staged to parquet so
    upstream shuffles can be freed between phases) must emit the exact
    pair set and values of the default persist path."""
    from openplacereviews_db_spark.plans.corpus import _docs

    docs = _docs(spark, sf_dir)
    base = {(r["id_a"], r["id_b"]): (r["n_a"], r["containment"])
            for r in containment_pairs(docs, shingle_words=3,
                                       tau_num=4, tau_den=5).collect()}
    staged = {(r["id_a"], r["id_b"]): (r["n_a"], r["containment"])
              for r in containment_pairs(
                  docs, shingle_words=3, tau_num=4, tau_den=5,
                  stage_dir=str(tmp_path / "rank")).collect()}
    assert base == staged and len(base) > 0


def test_short_doc_fallback(spark):
    """Docs under the shingle size collapse to one whole-text shingle
    (exploded_shingles semantics): identical short docs contain each
    other; distinct ones don't."""
    got = _pairs(spark, [(1, "hi there"), (2, "hi there"), (3, "bye now")])
    assert got[(1, 2)] == (1, 1.0) and got[(2, 1)] == (1, 1.0)
    assert not any(3 in p for p in got)
