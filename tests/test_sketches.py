"""Sketch invariants beyond oracle parity: the estimates must actually
estimate (error bounds), and Count-Min must never underestimate."""

from __future__ import annotations

from openplacereviews_db_spark.operators import sketches
from openplacereviews_db_spark.sources.testdata import load_table


def test_kmv_exact_below_k(spark):
    """Groups with < k distinct values are exact by construction."""
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i) for i in range(50)],
        "grp string, v long")
    out = {r["grp"]: r for r in
           sketches.kmv_distinct(df, "grp", "v", k=64).collect()}
    assert out["a"]["n_exact"] == 7 and out["a"]["n_est"] == 7.0
    assert out["b"]["n_exact"] == 50 and out["b"]["n_est"] == 50.0


def test_kmv_estimate_error_bound(spark):
    """KMV relative standard error is ~1/sqrt(k-2); at k=64 that is
    ~12.7%, so 3 sigma = ~38%. Assert a loose 40% band on real data."""
    li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
    for r in sketches.kmv_distinct(li, "l_returnflag", "l_partkey",
                                   k=64).collect():
        if r["n_exact"] >= 64:
            rel = abs(r["n_est"] - r["n_exact"]) / r["n_exact"]
            assert rel < 0.40, (r["grp"], r["n_exact"], r["n_est"])


def test_countmin_never_underestimates(spark):
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    rows = sketches.countmin_freq(ev, "user_id", depth=4, width=128).collect()
    assert rows and all(r["n_est"] >= r["n_exact"] for r in rows)
    # with 150 keys in 4x128 cells, collisions should be rare enough
    # that most estimates are exact
    exact = sum(1 for r in rows if r["n_est"] == r["n_exact"])
    assert exact >= 0.5 * len(rows), (exact, len(rows))


def test_countmin_grid_is_bounded(spark):
    """The sketch build must aggregate to <= depth*width cells — the
    whole point of the operator at scale."""
    from pyspark.sql import functions as F
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    key = F.col("user_id")
    cells = ev.select(F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 sketches._cm_col(key, j, 128).alias("c"))
        for j in range(4)])).alias("rc"))
    grid = cells.groupBy("rc.j", "rc.c").count()
    assert grid.count() <= 4 * 128


def test_hll_estimate_error_bound(spark):
    """HLL relative standard error is ~1.04/sqrt(m); at m=512 that is
    ~4.6%, so 3 sigma = ~14%. Assert a loose 20% band on real data for
    groups big enough to be in the raw-estimate regime (the deliberate
    no-linear-counting design documented on the operator)."""
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    rows = sketches.hll_distinct(ev, "event_type", "user_id").collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_buckets"] <= sketches.HLL_M
        if r["n_exact"] >= 2.5 * sketches.HLL_M:
            rel = abs(r["n_est"] - r["n_exact"]) / r["n_exact"]
            assert rel < 0.20, dict(r.asDict())


def test_hll_registers_bounded(spark):
    """The register frame must collapse to <= m rows per group — the
    fixed-size-aggregate property that makes HLL the 100 TB answer."""
    from pyspark.sql import functions as F
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    out = sketches.hll_distinct(ev, "event_type", "user_id")
    n_types = ev.select("event_type").distinct().count()
    assert out.count() == n_types
    assert out.agg(F.max("n_buckets")).first()[0] <= sketches.HLL_M


def test_bottomk_quantile_accuracy(spark):
    """The 256-row hash sample's median must track the exact median —
    loose 25% relative band (binomial quantile error at k=256 is ~6%
    at 3 sigma; the band leaves room for small groups)."""
    c = load_table(spark, "customer", "/root/testdata/sf0.001")
    for r in sketches.bottomk_quantile(
            c, "c_mktsegment", "c_custkey", "c_acctbal").collect():
        denom = max(abs(r["p_exact"]), 1.0)
        assert abs(r["p_est"] - r["p_exact"]) / denom < 0.25, dict(r.asDict())


def test_kmv_setops_exact_below_k(spark):
    """A union smaller than k makes BOTH estimates exact by
    construction (the sketch IS the union)."""
    a = spark.createDataFrame([(i,) for i in range(20)], "v long")
    b = spark.createDataFrame([(i,) for i in range(10, 40)], "v long")
    r = sketches.kmv_setops(a, b, "v", k=64).first()
    assert r["n_union_exact"] == 40 and r["n_inter_exact"] == 10
    assert r["union_est"] == 40.0 and r["inter_est"] == 10.0


def test_kmv_setops_estimate_bands(spark):
    """Above k the union estimate keeps KMV's ~1/sqrt(k-2) error and
    the intersection estimate adds binomial sampling noise on the
    match fraction — assert loose 3-sigma-ish bands on synthetic sets
    with a known 1/3 overlap."""
    n = 3000
    a = spark.createDataFrame([(i,) for i in range(2 * n)], "v long")
    b = spark.createDataFrame([(i,) for i in range(n, 3 * n)], "v long")
    r = sketches.kmv_setops(a, b, "v", k=64).first()
    assert r["n_union_exact"] == 3 * n and r["n_inter_exact"] == n
    assert abs(r["union_est"] - 3 * n) / (3 * n) < 0.40
    assert abs(r["inter_est"] - n) / n < 0.75


def test_hll_merge_equals_direct_build(spark):
    """Slicing the input by day and max-merging the per-slice register
    sets must reproduce the direct build EXACTLY (registers, bucket
    counts, estimates) — HLL insertion is idempotent and merge is
    register-wise max."""
    from pyspark.sql import functions as F

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    day = (F.expr("unix_timestamp(ts) div 86400") * 86400)
    direct = {r["grp"]: (r["n_exact"], r["n_buckets"], r["n_est"])
              for r in sketches.hll_distinct(
                  ev, "event_type", "user_id").collect()}
    merged = {r["grp"]: (r["n_exact"], r["n_buckets"], r["n_est"])
              for r in sketches.hll_merge_rollup(
                  ev, "event_type", day, "user_id").collect()}
    assert direct == merged and len(direct) > 0


def test_heavy_hitters_bigrams_survive_empty_docs(spark, tmp_path):
    """A doc whose text splits to zero words must not crash the bigram
    slice (slice length -1 is a Spark runtime error) — the plan filters
    size(ws) >= 1, which is exact because such docs contribute no
    bigrams anyway."""
    import os

    from openplacereviews_db_spark.plans.sketches import sk_heavy_hitters

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b a b a b a b"), (4, "solo")],
        "doc_id long, text string")
    sf_dir = str(tmp_path)
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r["key"]: r["n_exact"]
           for r in sk_heavy_hitters(spark, sf_dir).collect()}
    # 4 rows -> threshold ceil-ish of 4/750 admits every bigram; the
    # empty and whitespace-only docs contribute nothing, "solo" has no
    # bigram, "a b" repeats
    assert got["a b"] == 4 and got["b a"] == 3
