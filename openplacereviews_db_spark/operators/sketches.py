"""Deterministic streaming sketches: KMV distinct-count and Count-Min
frequency estimation.

Sketches are the 100 TB answer to "how many distinct / how often"
questions where exact aggregation is a full shuffle of the key space:
the sketch is a fixed-size aggregate that partial-aggregates map-side
and merges associatively, so the wide exchange carries kilobytes per
partition regardless of input size.  Spark ships HyperLogLog
(``approx_count_distinct``) but its estimate is not reproducible
outside the JVM; these two are built from md5 column arithmetic, so a
SQL engine reproduces them bit-for-bit — the "novel sketch as a
composition of built-in ops" pattern (SURVEY.md §2.4), and the same
md5-family discipline as ``functions.hashing``.

- ``kmv_distinct``: k-minimum-values [Bar-Yossef et al. 2002].  Hash
  every distinct value to a uniform fraction in [0, 1); the k-th
  smallest hash h_k estimates the distinct count as (k-1)/h_k.  Groups
  with fewer than k distinct values are exact by construction (the
  sketch IS the value set).
- ``countmin_freq``: Count-Min [Cormode & Muthukrishnan 2005]: depth×
  width counter grid, each key incrementing one counter per row via an
  independent hash; the frequency estimate is the min over the key's
  depth counters (always an overestimate).

The 52-bit hash fraction uses the first 13 hex digits of md5 so the
numerator is exact in a double on every engine (2^52 < 2^53).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 2^52 — denominator of the md5-prefix hash fraction.
HASH_DENOM = 4503599627370496


def hash_frac(value: Column) -> Column:
    """Uniform fraction in [0, 1) from the first 52 bits of md5(value) —
    exact in a double, and byte-identical to the SQL mirror."""
    return (F.conv(F.substring(F.md5(value.cast("string")), 1, 13), 16, 10)
            .cast("bigint") / F.lit(HASH_DENOM))


def hash_frac_sql(value: str) -> str:
    """DuckDB mirror of :func:`hash_frac` (no BLOB→BIGINT cast there —
    go through a '0x' hex literal)."""
    return ("CAST(('0x' || substr(md5(CAST(" + value + " AS VARCHAR)), "
            f"1, 13)) AS BIGINT) / {HASH_DENOM}.0")


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values,
    next to the exact count for calibration: ``(grp, n_exact, n_est)``.

    Plan: ONE distinct shuffle on (group, value) feeds both the exact
    count and the sketch; the k smallest fractions per group come from a
    rank window over the distinct values (at 100 TB the window input is
    already distinct-reduced, and the per-group state Spark keeps is one
    running rank — not a sort buffer of the whole group).  Ties are
    impossible below 2^-52 collision odds, but the rank orders by
    (frac, value) anyway — a tie must not pick a shuffle-dependent row.
    """
    grp = F.col(group_col)
    distinct = (df.select(grp.alias("grp"),
                          F.col(value_col).alias("v")).distinct()
                .withColumn("frac", hash_frac(F.col("v"))))
    rk = F.row_number().over(
        Window.partitionBy("grp").orderBy("frac", "v"))
    ranked = distinct.withColumn("rk", rk)
    return (
        ranked.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_exact"),
             F.max(F.when(F.col("rk") == k, F.col("frac"))).alias("_hk"))
        .select(
            "grp", "n_exact",
            F.round(
                F.when(F.col("_hk").isNull(),
                       F.col("n_exact").cast("double"))
                .otherwise(F.lit(k - 1) / F.col("_hk")), 4).alias("n_est"),
        )
    )


def kmv_distinct_sql(table: str, group_col: str, value_col: str,
                     k: int = 64) -> str:
    """DuckDB oracle for :func:`kmv_distinct` — same ranks, same
    arithmetic, same rounding."""
    frac = hash_frac_sql("v")
    return f"""
        WITH distinct_vals AS (
            SELECT DISTINCT {group_col} AS grp, {value_col} AS v
            FROM {table}
        ), ranked AS (
            SELECT grp, v, {frac} AS frac,
                   row_number() OVER (PARTITION BY grp
                                      ORDER BY {frac}, v) AS rk
            FROM distinct_vals
        )
        SELECT grp, COUNT(*) AS n_exact,
               round(CASE WHEN MAX(CASE WHEN rk = {k} THEN frac END)
                              IS NULL
                          THEN CAST(COUNT(*) AS DOUBLE)
                          ELSE {k - 1} / MAX(CASE WHEN rk = {k}
                                             THEN frac END)
                     END, 4) AS n_est
        FROM ranked GROUP BY grp
    """


def bottomk_quantile(df: DataFrame, group_col: str, key_col: str,
                     value_col: str, k: int = 256,
                     q: float = 0.5) -> DataFrame:
    """Per-group quantile estimate from a deterministic fixed-SIZE
    sample — the k rows whose key hashes smallest — next to the exact
    quantile: ``(grp, p_exact, p_est)``.

    The md5-bottom-k sample is the reproducible replacement for
    ``TABLESAMPLE``/reservoirs at 100 TB: the same k rows come back on
    every run and on every engine, the sample size is fixed per group
    regardless of group skew (unlike the fixed-RATE
    ``tx_stratified_sample``), and it's mergeable — the bottom-k of a
    union is the bottom-k of the parts.  Quantile interpolation is the
    exact ``percentile`` == ``quantile_cont`` parity w3 already pins.

    Plan: one shuffle on the group key serves the rank window, the
    sample aggregate, and the exact aggregate.
    """
    grp = F.col(group_col)
    hashed = df.select(
        grp.alias("grp"), F.col(key_col).alias("key"),
        F.col(value_col).alias("val"),
    ).withColumn("frac", hash_frac(F.col("key")))
    rk = F.row_number().over(
        Window.partitionBy("grp").orderBy("frac", "key"))
    ranked = hashed.withColumn("rk", rk)
    return (
        ranked.groupBy("grp")
        .agg(
            F.round(F.percentile("val", F.lit(q)), 4).alias("p_exact"),
            F.round(F.percentile(F.when(F.col("rk") <= k, F.col("val")),
                                 F.lit(q)), 4).alias("p_est"),
        )
    )


def bottomk_quantile_sql(table: str, group_col: str, key_col: str,
                         value_col: str, k: int = 256,
                         q: float = 0.5) -> str:
    """DuckDB oracle for :func:`bottomk_quantile`."""
    frac = hash_frac_sql(key_col)
    return f"""
        WITH ranked AS (
            SELECT {group_col} AS grp, {value_col} AS val,
                   row_number() OVER (PARTITION BY {group_col}
                                      ORDER BY {frac}, {key_col}) AS rk
            FROM {table}
        )
        SELECT grp,
               round(quantile_cont(val, {q}), 4) AS p_exact,
               round(quantile_cont(CASE WHEN rk <= {k} THEN val END,
                                   {q}), 4) AS p_est
        FROM ranked GROUP BY grp
    """


def kmv_setops(df_a: DataFrame, df_b: DataFrame, value_col: str,
               k: int = 64) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches [Dasgupta et
    al. 2016]: distinct-count estimates for the union AND intersection
    of two sets from one k-minimum-values sample of their union, next
    to the exact counts — one row ``(n_a_exact, n_b_exact,
    n_union_exact, n_inter_exact, union_est, inter_est)``.

    The union sketch's k smallest hashes form a uniform sample of the
    union, so the fraction of them belonging to BOTH sets estimates the
    Jaccard similarity, and ``inter_est = n_match/k * union_est``.
    When the union has fewer than k distinct values the sketch IS the
    union and both estimates are exact by construction.

    This is what sketch-partitioned 100 TB rollups need: per-partition
    KMV sketches merge by keeping the k smallest of a union, so
    "distinct users in segment A AND segment B" never re-scans the
    fact table.  The k-smallest selection is ``ORDER BY .. LIMIT k`` —
    Spark plans TakeOrderedAndProject (per-partition top-k, then a
    k-row merge on one task), NOT a global sort and NOT a
    single-partition window.
    """
    a = (df_a.select(F.col(value_col).alias("v")).distinct()
         .withColumn("in_a", F.lit(1)))
    b = (df_b.select(F.col(value_col).alias("v")).distinct()
         .withColumn("in_b", F.lit(1)))
    merged = (a.join(b, on="v", how="full")
              .select("v", F.coalesce("in_a", F.lit(0)).alias("in_a"),
                      F.coalesce("in_b", F.lit(0)).alias("in_b"))
              .withColumn("frac", hash_frac(F.col("v"))))
    exact = merged.agg(
        F.sum("in_a").alias("n_a_exact"),
        F.sum("in_b").alias("n_b_exact"),
        F.count(F.lit(1)).alias("n_union_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter_exact"))
    sk = (merged.orderBy("frac", "v").limit(k)
          .agg(F.count(F.lit(1)).alias("n_sk"),
               F.max("frac").alias("h_k"),
               F.sum(F.col("in_a") * F.col("in_b")).alias("n_match")))
    full_sketch = F.col("n_sk") < k
    raw_union = F.lit(k - 1) / F.col("h_k")
    return exact.crossJoin(sk).select(
        "n_a_exact", "n_b_exact", "n_union_exact", "n_inter_exact",
        F.round(F.when(full_sketch,
                       F.col("n_union_exact").cast("double"))
                .otherwise(raw_union), 4).alias("union_est"),
        F.round(F.when(full_sketch,
                       F.col("n_inter_exact").cast("double"))
                .otherwise(F.col("n_match") * raw_union / F.lit(k)),
                4).alias("inter_est"),
    )


def kmv_setops_sql(table_a: str, table_b: str, value_col: str,
                   k: int = 64) -> str:
    """DuckDB oracle for :func:`kmv_setops` — same ranks, textually
    identical estimate arithmetic (``n_match * ((k-1)/h_k) / k``);
    DuckDB SUM(INTEGER) is HUGEINT, so every sum casts back."""
    frac = hash_frac_sql("v")
    return f"""
        WITH a AS (SELECT DISTINCT {value_col} AS v, 1 AS in_a
                   FROM {table_a}),
        b AS (SELECT DISTINCT {value_col} AS v, 1 AS in_b
              FROM {table_b}),
        merged AS (
            SELECT COALESCE(a.v, b.v) AS v,
                   COALESCE(in_a, 0) AS in_a, COALESCE(in_b, 0) AS in_b
            FROM a FULL OUTER JOIN b ON a.v = b.v
        ), withfrac AS (
            SELECT v, in_a, in_b, {frac} AS frac FROM merged
        ), exact AS (
            SELECT CAST(SUM(in_a) AS BIGINT) AS n_a_exact,
                   CAST(SUM(in_b) AS BIGINT) AS n_b_exact,
                   COUNT(*) AS n_union_exact,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter_exact
            FROM withfrac
        ), topk AS (
            SELECT * FROM withfrac ORDER BY frac, v LIMIT {k}
        ), sk AS (
            SELECT COUNT(*) AS n_sk, MAX(frac) AS h_k,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS n_match
            FROM topk
        )
        SELECT n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
               round(CASE WHEN n_sk < {k}
                          THEN CAST(n_union_exact AS DOUBLE)
                          ELSE {k - 1} / h_k END, 4) AS union_est,
               round(CASE WHEN n_sk < {k}
                          THEN CAST(n_inter_exact AS DOUBLE)
                          ELSE n_match * ({k - 1} / h_k) / {k} END,
                     4) AS inter_est
        FROM exact, sk
    """


#: HyperLogLog geometry: p=9 bucket bits -> m=512 registers; the
#: remaining 43 of the 52 md5 bits feed the leading-zero scan, so
#: register values live in [1, 44] (44 = all-zero remainder).
HLL_P = 9
HLL_M = 1 << HLL_P
HLL_RHO_MAX = 52 - HLL_P + 1
#: alpha_m * m^2 * 2^44 — numerator of the raw estimate, precomputed in
#: one place so Spark and the SQL mirror share the identical double.
HLL_EST_NUM = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(2 ** 44)


def hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate [Flajolet et al.
    2007] next to the exact count: ``(grp, n_exact, n_buckets, n_est)``.

    Spark's own ``approx_count_distinct`` is HLL++ but its estimate is
    JVM-private; this build is pure column arithmetic, so a SQL engine
    reproduces it bit-for-bit — every step is INTEGER-exact:

    - 52-bit hash h from the first 13 hex digits of md5 (exact in a
      BIGINT), bucket = low 9 bits, remainder = high 43 bits;
    - rho = 44 - bitlen(remainder), with bitlen taken as the LENGTH of
      the base-2 string of the remainder (``conv``/``bin``) — no
      floating log2, whose floor is an off-by-one landmine at exact
      powers of two;
    - registers sum as ``2^(44-rho)`` BIGINTs (the 2^44-scaled harmonic
      denominator; max 512 * 2^44 = 2^53, in-range), empty registers
      contributing 2^44 each;
    - the only float op is the final NUM / sum division, one IEEE
      divide on both engines, rounded to 4 places (same discipline as
      :func:`kmv_distinct`).

    The raw-estimate regime (no linear-counting small-range correction)
    is used deliberately: the correction needs ``ln``, whose last-ulp
    behaviour is libm-specific — a cross-engine hash hazard.  The
    exact count and non-empty-register count sit alongside so accuracy
    is auditable.

    Plan: two stacked partial-aggregating shuffles — (grp, bucket)
    max-rho+count, then per-grp fold — so the wide exchange carries at
    most m=512 rows per group regardless of input size; the per-bucket
    counts also yield the exact distinct count without a second scan.
    """
    distinct = (df.select(F.col(group_col).alias("grp"),
                          F.col(value_col).alias("v")).distinct())
    bucket, rho = _hll_cols()
    bucketed = distinct.select(
        "grp", bucket.alias("bucket"), rho.alias("rho"))
    regs = (bucketed.groupBy("grp", "bucket")
            .agg(F.count(F.lit(1)).alias("n_v"),
                 F.max("rho").alias("rho_max")))
    scaled = F.expr(
        f"shiftleft(cast(1 as bigint), cast({HLL_RHO_MAX} - rho_max as int))")
    return (
        regs.groupBy("grp")
        .agg(F.sum("n_v").alias("n_exact"),
             F.count(F.lit(1)).alias("n_buckets"),
             F.sum(scaled).alias("_sum_present"))
        .select(
            "grp", "n_exact", "n_buckets",
            F.round(
                F.lit(HLL_EST_NUM)
                / (F.col("_sum_present")
                   + (F.lit(HLL_M) - F.col("n_buckets"))
                   * F.lit(1 << (HLL_RHO_MAX - 1))), 4).alias("n_est"),
        )
    )


def hll_merge_rollup(df: DataFrame, group_col: str, slice_col: Column,
                     value_col: str) -> DataFrame:
    """:func:`hll_distinct` computed the way a 100 TB rollup actually
    runs: per-(group, SLICE) register sets built independently (the
    per-day sketches a streaming ingest maintains), then max-MERGED
    across slices into the group estimate.  Returns the identical
    columns ``(grp, n_exact, n_buckets, n_est)`` — and because HLL
    insertion is idempotent and merge is register-wise max, the merged
    registers equal the direct build's exactly, so the DIRECT oracle
    (:func:`hll_distinct_sql`) doubles as the mergeability proof: hash
    equality certifies that slicing the input never changes the
    estimate.

    Plan: the per-slice sketch is a (grp, slice, bucket) partial agg,
    the merge is a (grp, bucket) max — both map-side-combining, each
    carrying ≤ m rows per (group, slice) / group.  The exact count
    rides a separate distinct branch joined back on the (small) group
    key.
    """
    distinct = (df.select(F.col(group_col).alias("grp"),
                          slice_col.alias("slc"),
                          F.col(value_col).alias("v")).distinct())
    bucket, rho = _hll_cols()
    bucketed = distinct.select(
        "grp", "slc", bucket.alias("bucket"), rho.alias("rho"))
    slice_regs = (bucketed.groupBy("grp", "slc", "bucket")
                  .agg(F.max("rho").alias("rho_slice")))
    merged = (slice_regs.groupBy("grp", "bucket")
              .agg(F.max("rho_slice").alias("rho_max")))
    exact = (df.select(F.col(group_col).alias("grp"),
                       F.col(value_col).alias("v")).distinct()
             .groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact")))
    return (exact.join(hll_finalize(merged), on="grp")
            .select("grp", "n_exact", "n_buckets", "n_est"))


def _hll_cols() -> tuple:
    """(bucket, rho) column expressions over an input column ``v`` —
    the single source of the hash decomposition shared by every HLL
    build (batch, rollup, streaming)."""
    h = (F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 13),
                16, 10).cast("bigint"))
    rem = F.shiftright(h, HLL_P)
    bucket = F.pmod(h, F.lit(HLL_M))
    rho = (F.lit(HLL_RHO_MAX) - F.when(rem == 0, F.lit(0)).otherwise(
        F.length(F.conv(rem.cast("string"), 10, 2))))
    return bucket, rho


def hll_bucket_rho(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """``(grp, bucket, rho)`` rows of :func:`hll_distinct`'s hash
    decomposition — the insert-side primitive shared by the batch
    builds and the streaming register maintenance."""
    distinct = (df.select(F.col(group_col).alias("grp"),
                          F.col(value_col).alias("v")).distinct())
    bucket, rho = _hll_cols()
    return distinct.select(
        "grp", bucket.alias("bucket"), rho.alias("rho"))


def hll_finalize(regs: DataFrame) -> DataFrame:
    """Fold a ``(grp, bucket, rho_max)`` register frame into
    ``(grp, n_buckets, n_est)`` — the estimate arithmetic of
    :func:`hll_distinct`, shared by the streaming path (which has no
    exact count: ids are not retained, only registers)."""
    scaled = F.expr(
        f"shiftleft(cast(1 as bigint), cast({HLL_RHO_MAX} - rho_max as int))")
    return (regs.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 F.sum(scaled).alias("_sum_present"))
            .select(
                "grp", "n_buckets",
                F.round(
                    F.lit(HLL_EST_NUM)
                    / (F.col("_sum_present")
                       + (F.lit(HLL_M) - F.col("n_buckets"))
                       * F.lit(1 << (HLL_RHO_MAX - 1))), 4)
                .alias("n_est")))


def hll_distinct_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB oracle for :func:`hll_distinct` — same hash, same base-2
    bitlen, same scaled-integer register sum, same single divide.
    DuckDB ``SUM(BIGINT)`` is HUGEINT, so sums cast back to BIGINT."""
    empty_w = 1 << (HLL_RHO_MAX - 1)
    return f"""
        WITH distinct_vals AS (
            SELECT DISTINCT {group_col} AS grp, {value_col} AS v
            FROM {table}
        ), hashed AS (
            SELECT grp,
                   CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 13))
                        AS BIGINT) AS h
            FROM distinct_vals
        ), bucketed AS (
            SELECT grp, h % {HLL_M} AS bucket,
                   {HLL_RHO_MAX} - CASE WHEN h // {HLL_M} = 0 THEN 0
                        ELSE length(bin(h // {HLL_M})) END AS rho
            FROM hashed
        ), regs AS (
            SELECT grp, bucket, COUNT(*) AS n_v, MAX(rho) AS rho_max
            FROM bucketed GROUP BY grp, bucket
        )
        SELECT grp,
               CAST(SUM(n_v) AS BIGINT) AS n_exact,
               COUNT(*) AS n_buckets,
               round({HLL_EST_NUM!r} /
                     (CAST(SUM(CAST(1 AS BIGINT) <<
                                ({HLL_RHO_MAX} - rho_max)) AS BIGINT)
                      + ({HLL_M} - COUNT(*)) * {empty_w}), 4) AS n_est
        FROM regs GROUP BY grp
    """


def _cm_col(key: Column, row: int, width: int) -> Column:
    """Counter column of ``key`` in sketch row ``row`` — an independent
    md5 hash per row via a seed prefix, reduced mod width."""
    h = (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"cm{row}|"), key.cast("string"))),
        1, 13), 16, 10).cast("bigint"))
    return F.pmod(h, F.lit(width))


def _cm_col_sql(key: str, row: int, width: int) -> str:
    return (f"CAST(('0x' || substr(md5('cm{row}|' || "
            f"CAST({key} AS VARCHAR)), 1, 13)) AS BIGINT) % {width}")


def countmin_freq(df: DataFrame, key_col: str, depth: int = 4,
                  width: int = 128) -> DataFrame:
    """Per-key frequency estimate from a depth×width Count-Min grid,
    next to the exact count: ``(key, n_exact, n_est)`` with
    ``n_est >= n_exact`` always.

    Plan: the grid build explodes each input row into ``depth``
    (row, col) increments and aggregates — a constant-factor
    amplification into a bounded ``depth*width``-cell aggregate that
    partial-aggregates map-side, so the shuffle moves at most
    ``depth*width`` rows per partition no matter the input size.  The
    probe side joins each distinct key's ``depth`` cells against the
    grid (broadcast — the grid is fixed-size by construction) and takes
    the min.
    """
    key = F.col(key_col)
    cells = df.select(
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     _cm_col(key, j, width).alias("c"))
            for j in range(depth)])).alias("rc"))
    grid = (cells.groupBy(F.col("rc.j").alias("j"),
                          F.col("rc.c").alias("c"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    probes = (df.groupBy(key.alias("key"))
              .agg(F.count(F.lit(1)).alias("n_exact")))
    probe_cells = probes.select(
        "key", "n_exact",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     _cm_col(F.col("key"), j, width).alias("c"))
            for j in range(depth)])).alias("rc"),
    ).select("key", "n_exact", F.col("rc.j").alias("j"),
             F.col("rc.c").alias("c"))
    return (
        probe_cells.join(F.broadcast(grid), on=["j", "c"])
        .groupBy("key", "n_exact")
        .agg(F.min("cnt").alias("n_est"))
        .select("key", "n_exact", "n_est")
    )


def countmin_freq_sql(table: str, key_col: str, depth: int = 4,
                      width: int = 128) -> str:
    """DuckDB oracle for :func:`countmin_freq`."""
    cell_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {_cm_col_sql(key_col, j, width)} AS c "
        f"FROM {table}" for j in range(depth))
    probe_rows = " UNION ALL ".join(
        f"SELECT key, n_exact, {j} AS j, {_cm_col_sql('key', j, width)} AS c"
        f" FROM probes" for j in range(depth))
    return f"""
        WITH cells AS ({cell_rows}),
        grid AS (
            SELECT j, c, COUNT(*) AS cnt FROM cells GROUP BY j, c
        ), probes AS (
            SELECT {key_col} AS key, COUNT(*) AS n_exact
            FROM {table} GROUP BY {key_col}
        ), probe_cells AS ({probe_rows})
        SELECT p.key, p.n_exact, MIN(g.cnt) AS n_est
        FROM probe_cells p JOIN grid g USING (j, c)
        GROUP BY p.key, p.n_exact
    """


def heavy_hitters(tokens: DataFrame, denom: int = 200, depth: int = 4,
                  width: int = 1024) -> DataFrame:
    """Sketch-gated heavy hitters: find every key with frequency >=
    total/denom by (1) building a Count-Min grid, (2) keeping only the
    keys whose ESTIMATE clears the threshold — CMS never underestimates,
    so this candidate set provably contains every true heavy hitter —
    and (3) exact-counting ONLY the candidate-filtered token stream.
    Output ``(key, n_exact, n_est)`` with ``n_exact >= thr`` exact.

    This is the two-phase shape that matters at 100 TB: the exact
    aggregation (the expensive vocabulary-wide shuffle) runs over the
    candidate subset the fixed-size sketch admitted, not the full key
    space — the CMS overestimate only ever lets extra candidates
    through (they fall to the final exact filter), never drops one.
    ``tokens`` must expose one ``key`` row per occurrence.

    The threshold is integer arithmetic (``total div denom``) from a
    1-row total aggregate (bounded broadcast, the tx_mix_weights
    pattern); the whole candidate logic reproduces in SQL.
    """
    total = tokens.agg(F.count(F.lit(1)).alias("n_total")).select(
        F.expr(f"n_total div {denom}").alias("thr"))
    key = F.col("key")
    cells = tokens.select(
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     _cm_col(key, j, width).alias("c"))
            for j in range(depth)])).alias("rc"))
    grid = (cells.groupBy(F.col("rc.j").alias("j"),
                          F.col("rc.c").alias("c"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    vocab = tokens.select("key").distinct()
    probe_cells = vocab.select(
        "key",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     _cm_col(key, j, width).alias("c"))
            for j in range(depth)])).alias("rc"),
    ).select("key", F.col("rc.j").alias("j"), F.col("rc.c").alias("c"))
    est = (probe_cells.join(F.broadcast(grid), on=["j", "c"])
           .groupBy("key").agg(F.min("cnt").alias("n_est")))
    cand = (est.crossJoin(F.broadcast(total))
            .where(F.col("n_est") >= F.col("thr")))
    exact = (tokens.join(F.broadcast(cand), on="key")
             .groupBy("key", "n_est", "thr")
             .agg(F.count(F.lit(1)).alias("n_exact")))
    return (exact.where(F.col("n_exact") >= F.col("thr"))
            .select("key", "n_exact", "n_est"))


def heavy_hitters_sql(tokens_cte: str, denom: int = 200, depth: int = 4,
                      width: int = 1024) -> str:
    """DuckDB oracle for :func:`heavy_hitters` — ``tokens_cte`` is a
    complete CTE body yielding one ``key`` per occurrence; the same
    grid, the same min-over-cells estimate, the same integer
    threshold."""
    cell_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {_cm_col_sql('key', j, width)} AS c "
        f"FROM toks" for j in range(depth))
    probe_rows = " UNION ALL ".join(
        f"SELECT key, {j} AS j, {_cm_col_sql('key', j, width)} AS c "
        f"FROM vocab" for j in range(depth))
    return f"""
        WITH toks AS ({tokens_cte}),
        tot AS (SELECT COUNT(*) // {denom} AS thr FROM toks),
        cells AS ({cell_rows}),
        grid AS (SELECT j, c, COUNT(*) AS cnt FROM cells GROUP BY j, c),
        vocab AS (SELECT DISTINCT key FROM toks),
        probe_cells AS ({probe_rows}),
        est AS (
            SELECT p.key, MIN(g.cnt) AS n_est
            FROM probe_cells p JOIN grid g USING (j, c) GROUP BY p.key
        ),
        cand AS (SELECT key, n_est FROM est, tot WHERE n_est >= thr),
        exact AS (
            SELECT t.key, c.n_est, COUNT(*) AS n_exact
            FROM toks t JOIN cand c USING (key)
            GROUP BY t.key, c.n_est
        )
        SELECT key, n_exact, CAST(n_est AS BIGINT) AS n_est
        FROM exact, tot WHERE n_exact >= thr
    """


def bottomk_quantile_rollup(df: DataFrame, group_col: str,
                            slice_col: Column, key_col: str,
                            value_col: str, k: int = 256,
                            q: float = 0.5) -> DataFrame:
    """:func:`bottomk_quantile` computed the rollup way: per-(group,
    SLICE) bottom-k samples taken independently, unioned, and re-ranked
    into the group's bottom-k — the bottom-k of a union IS the bottom-k
    of the parts' bottom-ks, so the DIRECT oracle
    (:func:`bottomk_quantile_sql`) doubles as the mergeability proof
    (the sk_hll_rollup pattern, for the sampling sketch).

    The exact quantile still reads every row (it must); only the
    sample path goes through the slice-and-merge. Plan: slice ranks
    partition on (grp, slc) — strictly more parallel than the direct
    build — then the survivors (≤ k per slice) re-rank per group.
    """
    grp = F.col(group_col)
    hashed = df.select(
        grp.alias("grp"), slice_col.alias("slc"),
        F.col(key_col).alias("key"), F.col(value_col).alias("val"),
    ).withColumn("frac", hash_frac(F.col("key")))
    slice_rk = F.row_number().over(
        Window.partitionBy("grp", "slc").orderBy("frac", "key"))
    survivors = (hashed.withColumn("srk", slice_rk)
                 .where(F.col("srk") <= k))
    merge_rk = F.row_number().over(
        Window.partitionBy("grp").orderBy("frac", "key"))
    merged = survivors.withColumn("rk", merge_rk)
    exact = hashed.groupBy("grp").agg(
        F.round(F.percentile("val", F.lit(q)), 4).alias("p_exact"))
    est = merged.groupBy("grp").agg(
        F.round(F.percentile(F.when(F.col("rk") <= k, F.col("val")),
                             F.lit(q)), 4).alias("p_est"))
    return exact.join(est, on="grp").select("grp", "p_exact", "p_est")
