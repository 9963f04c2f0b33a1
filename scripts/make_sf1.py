"""Materialize the sf1 (10x) spot-check corpus used by BASELINE.md.

Replicates the sf0.1 ``documents`` and ``embeddings`` tables 10x into
/tmp/opr_sf1 (wiped on reboot — rerun before any sf1 measurement):

- each document copy gets a per-copy BIJECTIVE word transform: every
  NON-stopword word is suffixed ``qz<i>`` (the ``qz`` bigram and
  digits never occur in the corpus vocabulary — asserted below — so
  the map is collision-free within and across copies), while words in
  any language's stopword list pass through UNCHANGED.  Within-copy
  duplicate/near-dup structure is preserved exactly (word-level
  bijection ⇒ shingle-level bijection); the language-ID stopword
  ratios and the quality score survive per copy (the r7..r10 ``_c<i>``
  suffix zeroed stopword hits AND counted ``_`` as punctuation, so
  ``curate_corpus``'s gates emptied at sf1/sf10); cross-copy overlap
  is bounded by all-stopword shingles (measured ≤ 8.3 % of any doc's
  shingles at sf0.1 — below every near-dup threshold) and cross-copy
  EXACT duplicates are impossible (no document is all-stopwords,
  asserted below) — pairwise workloads still scale exactly 10x;
- each embedding copy is rotated by a per-copy random ORTHOGONAL
  matrix (copy 0 keeps the identity, so the source rows appear
  verbatim).  Rotation preserves every WITHIN-copy inner product /
  cosine / Euclidean distance (up to float32 rounding), so per-copy
  distance structure is exact, while CROSS-copy dot products are
  decorrelated — without it all copies of a vector share every
  hyperplane sign and collapse into the SAME LSH bucket, so bucket
  populations scale ×copies instead of linearly (the r11 sf100 find:
  emb_neardup_pairs' pre-kernel group-sort spilled to death at ×1000;
  the j2 coordinate-stacking artifact in embedding clothing).
  Consumer audit (what the rotation changes at scale): exact-verified
  pair VALUES within a copy are preserved; LSH bucket assignments and
  hence candidate RECALL are re-drawn per copy (the kernels'
  recall-floor invariants still hold — recall is hash-marginal, not
  per-draw); emb_semdedup/kmeans cluster shapes change because copies
  stop being exact duplicates (more realistic, still seed-pinned);
  ``vec_id`` offsets by copy*N keep ids unique;
- ``customer`` / ``orders`` / ``lineitem`` replicate with consistent
  key offsets (c_custkey, o_orderkey/o_custkey, l_orderkey) so each
  copy is join-closed — the r7 spot-check of the non-dedup heavies
  (m9 changelog fold, g9 pagerank, history_report) needs them.
  l_suppkey/l_partkey are NOT offset: suppliers/parts are shared
  dimensions, so the pagerank graph gets 10× edges over the same
  supplier set (denser, the harder direction) rather than 10 islands.

Usage: python scripts/make_sf1.py [src_sf_dir] [dest_dir] [n_copies]

``n_copies`` defaults to 10 (one decade).  The r10 second-decade
spot-check uses ``make_sf1.py /root/testdata/sf0.1 /tmp/opr_sf10 100``
— the per-copy word suffix stays bijective at any copy count, so the
scaling properties above hold decade over decade.
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openplacereviews_db_spark.operators.textstats import STOPWORDS  # noqa: E402


#: planted near-dup fraction per copy (c >= 1): 1% of each copy's rows
#: are re-emitted as ANGULAR PERTURBATIONS of a disjoint 1% partner set
#: at exactly cos = PLANT_COS — real near-duplicate structure in the
#: production-threshold regime (r11 verdict item 3: the isotropic
#: corpus has zero structure above cos 0.7, so a cos>=0.9 dedup pass
#: had nothing measurable to find; a real pipeline dedups at ~0.9+).
#: Planted pairs per copy = floor(n_vecs/100); copy 0 stays verbatim,
#: so a corpus of C copies contains exactly (C-1)*floor(n/100) pairs
#: with cos >= 0.9 (the random tail at 0.9 in d=64 is ~0: measured 0
#: source pairs above 0.7) — countable, linear in C, decade over
#: decade.
PLANT_FRAC = 0.01
PLANT_COS = 0.95


def _write_rotated_embeddings(src: str, dest: Path, n_copies: int,
                              n_vecs: int) -> None:
    """Replicate embeddings with a per-copy random orthogonal rotation
    and planted near-dup structure.

    Copy 0 is the identity (source rows verbatim); copy c>0 multiplies
    every vector by Q_c from a seeded QR of a Gaussian matrix
    (sign-fixed so Q is the unique QR factor), then REPLACES a seeded
    1% of its rows with perturbed partners: row t_i's vector becomes
    ``|v_s| * (PLANT_COS * u + sqrt(1-PLANT_COS^2) * w)`` where u is
    partner row s_i's unit vector and w a seeded unit vector orthogonal
    to u — cos(t_i, s_i) = PLANT_COS exactly in float64 (~1e-7 off in
    float32).  Targets and partners are disjoint and partners are used
    once, so the planted pairs are exactly {(t_i, s_i)} with no
    transitive chains.  Written incrementally, one copy per row group,
    so sf100 (2M × 64 floats) never holds more than one copy in flight
    beyond the float64 source matrix.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src_tbl = pq.read_table(f"{src}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    vec_ids = src_tbl.column("vec_id").to_numpy()
    labels = src_tbl.column("label").to_numpy()
    emb = np.array(src_tbl.column("embedding").to_pylist(),
                   dtype=np.float64)
    d = emb.shape[1]
    n_plant = int(len(emb) * PLANT_FRAC)
    schema = pa.schema([
        pa.field("vec_id", pa.int64()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("label", pa.int32()),
    ])
    with pq.ParquetWriter(str(dest / "embeddings.parquet"),
                          schema) as writer:
        for c in range(n_copies):
            if c == 0:
                rot = emb
            else:
                rng = np.random.default_rng(9_000_000 + c)
                q, r = np.linalg.qr(rng.standard_normal((d, d)))
                q *= np.sign(np.diag(r))  # unique factor, det-stable
                rot = emb @ q.T
                if n_plant:
                    # disjoint target/partner index sets, partners
                    # used once each -> exactly n_plant planted pairs
                    pick = rng.choice(len(emb), size=2 * n_plant,
                                      replace=False)
                    targets, partners = pick[:n_plant], pick[n_plant:]
                    v = rot[partners]
                    norm = np.linalg.norm(v, axis=1, keepdims=True)
                    u = v / norm
                    w = rng.standard_normal((n_plant, d))
                    w -= (w * u).sum(axis=1, keepdims=True) * u
                    w /= np.linalg.norm(w, axis=1, keepdims=True)
                    rot[targets] = norm * (
                        PLANT_COS * u
                        + np.sqrt(1.0 - PLANT_COS ** 2) * w)
            flat = rot.astype(np.float32).reshape(-1)
            arr = pa.ListArray.from_arrays(
                pa.array(np.arange(len(emb) + 1) * d, type=pa.int32()),
                pa.array(flat, type=pa.float32()))
            writer.write_table(pa.table({
                "vec_id": pa.array(vec_ids + c * n_vecs, type=pa.int64()),
                "embedding": arr,
                "label": pa.array(labels, type=pa.int32()),
            }, schema=schema))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--only-embeddings"]
    only_embeddings = "--only-embeddings" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dest = Path(args[1] if len(args) > 1 else "/tmp/opr_sf1")
    n_copies = int(args[2]) if len(args) > 2 else 10
    dest.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    if only_embeddings:
        # regenerate just the embedding corpus in place (generator
        # change, e.g. the r12 planted near-dups) without re-copying
        # the 15 GB relational tables
        n_vecs = con.execute(
            f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'"
        ).fetchone()[0]
        _write_rotated_embeddings(src, dest, n_copies, n_vecs)
        n = con.execute(
            f"SELECT count(*) FROM '{dest}/embeddings.parquet'").fetchone()
        print("embeddings", n[0], "rows ->", dest / "embeddings.parquet")
        return
    # stream the big COPYs: with insertion order preserved DuckDB
    # buffers the whole replicated result before flushing — the sf100
    # lineitem (600M rows) held >100 GB RSS and OOM'd the box.  Row
    # order in these parquet files carries no semantics (the engine
    # treats tables as unordered; every consumer tie-breaks).
    con.execute("SET preserve_insertion_order=false")
    n_docs = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]
    n_vecs = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    copies = ", ".join(str(c) for c in range(n_copies))
    # bijectivity + gate-survival preconditions (see module docstring)
    stoplist = ", ".join(
        f"'{w}'" for w in sorted({w for ws in STOPWORDS.values() for w in ws}))
    n_marker, n_allstop = con.execute(f"""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM '{src}/documents.parquet'),
        per_doc AS (
            SELECT doc_id,
                   count(*) FILTER (w ~ '.*(qz|[0-9]).*') AS marked,
                   count(*) FILTER (w <> ''
                       AND lower(w) NOT IN ({stoplist})) AS non_stop
            FROM w GROUP BY doc_id)
        SELECT sum(marked), count(*) FILTER (non_stop = 0) FROM per_doc
    """).fetchone()
    assert not n_marker, f"{n_marker} source words contain 'qz' or digits"
    assert not n_allstop, f"{n_allstop} all-stopword docs (cross-copy dups)"
    con.execute(f"""
        COPY (
            SELECT doc_id + c * {n_docs} AS doc_id,
                   array_to_string(list_transform(
                       string_split(text, ' '),
                       w -> CASE WHEN w = '' OR lower(w) IN ({stoplist})
                                 THEN w
                                 ELSE w || 'qz' || c END), ' ') AS text,
                   lang, source, n_chars
            FROM '{src}/documents.parquet',
                 unnest([{copies}]) AS t(c)
        ) TO '{dest}/documents.parquet' (FORMAT PARQUET)
    """)
    _write_rotated_embeddings(src, dest, n_copies, n_vecs)
    n_cust = con.execute(
        f"SELECT max(c_custkey) + 1 FROM '{src}/customer.parquet'").fetchone()[0]
    n_ord = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
    con.execute(f"""
        COPY (
            SELECT c_custkey + c * {n_cust} AS c_custkey,
                   * EXCLUDE (c_custkey)
            FROM '{src}/customer.parquet', unnest([{copies}]) AS t(c)
        ) TO '{dest}/customer.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT o_orderkey + c * {n_ord} AS o_orderkey,
                   o_custkey + c * {n_cust} AS o_custkey,
                   * EXCLUDE (o_orderkey, o_custkey)
            FROM '{src}/orders.parquet', unnest([{copies}]) AS t(c)
        ) TO '{dest}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT l_orderkey + c * {n_ord} AS l_orderkey,
                   * EXCLUDE (l_orderkey)
            FROM '{src}/lineitem.parquet', unnest([{copies}]) AS t(c)
        ) TO '{dest}/lineitem.parquet' (FORMAT PARQUET)
    """)
    n_user = con.execute(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
    n_evt = con.execute(
        f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
    # Align the per-copy event-id offset to the j2/g11 synthetic grid's
    # 100k-id longitude-box blocks (plans/relational.py): each copy
    # lands in its own spatial box, so proximity workloads scale
    # LINEARLY with copies instead of densifying one box quadratically
    # (the r10 sf10 artifact: 2.5B stacked-copy pairs).  100000 ≡ 0
    # (mod 2000) also keeps every copy's relative grid geometry
    # identical to the source's.
    n_evt = max(n_evt, 100_000)
    # events keep their timestamps: 10x rows over the SAME day span is
    # the scale direction partitioned layouts face (fatter partitions,
    # same partition count), and user offsets keep each copy
    # join/session-closed for the per-user window workloads.
    con.execute(f"""
        COPY (
            SELECT event_id + c * {n_evt} AS event_id,
                   user_id + c * {n_user} AS user_id,
                   * EXCLUDE (event_id, user_id)
            FROM '{src}/events.parquet', unnest([{copies}]) AS t(c)
        ) TO '{dest}/events.parquet' (FORMAT PARQUET)
    """)
    for t in ("documents", "embeddings", "customer", "orders",
              "lineitem", "events"):
        n = con.execute(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()
        print(t, n[0], "rows ->", dest / f"{t}.parquet")


if __name__ == "__main__":
    main()
