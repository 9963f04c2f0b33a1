"""X51 duplicate-span detection and X52 integer-exact k-means: golden
semantics the oracle-parity hash can't articulate (span maximality /
merging rules; Lloyd convergence to true nearest centroids)."""

from __future__ import annotations

from openplacereviews_db_spark.operators.dedup import duplicate_spans
from openplacereviews_db_spark.operators.kmeans import (kmeans_assign,
                                                        quantize)


def _spans(spark, rows, span_words=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_words"])
        for r in duplicate_spans(df, span_words=span_words).collect())


def test_repeated_phrase_marks_both_occurrences(spark):
    """A 3-gram repeated across two docs marks the window in each; the
    unique remainder stays unmarked."""
    got = _spans(spark, [
        (1, "the quick brown fox jumps over"),
        (2, "lazily the quick brown cat sits"),
    ])
    # "the quick brown" is words 0-2 in doc 1 and words 1-3 in doc 2
    assert got == [(1, 0, 2, 3), (2, 1, 3, 3)]


def test_overlapping_windows_merge_into_one_maximal_span(spark):
    """Two docs sharing a 5-word run produce THREE duplicated 3-gram
    windows each (starts 0,1,2) that must merge into one maximal span,
    not three rows."""
    shared = "alpha bravo charlie delta echo"
    got = _spans(spark, [
        (1, shared + " unique1 tail1 words1"),
        (2, shared + " other2 stuff2 here2"),
    ])
    assert got == [(1, 0, 4, 5), (2, 0, 4, 5)]


def test_same_doc_internal_repeat_counts(spark):
    """Corpus-wide count includes repeats WITHIN one document, and a
    gap longer than span_words splits the islands."""
    got = _spans(spark, [
        (7, "x y z aaa bbb ccc ddd eee fff x y z"),
    ])
    # "x y z" at starts 0 and 9; gap of 9 > 3 keeps them separate spans
    assert got == [(7, 0, 2, 3), (7, 9, 11, 3)]


def test_short_docs_emit_nothing(spark):
    assert _spans(spark, [(1, "a b"), (2, "a b")], span_words=3) == []


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separable_clusters_converge(spark):
    """Two tight blobs, seeds k=2 (= first two ids, one per blob):
    every point lands with its blob and d2 is the exact quantized
    distance to the final integer centroid."""
    blob_a = [[0.10 + 0.01 * i, 0.20] for i in range(4)]
    blob_b = [[-0.30, -0.40 - 0.01 * i] for i in range(4)]
    # interleave so seed ids 0,1 fall one in each blob
    vecs = [blob_a[0], blob_b[0], blob_a[1], blob_b[1],
            blob_a[2], blob_b[2], blob_a[3], blob_b[3]]
    out = {r["vec_id"]: (r["cluster"], r["d2"])
           for r in kmeans_assign(_emb(spark, vecs), k=2, iters=2).collect()}
    assert len(out) == 8
    assert {out[i][0] for i in (0, 2, 4, 6)} == {0}
    assert {out[i][0] for i in (1, 3, 5, 7)} == {1}


def test_kmeans_assignment_is_true_argmin(spark, sf_dir):
    """Every vector's (cluster, d2) is the exact argmin over the final
    centroids, recomputed independently in Python from the same
    quantization + truncating-integer-mean rules."""
    from openplacereviews_db_spark.sources.testdata import load_table

    emb = load_table(spark, "embeddings", sf_dir).limit(120)
    out = kmeans_assign(emb, k=4, iters=2)
    rows = {r["vec_id"]: (r["cluster"], r["d2"]) for r in out.collect()}
    q = {r["id"]: r["qv"] for r in quantize(emb).collect()}
    assert set(rows) == set(q)

    # replay: seeds = 4 smallest ids; one assign+update round; then the
    # returned assignment is against the round-1 centroids
    def assign(cents):
        a = {}
        for vid, qv in q.items():
            best = min((sum((a_ - b) ** 2 for a_, b in zip(qv, cv)), cid)
                       for cid, cv in cents.items())
            a[vid] = best
        return a

    cents = {i: q[i] for i in sorted(q)[:4]}
    a1 = assign(cents)
    upd: dict[int, list[int]] = {}
    members: dict[int, list[int]] = {}
    for vid, (_, cid) in a1.items():
        members.setdefault(cid, []).append(vid)
    for cid, vids in members.items():
        dims = len(q[vids[0]])
        upd[cid] = [
            int(sum(q[v][d] for v in vids)) // len(vids)
            if sum(q[v][d] for v in vids) >= 0
            else -((-sum(q[v][d] for v in vids)) // len(vids))
            for d in range(dims)
        ]
    a2 = assign(upd)
    got = {vid: (cid, d2) for vid, (d2, cid) in a2.items()}
    assert rows == got


def _brute_spans(docs, L):
    """Pure-Python reference for duplicate_spans: same normalization
    (lowercase, whitespace-collapse), corpus-wide window counts, island
    merge with gap > L."""
    words = {d: t.lower().split() for d, t in docs}
    wins = {}
    for d, ws in words.items():
        for s in range(len(ws) - L + 1):
            wins.setdefault(" ".join(ws[s:s + L]), []).append((d, s))
    dup = [occ for occs in wins.values() if len(occs) >= 2 for occ in occs]
    per_doc = {}
    for d, s in dup:
        per_doc.setdefault(d, set()).add(s)
    out = []
    for d, starts in per_doc.items():
        run = []
        for s in sorted(starts):
            if run and s - run[-1] <= L:
                run.append(s)
            else:
                if run:
                    out.append((d, run[0], run[-1] + L - 1,
                                run[-1] + L - run[0]))
                run = [s]
        out.append((d, run[0], run[-1] + L - 1, run[-1] + L - run[0]))
    return sorted(out)


def test_dup_spans_random_corpora_match_brute_force(spark):
    """Differential vs a brute-force reference on random small-alphabet
    corpora (tiny vocab forces heavy window collisions — the regime
    where island merging and corpus-wide counting can go wrong).
    Deterministic seeds; one Spark run per corpus."""
    import random

    L = 3
    for seed in (7, 41, 1234):
        rng = random.Random(seed)
        docs = [(d, " ".join(rng.choice("abcde")
                             for _ in range(rng.randint(0, 25))))
                for d in range(30)]
        got = _spans(spark, docs, span_words=L)
        assert got == _brute_spans(docs, L), f"seed {seed}"


def test_span_apply_random_corpora_match_brute_force(spark):
    """X57 differential: span-removal apply vs a brute-force Python
    reference on the same collision-heavy corpora as the detection
    test.  Also pins the global first-occurrence rule: rank by
    (doc_id, start) per window text, remove covered positions of every
    rank>=2 occurrence."""
    import random

    from openplacereviews_db_spark.operators.dedup import apply_span_dedup

    L = 3

    def brute_apply(docs):
        words = {d: t.lower().split() for d, t in docs}
        occs = {}
        for d, ws in sorted(words.items()):
            for s in range(len(ws) - L + 1):
                occs.setdefault(" ".join(ws[s:s + L]), []).append((d, s))
        cov = {}
        for occ in occs.values():
            for d, s in sorted(occ)[1:]:
                cov.setdefault(d, set()).update(range(s, s + L))
        out = {}
        for d, ws in words.items():
            keep = [w for p, w in enumerate(ws)
                    if p not in cov.get(d, set())]
            out[d] = (len(ws), len(ws) - len(keep), " ".join(keep))
        return out

    for seed in (7, 41, 1234):
        rng = random.Random(seed)
        docs = [(d, " ".join(rng.choice("abcde")
                             for _ in range(rng.randint(1, 25))))
                for d in range(30)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["id"]: (r["n_words"], r["n_removed"], r["text_kept"])
               for r in apply_span_dedup(df, span_words=L).collect()}
        assert got == brute_apply(docs), f"seed {seed}"


def test_kmeans_k_exceeds_rows(spark):
    """k >= n: every vector seeds its own cluster and converges to
    itself — assignment is identity with d2 = 0 (the degenerate edge a
    coarse-quantizer caller can hit on a tiny partition)."""
    vecs = [[0.1, 0.2], [-0.3, 0.4], [0.5, -0.1]]
    out = {r["vec_id"]: (r["cluster"], r["d2"])
           for r in kmeans_assign(_emb(spark, vecs), k=8, iters=2).collect()}
    assert out == {0: (0, 0), 1: (1, 0), 2: (2, 0)}
