"""Golden test for BPE vocabulary induction (X43): the Spark operator
must reproduce a pure-Python reference implementation exactly — pair
counting includes overlapping adjacent occurrences, merging is
left-to-right greedy non-overlapping, argmax ties break on
(count DESC, left ASC, right ASC)."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from openplacereviews_db_spark.operators.bpe import bpe_merges, merge_word


def _reference_merges(sf_dir: str, n_merges: int):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    words = Counter()
    for text in t["text"].to_pylist():
        if not text:
            continue
        norm = re.sub(r"\s+", " ", text).strip().lower()
        for w in norm.split(" "):
            if w:
                words[w] += 1
    state = {w: list(w) for w in words}
    out = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in state.items():
            f = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ab = a + b
        out.append((rank, a, b, ab, cnt))
        state = {w: merge_word(s, a, b, ab) for w, s in state.items()}
    return out


def test_bpe_matches_python_reference(spark, sf_dir):
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where("length(text) > 0"))
    got = [tuple(r) for r in bpe_merges(docs, n_merges=5).collect()]
    want = _reference_merges(sf_dir, 5)
    assert got == want


def test_merge_word_overlap_semantics():
    # 'aaa' merging (a,a) is left-to-right non-overlapping: [aa, a]
    assert merge_word(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    assert merge_word(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert merge_word(list("xy"), "a", "b", "ab") == ["x", "y"]


# property tests: merge_word must preserve content and never leave an
# adjacent (a, b) pair unmerged
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _sym = st.text(alphabet="ab", min_size=1, max_size=2)

    @given(st.lists(_sym, max_size=12), _sym, _sym)
    @settings(max_examples=200, deadline=None)
    def test_merge_word_properties(syms, a, b):
        ab = a + b
        out = merge_word(list(syms), a, b, ab)
        # concatenated content is unchanged
        assert "".join(out) == "".join(syms)
        # no adjacent (a, b) pair survives UNLESS it was produced by the
        # merge itself (ab == a, e.g. merging ('a','') is excluded by
        # construction: symbols are non-empty)
        for i in range(len(out) - 1):
            if out[i] == a and out[i + 1] == b:
                # only legal if the merge re-creates the pair, i.e. the
                # merged token equals a and the next token b arose from
                # an earlier merge — impossible when ab differs from
                # both halves
                assert ab == a or ab == b
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_encode_token_counts_golden(spark):
    """X58 crafted corpus: the codegen replace-chain encode must equal
    applying merge_word sequentially in Python — including the
    overlap case (aaa with (a,a) -> [aa, a]) and a merged pair that a
    later merge extends."""
    from openplacereviews_db_spark.operators.bpe import (
        encode_token_counts, merge_word)

    docs = [(1, "abab abb aaa"), (2, "ba  AB"), (3, "c")]
    merges = [("a", "b"), ("ab", "ab")]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_base_tokens"], r["n_tokens"])
           for r in encode_token_counts(sdf, merges).collect()}

    import re
    for doc_id, text in docs:
        norm = re.sub(r"\s+", " ", text).strip().lower()
        words = [w for w in norm.split(" ") if w]
        want_tokens = 0
        for w in words:
            syms = list(w)
            for a, b in merges:
                syms = merge_word(syms, a, b, a + b)
            want_tokens += len(syms)
        assert got[doc_id] == (len(words), sum(len(w) for w in words),
                               want_tokens), (doc_id, got[doc_id])
    # spot-pin the interesting values: "abab"->[abab], "abb"->[ab,b],
    # "aaa"->[a,a,a]; "ba"->[b,a], "ab"->[ab]; "c"->[c]
    assert got[1] == (3, 10, 6)
    assert got[2] == (2, 4, 3)
    assert got[3] == (1, 1, 1)
