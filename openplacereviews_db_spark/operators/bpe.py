"""BPE vocabulary induction (SURVEY.md §2.13 X43): learn byte-pair
merges from the corpus — the tokenizer-training stage of an LLM data
pipeline, distributed.

Classic Sennrich-style BPE over word TYPES: the state is the
vocabulary-sized (word, freq, symbols) relation — at 100 TB the corpus
explodes once to word counts and everything after scales with the
vocabulary, not the corpus.  Each merge round is (a) one
pair-count shuffle over adjacent symbol pairs, (b) a 1-row TakeOrdered
action picking the most frequent pair (deterministic tiebreak on the
pair itself — a bounded collect, the same class as IVF's centroid
pick), and (c) an Arrow-batched pandas_udf applying the merge
left-to-right non-overlapping, gated by an ``array_contains`` prefilter
so the Python kernel only touches words that can contain the pair.
State is localCheckpointed per round (the iterative-loop rule).

Semantics pinned by a pure-Python golden (tests/test_bpe.py), since an
order-dependent greedy merge is not SQL-expressible: pair counting
counts every adjacent occurrence (overlaps included); merging is
left-to-right greedy; the argmax tiebreak is (count DESC, left ASC,
right ASC).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H


def _word_types(docs: DataFrame) -> DataFrame:
    """(word, freq) over the normalized corpus — the only corpus-sized
    pass; everything downstream is vocabulary-sized."""
    return (docs.select(F.explode(F.filter(
        F.split(H.norm_text(F.col("text")), " "),
        lambda w: w != "")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def merge_word(syms: list, a: str, b: str, ab: str) -> list:
    """Left-to-right non-overlapping merge of adjacent (a, b) → ab —
    shared by the Spark kernel and the test golden."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _merge_udf(a: str, b: str, ab: str):
    """Arrow-batched kernel applying one merge rule (closure-captured —
    pandas_udf requires type hints on every parameter, so the rule can't
    ride in as default arguments)."""
    @F.pandas_udf("array<string>")
    def apply_merge(col: pd.Series) -> pd.Series:
        return col.map(lambda s: merge_word(list(s), a, b, ab))
    return apply_merge


def bpe_merges(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns one row per merge:
    (merge_rank, left, right, merged, pair_count)."""
    spark = docs.sparkSession
    state = (_word_types(docs)
             .select("word", "freq",
                     F.filter(F.split(F.col("word"), ""),
                              lambda c: c != "").alias("syms"))
             .localCheckpoint(eager=True))
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            state.where(F.size("syms") >= 2)
            .select("freq", F.explode(F.expr(
                "transform(sequence(0, size(syms) - 2),"
                " i -> struct(syms[i] AS a, syms[i + 1] AS b))"))
                .alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("freq").alias("cnt")))
        top = (pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
               .limit(1).collect())
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        ab = a + b
        merges.append((rank, a, b, ab, cnt))

        apply_merge = _merge_udf(a, b, ab)
        touched = F.array_contains("syms", a) & F.array_contains("syms", b)
        state = (state.withColumn(
            "syms", F.when(touched, apply_merge(F.col("syms")))
            .otherwise(F.col("syms")))
            .localCheckpoint(eager=True))
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, "
                "merged string, pair_count bigint")
