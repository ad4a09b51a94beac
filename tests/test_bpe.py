"""BPE learner + Arrow apply kernels (functions/bpe.py) and the
count='bpe' wiring through token_budget_mix."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_data_quality_spark.functions.bpe import (
    bpe_count_np,
    bpe_encode_np,
    bpe_learn,
)


def _naive_encode(word, merges):
    """Independent reference implementation: materialize the full merge
    loop by rescanning the merges table (no rank dict, no caching) —
    deliberately different code shape from functions/bpe.py."""
    syms = list(word)
    while True:
        applied = False
        for a, b in [(m[0], m[1]) for m in merges]:
            if any(x == a and y == b for x, y in zip(syms, syms[1:])):
                out, i = [], 0
                while i < len(syms):
                    if (
                        i < len(syms) - 1
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
                applied = True
                break  # restart: lowest-rank pair present wins
        if not applied:
            return syms


def test_bpe_learn_hand_corpus(spark):
    """On a corpus dominated by 'lower', the first merges must build it
    up pair by frequency; the learned table re-segments training words
    to single tokens."""
    rows = [(i, "lower lower lower lowest low") for i in range(4)]
    df = spark.createDataFrame(rows, "id long, text string")
    merges = bpe_learn(df, "text", num_merges=10, min_pair_freq=2)
    assert merges  # learned something
    assert all(len(m) == 2 for m in merges)
    # 'low' appears in every word (freq 5x4 per pair) -> the first two
    # merges must assemble it: (l,o) then (lo,w)
    assert merges[0] == ["l", "o"] and merges[1] == ["lo", "w"]
    out = {
        r["t"]: (r["n"], r["toks"])
        for r in spark.createDataFrame(
            [("lower",), ("lowest",), ("low",), (None,), ("   ",)],
            "t string",
        )
        .select(
            "t",
            bpe_count_np(merges)(F.col("t")).alias("n"),
            bpe_encode_np(merges)(F.col("t")).alias("toks"),
        )
        .collect()
    }
    # every training word compresses to ONE token (all its pairs were
    # frequent enough to merge)
    assert out["lower"][0] == 1 and out["lower"][1] == ["lower"]
    assert out["low"] == (1, ["low"])
    assert out["lowest"][0] == 1
    assert out[None] == (None, None)
    assert out["   "] == (0, [])


def test_bpe_learn_determinism_and_validation(spark):
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {'x' * (i % 3 + 1)}") for i in range(20)],
        "id long, text string",
    )
    a = bpe_learn(df, "text", num_merges=30, seed=7)
    b = bpe_learn(df.repartition(5), "text", num_merges=30, seed=7)
    assert a == b  # partitioning-independent

    with pytest.raises(ValueError, match="num_merges"):
        bpe_learn(df, "text", num_merges=0)
    with pytest.raises(ValueError, match="min_pair_freq"):
        bpe_learn(df, "text", min_pair_freq=0)
    with pytest.raises(ValueError, match="nothing to train"):
        bpe_learn(
            spark.createDataFrame([(1, None)], "id long, text string"),
            "text",
        )
    with pytest.raises(ValueError, match="not a pair"):
        bpe_count_np([["a", "b", "c"]])


def test_bpe_apply_consistent_with_learner_segmentation(spark):
    """Applying the learned table (min-rank loop) must reproduce the
    learner's own final segmentation of every training word — the
    subword-nmt train/apply consistency property."""
    corpus = (
        "the quick brown fox jumps over the lazy dog "
        "the quicker brown foxes jumped over lazy dogs"
    )
    df = spark.createDataFrame([(1, corpus), (2, corpus)], "id long, text string")
    merges = bpe_learn(df, "text", num_merges=40, min_pair_freq=2)

    # replay the learner: start from chars, apply merges IN TABLE ORDER
    words = sorted(set(corpus.split()))
    learner_seg = {}
    for w in words:
        syms = list(w)
        for a, b in [(m[0], m[1]) for m in merges]:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        learner_seg[w] = syms

    got = {
        r["t"]: r["toks"]
        for r in spark.createDataFrame([(w,) for w in words], "t string")
        .select("t", bpe_encode_np(merges)(F.col("t")).alias("toks"))
        .collect()
    }
    assert got == learner_seg


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="abcdef ", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_kernel_matches_naive_model(spark, texts):
    """Property: the Arrow kernel equals the naive rescan-the-table
    reference on arbitrary text over a learned table."""
    train = spark.createDataFrame(
        [(i, "abc abcd cde fab deaf fade bead" * 2) for i in range(6)],
        "id long, text string",
    )
    merges = bpe_learn(train, "text", num_merges=15, min_pair_freq=2)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, t string")
    got = {
        r["id"]: (r["n"], r["toks"])
        for r in df.select(
            "id",
            bpe_count_np(merges)(F.col("t")).alias("n"),
            bpe_encode_np(merges)(F.col("t")).alias("toks"),
        ).collect()
    }
    for i, t in enumerate(texts):
        exp_toks = []
        for w in t.lower().split():
            exp_toks.extend(_naive_encode(w, merges))
        assert got[i] == (len(exp_toks), exp_toks), (t, merges)


def test_token_budget_mix_bpe_wiring(spark):
    """count='bpe' flows the kernel counts through the mix; equals the
    same mix fed precomputed counts; validation is loud."""
    from pyspark_data_quality_spark.operators.split import token_budget_mix

    merges = [["a", "b"], ["ab", "c"]]
    rows = [(i, "s0" if i % 2 == 0 else "s1",
             " ".join(["abc", "ab", "xyz"][: (i % 3) + 1]))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kw = dict(target={"s0": 0.5, "s1": 0.5})
    got = token_budget_mix(
        df, "doc_id", "source", text_col="text",
        count="bpe", bpe_merges=merges, **kw,
    ).select("doc_id", "mix_tokens", "mix_keep")
    pre = df.withColumn("_n", bpe_count_np(merges)(F.col("text")))
    want = token_budget_mix(
        pre, "doc_id", "source", token_count_col="_n", **kw,
    ).select("doc_id", "mix_tokens", "mix_keep")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # abc -> [abc] = 1 token under the chain (a,b)+(ab,c); xyz -> 3
    by_id = {r["doc_id"]: r["mix_tokens"] for r in got.collect()}
    assert by_id[0] == 1          # "abc"
    assert by_id[1] == 2          # "abc ab"
    assert by_id[2] == 1 + 1 + 3  # "abc ab xyz"

    with pytest.raises(ValueError, match="count must be"):
        token_budget_mix(df, "doc_id", "source", text_col="text",
                         count="chars", **kw)
    with pytest.raises(ValueError, match="bpe_merges"):
        token_budget_mix(df, "doc_id", "source", text_col="text",
                         count="bpe", **kw)
