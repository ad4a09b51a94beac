"""Byte-pair-encoding token counting for training-mix recipes.

LLM data recipes are written in TOKENIZER tokens ("30% code by
tokens"), and whitespace counts carry a systematic 10-20% bias vs a
real subword vocabulary that shifts every source share in a token-
budgeted mix. This module provides the real thing at Spark scale:

- :func:`bpe_learn` — train a merges table with the classic greedy
  pair-frequency algorithm (Sennrich et al. 2016, subword-nmt) on a
  deterministic bounded corpus sample, driver-side (the one training
  action, same contract as ``train_ivf_centroids``);
- :func:`bpe_count_np` / :func:`bpe_encode_np` — Arrow-vectorized
  apply kernels: the merges table is captured in the UDF closure
  (broadcast with the serialized function), each Arrow batch encodes
  via the standard min-rank merge loop with a per-word memo — corpora
  are Zipfian, so almost every word is a dict hit, not a merge loop.

Tokenization model (documented simplifications vs GPT-2 BPE):
normalization matches the repo convention (lower, collapse ASCII
whitespace, trim — ``functions/text.normalize_text``), words are
whitespace-split, merges are WORD-INTERNAL (no cross-word merges, no
end-of-word marker, character-level initial symbols rather than
bytes). The merge SEMANTICS — greedy min-rank, all occurrences
left-to-right per step — are exactly subword-nmt's, so counts track a
real learned vocabulary, not a heuristic.

No counterpart in the reference repo (its only text handling is the
three rule checks); this extends the training-data operator set per
SURVEY §2.3.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import py_tokenize


def _words(text: str, lowercase: bool) -> list[str]:
    # the shared normalization contract (functions/text.py) — BPE
    # counts and shingle hashes must tokenize identically
    return py_tokenize(text, lowercase=lowercase)


def _merge_pair(syms: list[str], a: str, b: str) -> list[str]:
    """Merge every left-to-right occurrence of the adjacent pair (a, b)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Standard BPE apply: repeatedly merge the lowest-rank pair present."""
    syms = list(word)
    while len(syms) > 1:
        best: tuple[str, str] | None = None
        best_rank = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        syms = _merge_pair(syms, *best)
    return syms


def bpe_learn(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int = 256,
    sample_size: int = 2048,
    min_pair_freq: int = 2,
    lowercase: bool = True,
    seed: int = 42,
) -> list[list[str]]:
    """Learn a BPE merges table from a deterministic corpus sample.

    The ONE deliberate action of the BPE pipeline (vocabulary training
    is a separate step in every subword system): ``sample_size`` texts
    picked by hash order (same corpus -> same table, independent of
    partitioning), greedy highest-frequency pair selection with a
    lexicographic tiebreak so the table is fully deterministic, stop
    early when the best pair falls under ``min_pair_freq``. Returns
    ``[[left, right], ...]`` in merge-priority order, directly usable
    by the apply kernels and JSON-serializable for reuse across runs.

    Driver-side cost is bounded by the sample, not the corpus:
    O(num_merges x distinct-word symbol mass) over at most
    ``sample_size`` documents.
    """
    if num_merges < 1:
        raise ValueError("bpe_learn: num_merges must be >= 1")
    if min_pair_freq < 1:
        raise ValueError("bpe_learn: min_pair_freq must be >= 1")
    rows = (
        df.select(F.col(text_col).alias("t"))
        .filter(F.col(text_col).isNotNull())
        .orderBy(F.xxhash64(F.col(text_col), F.lit(seed)))
        .limit(sample_size)
        .collect()
    )
    vocab = Counter()
    for r in rows:
        vocab.update(_words(r["t"], lowercase))
    if not vocab:
        raise ValueError(
            f"bpe_learn: sample yielded no words from '{text_col}' — "
            "nothing to train on"
        )
    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in sorted(vocab.items())
    ]
    merges: list[list[str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair (Counter.most_common alone is insertion-order
        # dependent on ties)
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        merges.append([best[0], best[1]])
        words = [(_merge_pair(syms, *best), c) for syms, c in words]
    return merges


def _ranks(merges) -> dict[tuple[str, str], int]:
    out: dict[tuple[str, str], int] = {}
    for i, m in enumerate(merges):
        if len(m) != 2:
            raise ValueError(f"bpe: merge entry {m!r} is not a pair")
        pair = (str(m[0]), str(m[1]))
        if pair not in out:  # first (lowest) rank wins, like subword-nmt
            out[pair] = i
    return out


def bpe_count_np(merges, *, lowercase: bool = True):
    """Arrow-vectorized BPE token COUNT: pandas_udf text -> BIGINT.

    NULL text -> NULL; text with no words after normalization -> 0.
    The per-word memo makes repeated vocabulary nearly free; the memo
    lives per-executor-process for the query's lifetime and is bounded
    by the observed distinct-word count.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = _ranks(merges)

    cache: dict[str, int] = {}

    def f(texts):
        out = [None] * len(texts)
        for i, t in enumerate(texts):
            if t is None:
                continue
            total = 0
            for w in _words(t, lowercase):
                n = cache.get(w)
                if n is None:
                    n = len(_encode_word(w, ranks))
                    cache[w] = n
                total += n
            out[i] = total
        return pd.Series(out, dtype="Int64")

    f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    # NOT asNondeterministic (r15-opt review): the count feeds
    # aggregations via a plain column, never an explode/filter — no
    # duplication to prevent, and the marking would block caller-filter
    # pushdown (see repair.unicode_normalize for the rationale)
    return pandas_udf(f, "long")


def bpe_encode_np(merges, *, lowercase: bool = True):
    """Arrow-vectorized BPE tokenization: pandas_udf text ->
    ``array<string>`` of subword tokens (word-internal merges, words in
    text order). NULL text -> NULL; no words -> empty array."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = _ranks(merges)
    cache: dict[str, list[str]] = {}

    def f(texts):
        out = [None] * len(texts)
        for i, t in enumerate(texts):
            if t is None:
                continue
            toks: list[str] = []
            for w in _words(t, lowercase):
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            out[i] = toks
        return pd.Series(out)

    f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    # NOT asNondeterministic — same rationale as bpe_count_np above
    return pandas_udf(f, "array<string>")
