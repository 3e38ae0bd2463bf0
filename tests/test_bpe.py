"""BPE merge learning (bmspark/functions/bpe.py): exact merge-sequence
equality vs a pure-Python reference, partition-independence, encode
round-trip, and early stop."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bmspark.functions import bpe


# ---- pure-Python reference BPE (Sennrich et al. 2016 merge rule) ----

def _merge_syms(syms: tuple, left: str, right: str) -> tuple:
    res, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            res.append(left + right)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return tuple(res)


def _ref_bpe(word_freqs: dict[str, int], n_merges: int,
             min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    vocab = {w: (tuple(w), f) for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((a, b, c))
        vocab = {
            w: (_merge_syms(syms, a, b) if a in syms and b in syms else syms, f)
            for w, (syms, f) in vocab.items()
        }
    return merges


def _word_freqs(texts: list[str]) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_bpe_train_matches_reference_on_random_corpora(spark):
    """Exact merge-sequence equality (pair AND count AND order) on
    seeded random corpora over a tiny alphabet — small alphabets force
    heavy pair-count ties, so this exercises the deterministic
    tie-break, not just the argmax."""
    rnd = random.Random(406)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rnd.choice("abc") for _ in range(rnd.randint(1, 8)))
                for _ in range(rnd.randint(3, 12))
            )
            for _ in range(60)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = [
            (r.left, r.right, r.pair_count)
            for r in bpe.bpe_train(df, n_merges=15).orderBy("rank").collect()
        ]
        want = _ref_bpe(_word_freqs(texts), 15)
        assert got == want, f"trial {trial}"
        # ranks are 1..n contiguous
        ranks = [r.rank for r in bpe.bpe_train(df, n_merges=3).orderBy("rank").collect()]
        assert ranks == list(range(1, len(ranks) + 1))


def test_bpe_train_partition_independent(spark):
    """The learned merge sequence is a pure function of corpus content:
    1-partition and 13-partition layouts of the same rows learn
    identical merges (total-order tie-break, no first-arrival
    dependence)."""
    texts = [(i, "low lower lowest newer newest wide widest " * 3)
             for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    a = [(r.left, r.right, r.pair_count)
         for r in bpe.bpe_train(df.repartition(1), 12).orderBy("rank").collect()]
    b = [(r.left, r.right, r.pair_count)
         for r in bpe.bpe_train(df.repartition(13), 12).orderBy("rank").collect()]
    assert a == b and len(a) == 12


def test_bpe_encode_roundtrip_and_segmentation(spark):
    """bpe_encode with the learned merges: token concatenation per doc
    reproduces the whitespace-split words exactly (lossless), and the
    segmentation equals the reference segmentation after applying the
    full merge list in rank order."""
    texts = [
        (1, "banana bandana ban banana"),
        (2, "an antenna and a banana"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    merges_rows = bpe.bpe_train(df, n_merges=8).orderBy("rank").collect()
    merges = [(r.left, r.right) for r in merges_rows]
    out = {r.doc_id: r for r in bpe.bpe_encode(df, merges).collect()}

    for doc_id, text in texts:
        words = (text or "").split()
        toks = out[doc_id].tokens
        assert "".join(toks) == "".join(words)
        assert out[doc_id].n_tokens == len(toks)
        # reference segmentation: apply merges in rank order per word
        ref_toks = []
        for w in words:
            syms = tuple(w)
            for a, b in merges:
                syms = _merge_syms(syms, a, b)
            ref_toks.extend(syms)
        assert toks == ref_toks, doc_id


def test_bpe_train_early_stop_below_min_pair_count(spark):
    """A corpus where every adjacent pair is unique stops immediately
    (no merge reaches min_pair_count=2) — empty result, stable schema."""
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    out = bpe.bpe_train(df, n_merges=5)
    assert out.count() == 0
    assert out.columns == ["rank", "left", "right", "pair_count"]
