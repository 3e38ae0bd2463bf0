"""Model-based quality filter: a fastText-style linear classifier over
hashed bigram features, trained target-vs-raw with deterministic
fixed-iteration batch gradient descent — no MLlib, no RNG.

The last missing pillar of the public LLM-curation stack (cf. GPT-3 /
PaLM data work, Brown et al. 2020 Appendix A: a linear classifier over
hashed n-gram features scores raw documents by similarity to a curated
positive set; docs are kept by score): heuristics (gopher_quality),
frequency proxies (freq_score/ccnet_buckets) and importance weights
(dsir_weight) already exist — this adds the LEARNED filter over the
same 10^4-bucket hashed-bigram feature space as dsir_weight
(sampling.sample_bucket, engine-portable md5), so features are shared
and reproducible across engines.

Model: logistic regression, p(quality) = sigmoid(w·x + b), x = per-doc
bucket tf (count / total bigrams). Training is full-batch gradient
descent with per-coordinate Adagrad steps (Duchi et al. 2011, public
paper — the bias coordinate sees gradients ~20× larger than tf-scaled
bucket coordinates, and a single global step size provably oscillates
on this scale mismatch; Adagrad's per-coordinate normalization is the
standard deterministic fix) and a FIXED iteration count:

- the feature frame (doc_id, y, buckets[], vals[]) is built in ONE
  corpus pass (explode → (doc,bucket) partial-agg → per-doc arrays) and
  persisted; every GD round reuses it — the corpus is never re-scanned.
- per round, per-doc margins come from an Arrow-batched pandas UDF with
  the weight vector in the closure (10^4 doubles — trivially shipped);
  NO join against a weight table, NO per-row Python.
- per-bucket gradients are one explode + map-side-combinable sum; the
  10^4+1 gradient rows are the ONLY per-round driver action (bounded
  collect, same class as dsir's bucket tables).
- determinism on any partitioning/core count: each doc's contribution
  r·x is rounded to 12 dp and summed as DECIMAL(38,12) — an exact,
  order-independent sum (the dsir_weight convention) — before the
  driver applies the float update. Two runs on any layout produce
  bit-identical weights (tested).

Scale: one persisted corpus-wide feature frame (at 10^12 docs: disk
persist / a written feature table), `iters` × (one Arrow pass + one
partial-agg shuffle of the exploded features). The weight vector stays
B+1 = 10^4+1 doubles forever; nothing corpus-sized ever reaches the
driver.

Reference parity: upstream (bigmuddy) has no learned filters; this op
belongs to the LLM-training-data surface (SURVEY.md §2 addendum),
sharing its feature space with dsir_weight.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

_B = 10_000  # bucket count — fixed by sampling.sample_bucket's hash


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "qmodel",
) -> DataFrame:
    """Per-doc sparse hashed-bigram tf features:
    (doc_id, buckets array<int> sorted, vals array<double> tf).
    Docs with <2 tokens have no bigram → empty arrays (kept, scored by
    bias alone — they are a quality-floor concern, not dropped here;
    the ADVICE-r5 dsir lesson applied from day one)."""
    from bmspark.functions import sampling

    toks = df.select(
        _c(id_col).alias("doc_id"),
        F.split(F.trim(F.coalesce(_c(text_col), F.lit(""))), r"\s+").alias("toks"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.array_join(F.slice("toks", i, 2), " "),
                ),
            ).otherwise(F.array())
        ).alias("gram"),
    ).select(
        "doc_id", sampling.sample_bucket(F.col("gram"), salt).alias("bucket")
    )
    docbuck = grams.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = (
        docbuck.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bucket", "cnt"))
            ).alias("bc"),
            F.sum("cnt").alias("tot"),
        )
        .select(
            "doc_id",
            F.transform("bc", lambda s: s["bucket"].cast("int")).alias("buckets"),
            F.transform("bc", lambda s: s["cnt"] / F.col("tot")).alias("vals"),
        )
    )
    # explode(array()) drops featureless docs — restore them with empty
    # feature arrays via a left join on the id spine
    spine = toks.select("doc_id")
    return spine.join(per_doc, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("buckets", F.array().cast("array<int>")).alias("buckets"),
        F.coalesce("vals", F.array().cast("array<double>")).alias("vals"),
    )


def _margin_udf(w: np.ndarray):
    """sigmoid(w·x + b) per doc; weights (len B+1, bias last) ride the
    closure — Arrow-batched, numpy per row, no join, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    wv = np.asarray(w, dtype=np.float64)

    @pandas_udf("double")
    def prob(batches: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for buckets, vals in batches:
            out = np.empty(len(buckets))
            for i, (bk, xv) in enumerate(zip(buckets, vals)):
                z = wv[-1]
                if len(bk):
                    z += float(
                        np.dot(wv[np.asarray(bk, dtype=np.int64)],
                               np.asarray(xv, dtype=np.float64))
                    )
                out[i] = 1.0 / (1.0 + np.exp(-z))
            yield pd.Series(out)

    return prob


def quality_train(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = 12,
    lr: float = 1.0,
    l2: float = 1e-4,
    salt: str = "qmodel",
) -> np.ndarray:
    """Train the logistic filter on positives (curated/target docs) vs
    negatives (raw docs) — disjoint frames by contract. Returns the
    dense weight vector, length B+1 (bias last), a pure deterministic
    function of the two inputs."""
    feats = (
        hashed_features(pos, text_col, id_col, salt).withColumn("y", F.lit(1.0))
        .unionByName(
            hashed_features(neg, text_col, id_col, salt)
            .withColumn("y", F.lit(0.0))
        )
        .persist()
    )
    n = feats.count()  # materializes the persist; n is the GD scale factor
    if n == 0:
        raise ValueError("quality_train: empty training set")
    w = np.zeros(_B + 1, dtype=np.float64)
    G = np.zeros(_B + 1, dtype=np.float64)  # Adagrad accumulator
    try:
        for _ in range(iters):
            resid = feats.withColumn(
                "r", _margin_udf(w)("buckets", "vals") - F.col("y")
            )
            # one exploded frame carries BOTH the per-bucket gradients and
            # the bias gradient (synthetic bucket -1 with x=1), so each
            # round is ONE partial-agg shuffle + ONE bounded collect of
            # <= B+1 rows
            grad_rows = (
                resid.select(
                    "r",
                    F.explode(
                        F.concat(
                            F.zip_with(
                                "buckets", "vals",
                                lambda bk, xv: F.struct(
                                    bk.alias("bucket"), xv.alias("x")
                                ),
                            ),
                            F.array(F.struct(
                                F.lit(-1).alias("bucket"),
                                F.lit(1.0).alias("x"),
                            )),
                        )
                    ).alias("f"),
                )
                .groupBy("f.bucket")
                .agg(
                    F.sum(
                        F.round(F.col("r") * F.col("f.x"), 12)
                        .cast("decimal(38,12)")
                    ).alias("g")
                )
                .collect()
            )
            g = np.zeros(_B + 1, dtype=np.float64)
            for row in grad_rows:
                g[row["bucket"]] = float(row["g"])  # bucket -1 → bias slot
            g /= n
            g[:-1] += l2 * w[:-1]  # no penalty on the bias
            G += g * g
            mask = G > 0
            w[mask] -= lr * g[mask] / np.sqrt(G[mask] + 1e-10)
    finally:
        feats.unpersist()
    return w


def quality_score(
    df: DataFrame,
    weights: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "qmodel",
) -> DataFrame:
    """Score every doc with trained weights: (doc_id, q_prob) — ONE
    corpus pass (feature build + closure-shipped dot product), rounded
    to 6 dp for engine-stable comparisons."""
    feats = hashed_features(df, text_col, id_col, salt)
    return feats.select(
        "doc_id",
        F.round(_margin_udf(weights)("buckets", "vals"), 6).alias("q_prob"),
    )


def quality_classifier(
    df: DataFrame,
    target_pred: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = 12,
    lr: float = 1.0,
    salt: str = "qmodel",
) -> DataFrame:
    """Convenience composition for the funnel/driver: split ``df`` by
    ``target_pred`` into positives vs the rest, train, score EVERY doc.
    Returns (doc_id, q_prob)."""
    pos = df.filter(target_pred)
    neg = df.filter(f"NOT ({target_pred})")
    w = quality_train(pos, neg, text_col, id_col, iters=iters, lr=lr, salt=salt)
    return quality_score(df, w, text_col, id_col, salt)
