"""DSIR-style importance weighting for training-data selection.

"Data Selection for Language Models via Importance Resampling" (Xie et
al., NeurIPS 2023) selects raw web documents that look like a small
high-quality TARGET corpus: featurize every document as hashed n-gram
counts, fit unigram+bigram bucket distributions over the target and the
raw pools, and score each raw document by the importance log-ratio

    score(doc) = Σ_grams  ln p_target(bucket(g)) − ln p_raw(bucket(g)).

Top-scoring (or Gumbel-resampled) documents form the training mixture.
This is the standard published alternative to classifier-based quality
filtering — cheap (no model), tunable per target domain.

Spark-first shape (100 TB rationale):

- featurization is pure column algebra on the scan (split → zip_with
  bigrams → explode) — no UDF;
- both distributions are ONE map-side-combined groupBy over ``buckets``
  keys (default 2¹⁶) — the result is a bucket-count table small enough to
  BROADCAST, so scoring is a broadcast hash join + per-doc agg: the raw
  corpus shuffles once, on doc_id, with integer per-(doc, bucket) counts
  (grams collapse doc-side before the join — the join input is
  O(distinct buckets per doc), not O(tokens));
- totals (T, R) are scalar aggs collected on the driver (two rows).

``hash_fn="xxhash64"`` is the production path (one JVM intrinsic per
gram); ``"md5"`` derives the bucket from the leading 8 hex digits of
md5(gram) — byte-replayable in DuckDB, which is what the correctness gate
uses (same convention as the minhash / hashed-TF families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _grams(text_col: str) -> Column:
    """unigrams + space-joined bigrams of the whitespace tokenization
    (lowercased); an array column, empty for empty/blank text."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    # zip_with pads the shorter side with null; concat(null) -> null,
    # filtered out -> exactly the size-1 bigram list
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        lambda g: g.contains(" "),
    )
    return F.concat(toks, bigrams)


def _bucket(col: Column, buckets: int, hash_fn: str) -> Column:
    if hash_fn == "md5":
        return (
            F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
            % F.lit(buckets)
        )
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(buckets))
    raise ValueError(f"unknown hash_fn: {hash_fn!r}")


def hashed_gram_counts(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 65536,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, bucket, c) — per-document hashed unigram+bigram bucket counts.
    One explode + one (id, bucket) map-side-combined agg."""
    grams = documents.select(
        F.col(id_col).alias("id"), F.explode(_grams(text_col)).alias("g")
    )
    return grams.groupBy(
        "id", _bucket(F.col("g"), buckets, hash_fn).alias("bucket")
    ).agg(F.count("*").alias("c"))


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 65536,
    hash_fn: str = "xxhash64",
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, weight) with weight = ln p̂_target(bucket) − ln p̂_raw(bucket),
    both Laplace-smoothed: p̂(b) = (count_b + alpha) / (total + alpha·buckets).
    At most ``buckets`` rows — broadcastable by construction."""
    def dist(df: DataFrame, name: str) -> DataFrame:
        grams = df.select(F.explode(_grams(text_col)).alias("g"))
        return grams.groupBy(
            _bucket(F.col("g"), buckets, hash_fn).alias("bucket")
        ).agg(F.count("*").alias(name))

    t, r = dist(target, "ct"), dist(raw, "cr")
    # scalar totals: two single-row collects (bounded — same discipline as
    # the classifier's dim+1 gradient collect)
    tot_t = t.agg(F.sum("ct")).first()[0] or 0
    tot_r = r.agg(F.sum("cr")).first()[0] or 0
    joined = t.join(r, "bucket", "full").select(
        "bucket",
        F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
    )
    w = F.log((F.col("ct") + alpha) / (tot_t + alpha * buckets)) - F.log(
        (F.col("cr") + alpha) / (tot_r + alpha * buckets)
    )
    return joined.select("bucket", w.alias("weight"))


def dsir_scores(
    raw: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    buckets: int = 65536,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, dsir_score, n_grams) per raw document: Σ c_b·weight(b) over
    the document's distinct buckets.  The weight table is broadcast;
    buckets the target/raw pools never saw fall back to weight 0 (their
    smoothed ratio is ln(α/T')−ln(α/R'), a constant the caller can fold
    in; 0 keeps scores centered and engines agreed)."""
    counts = hashed_gram_counts(
        raw, text_col, id_col, buckets=buckets, hash_fn=hash_fn
    )
    scored = counts.join(F.broadcast(weights), "bucket", "left").groupBy(
        "id"
    ).agg(
        F.sum(F.col("c") * F.coalesce(F.col("weight"), F.lit(0.0))).alias(
            "dsir_score"
        ),
        F.sum("c").alias("n_grams"),
    )
    return scored.select(F.col("id").alias(id_col), "dsir_score", "n_grams")


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    budget: int,
    buckets: int = 65536,
    hash_fn: str = "xxhash64",
    alpha: float = 1.0,
    length_normalize: bool = False,
) -> DataFrame:
    """Select the ``budget`` raw documents whose hashed-n-gram profile is
    most target-like: weights → scores → global top-``budget`` by
    (score desc, id asc — deterministic tie-break).  The paper resamples
    with Gumbel noise to diversify; deterministic top-k is the
    reproducible variant and the correctness-gate path (seeded Gumbel is
    a one-line addition at the score column).  ``length_normalize``
    divides by the gram count so long documents don't dominate.

    Returns (id, dsir_score, rank).  The global top-k is a TakeOrdered
    (per-partition top-k then merge) — no full sort of the corpus."""
    w = dsir_weights(
        target, raw, text_col, id_col,
        buckets=buckets, hash_fn=hash_fn, alpha=alpha,
    )
    s = dsir_scores(
        raw, w, text_col, id_col, buckets=buckets, hash_fn=hash_fn
    )
    score = (
        (F.col("dsir_score") / F.col("n_grams"))
        if length_normalize
        else F.col("dsir_score")
    )
    ranked = s.select(
        F.col(id_col), score.alias("dsir_score"), "n_grams"
    ).orderBy(F.col("dsir_score").desc(), F.col(id_col)).limit(budget)
    # rank numbering runs AFTER the top-k cut, so the unpartitioned window
    # sees exactly ``budget`` rows — bounded, like the centroid collects
    return ranked.select(
        id_col,
        "dsir_score",
        F.row_number()
        .over(Window.orderBy(F.col("dsir_score").desc(), F.col(id_col)))
        .alias("rank"),
    )
