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
- each distribution is ONE map-side-combined groupBy over ``buckets``
  keys (default 2¹⁶) — the result is a bucket-count table small enough
  to BROADCAST, so scoring is a broadcast hash join + per-doc agg: the
  raw corpus shuffles once, on doc_id, with integer per-(doc, bucket)
  counts (grams collapse doc-side before the join — the join input is
  O(distinct buckets per doc), not O(tokens));
- the smoothing totals (T, R) come from an unpartitioned window over the
  joined bucket tables — ≤ ``buckets`` rows through one task, bounded by
  construction (same discipline as the centroid collects), and crucially
  computed INSIDE the weight plan: no scalar-collect action that would
  re-tokenize a pool a second time;
- ``dsir_select`` tokenizes the raw corpus exactly ONCE: the per-doc
  bucket counts are localCheckpoint'ed (PageRank's idiom) and both the
  raw distribution and the scoring join read that materialization.

``hash_fn="xxhash64"`` is the production path (one JVM intrinsic per
gram); ``"md5"`` derives the bucket from the leading 8 hex digits of
md5(gram) — byte-replayable in DuckDB, which is what the correctness gate
uses (same convention as the minhash / hashed-TF families).
"""

from __future__ import annotations

from typing import Optional

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
    # zip_with pads the shorter side with null; concat_ws SKIPS nulls, so
    # the padded last slot yields the bare final token (no space) — the
    # contains-a-space filter is what drops it (tokens themselves can
    # never contain one: they were split on whitespace)
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


def _bucket_dist(
    df: DataFrame, text_col: str, name: str, buckets: int, hash_fn: str
) -> DataFrame:
    """(bucket, <name>) — pool-level hashed gram counts: one explode + one
    map-side-combined bucket agg (≤ ``buckets`` result rows)."""
    grams = df.select(F.explode(_grams(text_col)).alias("g"))
    return grams.groupBy(
        _bucket(F.col("g"), buckets, hash_fn).alias("bucket")
    ).agg(F.count("*").alias(name))


def _weights_from_dists(
    tdist: DataFrame, rdist: DataFrame, buckets: int, alpha: float
) -> DataFrame:
    """(bucket, weight) from two (bucket, count) tables.  The smoothing
    totals are window sums over the joined table — ≤ ``buckets`` rows
    through one task (bounded by construction), and part of the same plan
    as the weights themselves, so building the broadcast table costs no
    extra pass over either pool."""
    joined = tdist.join(rdist, "bucket", "full").select(
        "bucket",
        F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
    )
    tot = Window.partitionBy()  # ≤ buckets rows — bounded single task
    tot_t = F.sum("ct").over(tot)
    tot_r = F.sum("cr").over(tot)
    w = F.log((F.col("ct") + alpha) / (tot_t + alpha * buckets)) - F.log(
        (F.col("cr") + alpha) / (tot_r + alpha * buckets)
    )
    return joined.select("bucket", w.alias("weight"))


def _target_dist_checked(
    target: DataFrame, text_col: str, buckets: int, hash_fn: str
) -> DataFrame:
    """The target pool's bucket distribution, localCheckpoint'ed (one pass
    over the — small, by DSIR's design — target) and verified non-empty:
    a zero-gram target would silently degenerate every weight to
    ln(α/α·B) − ln p_raw, i.e. "select the rarest-bucket docs", which is
    never what the caller meant.  Fail fast instead (mirrors the
    quality_labels empty-seed guard in the prep pipeline)."""
    t = _bucket_dist(target, text_col, "ct", buckets, hash_fn).localCheckpoint()
    if not t.head(1):
        raise ValueError(
            "dsir: the target pool has no grams (empty frame, or all "
            "text null/blank) — importance weights would be meaningless"
        )
    return t


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    *,
    buckets: int = 65536,
    hash_fn: str = "xxhash64",
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, weight) with weight = ln p̂_target(bucket) − ln p̂_raw(bucket),
    both Laplace-smoothed: p̂(b) = (count_b + alpha) / (total + alpha·buckets).
    At most ``buckets`` rows — broadcastable by construction.  Consuming
    the result costs one tokenization pass over each pool (the totals are
    windowed into the same plan, not collected).  Raises if the target
    pool has no grams.  Only ``text_col`` is read from either frame — the
    target needs no id column."""
    t = _target_dist_checked(target, text_col, buckets, hash_fn)
    r = _bucket_dist(raw, text_col, "cr", buckets, hash_fn)
    return _weights_from_dists(t, r, buckets, alpha)


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
    return _score_counts(counts, weights, id_col)


def _score_counts(
    counts: DataFrame, weights: DataFrame, id_col: str
) -> DataFrame:
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
    score_decimals: Optional[int] = 6,
    gumbel_seed: Optional[int] = None,
) -> DataFrame:
    """Select the ``budget`` raw documents whose hashed-n-gram profile is
    most target-like: weights → scores → global top-``budget`` by
    (score desc, id asc).  ``length_normalize`` divides by the gram count
    so long documents don't dominate.

    ``gumbel_seed`` enables the paper's actual selection rule — Gumbel
    top-k resampling (top-k of score + Gumbel(0,1) noise ≡ sampling
    ``budget`` docs without replacement ∝ exp(score)), which diversifies
    the mixture instead of hard-thresholding it.  The noise is a
    DETERMINISTIC function of (seed, doc id) — xxhash64 → uniform →
    −ln(−ln u) — so the draw is reproducible across runs, partitionings
    and cluster sizes, unlike ``F.rand``.  The returned ``dsir_score`` is
    the noised value actually ranked on.

    Determinism: a double sum accumulates in partition order, so two docs
    whose true scores differ only by reassociation noise could otherwise
    swap across the budget boundary between runs.  ``score_decimals``
    (default 6) quantizes the score BEFORE ranking — FP-noise "ties"
    become exact ties and fall to the id tie-break, making the selected
    set stable across cluster sizes/partitionings.  Pass ``None`` for the
    raw double (exact-arithmetic laws, e.g. the unit tests).

    The raw corpus is tokenized exactly once: the per-doc bucket counts
    are localCheckpoint'ed and reused for both the raw distribution and
    the scoring join.  The global top-k is a TakeOrdered (per-partition
    top-k then merge) — no full sort of the corpus.

    Returns (id, dsir_score, rank)."""
    if budget <= 0:
        raise ValueError(f"dsir_select: budget must be positive, got {budget}")
    # one tokenization pass over raw, materialized (PageRank's idiom);
    # both consumers below read the checkpointed blocks
    counts = hashed_gram_counts(
        raw, text_col, id_col, buckets=buckets, hash_fn=hash_fn
    ).localCheckpoint()
    rdist = counts.groupBy("bucket").agg(F.sum("c").alias("cr"))
    t = _target_dist_checked(target, text_col, buckets, hash_fn)
    w = _weights_from_dists(t, rdist, buckets, alpha)
    s = _score_counts(counts, w, id_col)
    score = (
        (F.col("dsir_score") / F.col("n_grams"))
        if length_normalize
        else F.col("dsir_score")
    )
    if gumbel_seed is not None:
        # u ∈ (0,1): hash of (seed, id) scaled into the OPEN unit
        # interval.  The modulus is 2^52 — NOT 2^61 — so every value and
        # the +0.5 offset are exactly representable as doubles (< 2^53):
        # u is strictly inside (0,1) with no rounding to an endpoint,
        # where ln(−ln u) would go NULL and silently drop the doc.  One
        # JVM intrinsic per doc, no RNG state.
        u = (
            F.pmod(
                F.xxhash64(F.lit(int(gumbel_seed)), F.col(id_col)),
                F.lit(2**52),
            ).cast("double")
            + 0.5
        ) / F.lit(float(2**52))
        score = score + (-F.log(-F.log(u)))
    if score_decimals is not None:
        score = F.round(score, score_decimals)
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
