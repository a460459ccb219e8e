"""Deterministic, content-keyed sampling and dataset splitting.

Training pipelines need splits that are (a) stable across reruns and
cluster sizes, (b) disjoint, and (c) reproducible OUTSIDE Spark (so an
offline evaluator can re-derive membership).  ``rand()``-based sampling
fails all three.  These operators key every decision on a hash of a
content-stable column (url / doc key):

    u = first 8 hex digits of md5(key || '#' || seed)  →  uint32

and compare against integer thresholds ``floor(fraction * 2^32)`` — pure
column algebra, exactly reproducible in any engine with md5 (the DuckDB
oracle replays it digit-for-digit).

Scale shape: a narrow map — no shuffle, no state; the split column
composes with partitioned writes (``partitionBy("split")``) for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32  # md5 prefix space


def hash_uniform(key: Column, seed: int = 42) -> Column:
    """uint32 drawn uniformly from md5(key || '#seed') — the first 8 hex
    digits, decoded.  Deterministic, engine-portable (md5 is everywhere;
    xxhash64 is Spark-only)."""
    return F.conv(
        F.substring(F.md5(F.encode(F.concat(key, F.lit(f"#{seed}")), "UTF-8")), 1, 8),
        16,
        10,
    ).cast("bigint")


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "url", seed: int = 42
) -> DataFrame:
    """Keep ~``rate`` of rows, decided per-row by content hash: stable under
    reruns, re-partitioning, and cluster-size changes (unlike df.sample)."""
    threshold = int(rate * _BUCKETS)
    return df.filter(hash_uniform(F.col(key_col), seed) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    key_col: str = "url",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to exactly one named split by cumulative integer
    thresholds over the key hash.  Fractions must sum to 1 (the last split
    absorbs the rounding remainder so every row lands somewhere)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    u = hash_uniform(F.col(key_col), seed)
    expr = F.lit(names[-1])  # last split takes the remainder
    acc = 0.0
    conds = []
    for name in names[:-1]:
        acc += fractions[name]
        conds.append((int(acc * _BUCKETS), name))
    for threshold, name in reversed(conds):
        expr = F.when(u < F.lit(threshold), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def hash_sample_by(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str,
    key_col: str = "url",
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Stratified deterministic sampling: per-group keep rates (e.g. keep
    100% of low-resource languages, 5% of English).  Same md5-threshold
    machinery as ``hash_sample`` — membership is a pure function of
    (key, seed, group rate), so resamples are supersets/subsets when only
    the rate moves.  The rate table is a literal CASE expression (no join)."""
    u = hash_uniform(F.col(key_col), seed)
    expr = F.lit(int(default_rate * _BUCKETS))
    for g, r in sorted(rates.items()):
        expr = F.when(F.col(group_col) == g, F.lit(int(r * _BUCKETS))).otherwise(expr)
    return df.filter(u < expr)


def temperature_sample(
    df: DataFrame,
    group_col: str = "lang",
    key_col: str = "url",
    temperature: float = 2.0,
    seed: int = 42,
) -> DataFrame:
    """Multilingual temperature resampling (the mBERT/XLM-R recipe):
    sampling probability q_l ∝ p_l^(1/T), so T>1 flattens the language
    distribution toward the low-resource tail.  Expressed as per-document
    keep rates r_l = (n_min/n_l)^(1-1/T), normalized so the rarest group
    keeps everything (pure downsampling — deterministic, no upsampling
    duplication), then applied with the same md5-threshold machinery as
    ``hash_sample``: membership is a pure function of (key, seed, group
    counts), stable across reruns and cluster sizes.

    Rates are rounded to 6 decimals before thresholding so the oracle's
    libm pow agrees bit-for-bit after rounding.

    Scale shape: one map-side-combined count agg (rows = #groups, tiny) →
    rate arithmetic on that tiny frame → broadcast join back → scan-side
    filter.  No global window, no second pass over the data."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        group_col,
        F.round(
            F.pow(F.col("_n_min") / F.col("_n"), 1.0 - 1.0 / temperature), 6
        ).alias("_rate"),
    )
    thr = F.floor(F.col("_rate") * _BUCKETS).cast("bigint")
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_uniform(F.col(key_col), seed) < thr)
        .drop("_rate")
    )
