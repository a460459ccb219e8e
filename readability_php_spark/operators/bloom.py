"""Bloom-filter membership pruning for wave-incremental exact dedup.

At 100 TB the corpus fingerprint table has ~10^10-10^11 rows; a new
crawl wave must be anti-joined against it to drop already-seen
documents, and that anti-join re-shuffles the (huge) corpus side every
wave.  The standard fix is a Bloom filter maintained ALONGSIDE the
corpus: probe the wave against the filter first (no corpus access —
"definitely new" documents short-circuit past the join entirely), and
run the exact anti-join only for the bloom-positive candidates.  The
filter can only produce false POSITIVES, and every positive is exactly
verified, so the end-to-end result is bit-identical to the plain
anti-join — which is precisely what the correctness tests assert
(the differential suite) — while the expensive join shrinks from
O(wave) probes to O(true dups + fp_rate·wave).

Representation: the filter is itself a **relation**, ``(widx bigint,
bits bigint)`` — bit i of word ``widx`` set ⇔ filter bit
``widx*64 + i`` set.  That keeps the whole design shuffle-native:

- **build** is one explode + ``bit_or`` groupBy over the keys (map-side
  combined; at most m/64 output rows);
- **probe** is a join of the wave's (id, widx, mask) triples against
  the filter on ``widx`` — broadcast when the filter is small (m=2^30
  bits = 128 MB of words), plain hash join co-partitioned on ``widx``
  when a 10^11-bit filter outgrows broadcast.  No driver-side bitset,
  no collect of any filter state, ever;
- **update** after a committed wave is the same build over the new
  keys unioned with the old table and re-``bit_or``-ed — an idempotent
  merge, safe to re-run on crash (the snapshot-log pattern).

Hashing: Kirsch-Mitzenmacher double hashing — position_i =
(h1 + i·h2) mod m with two independent xxhash64 views of the key —
which preserves the classic FP asymptotics with 2 hash evaluations
per key regardless of k.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_params(n_keys: int, fp_rate: float) -> tuple[int, int]:
    """(m_bits, k_hashes) minimizing space for ``n_keys`` at ``fp_rate``:
    m = -n·ln p / ln²2 (rounded up to a multiple of 64), k = m/n·ln 2."""
    if n_keys <= 0 or not (0.0 < fp_rate < 1.0):
        raise ValueError("need n_keys > 0 and 0 < fp_rate < 1")
    m = math.ceil(-n_keys * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """array<bigint> of the ``k`` filter bit positions for ``key``
    (Kirsch-Mitzenmacher: h1 + i·h2 mod m, both xxhash64-derived).
    NULL keys get an EMPTY array, not the hash of null — Spark's
    xxhash64 hashes a null input to the bare seed, which would give
    every null key the same (valid-looking) positions."""
    # reduce both hashes mod m BEFORE combining: i*h2 on the raw 64-bit
    # hash overflows long, which ANSI mode (Spark 4 default) rejects;
    # (h1m + i*h2m) mod m is the same double-hash family and k*m stays
    # far inside the long range for any practical filter size
    h1m = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2m = F.pmod(F.xxhash64(key, F.lit("bloom:h2")), F.lit(m_bits))
    positions = F.array(
        *[F.pmod(h1m + F.lit(i) * h2m, F.lit(m_bits)) for i in range(k)]
    )
    return F.when(key.isNotNull(), positions).otherwise(
        F.array().cast("array<bigint>")
    )


def _word_mask(pos_col: str) -> tuple[Column, Column]:
    """(widx, mask) for the position column NAMED ``pos_col``: 64-bit
    word index and the single-bit mask within it.  Takes a name, not a
    Column, because the shift amount must be column-valued and pyspark's
    ``F.shiftleft`` only accepts a literal shift — the mask is an
    ``F.expr`` with the name interpolated."""
    widx = F.shiftright(F.col(pos_col), 6)
    mask = F.expr(f"shiftleft(1L, cast(pmod({pos_col}, 64) as int))")
    return widx, mask


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """Build the ``(widx, bits)`` filter relation over ``keys[key_col]``
    (NULL keys are skipped — they are "uncomparable", the exact_dedup
    discipline).  One explode + map-side-combined ``bit_or``; at most
    m/64 rows out, regardless of input size."""
    pos = keys.filter(F.col(key_col).isNotNull()).select(
        F.explode(
            bloom_positions(F.col(key_col), m_bits, k)
        ).alias("pos")
    )
    widx, mask = _word_mask("pos")
    return (
        pos.select(widx.alias("widx"), mask.alias("mask"))
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two filter relations built with the SAME (m_bits, k) — the
    idempotent after-wave update."""
    return (
        a.unionByName(b)
        .groupBy("widx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    docs: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    id_col: str = "doc_id",
    out_col: str = "maybe_seen",
    broadcast_filter: bool = True,
) -> DataFrame:
    """Annotate ``docs`` with ``out_col``: TRUE iff every one of the
    key's k filter bits is set (bloom-positive — a candidate duplicate,
    to be exactly verified), FALSE iff any bit is unset (definitely
    never inserted) or the key is NULL (uncomparable ⇒ never seen).

    The probe is (id, key, widx, mask) ⋈ filter on widx —
    ``broadcast_filter`` chooses an explicit broadcast (the common case:
    the filter is MBs); pass False at 10^11-bit scale to let the planner
    hash-join co-partitioned on widx.  The k-bit AND is keyed on
    ``(id_col, key_col)``, NOT id alone: a wave carrying the same id
    with two different keys (crash-retry / overlapping-shard ingestion)
    must not AND one key's bits against the other's — that would
    manufacture the false negatives the filter contract forbids."""
    flt = F.broadcast(bloom) if broadcast_filter else bloom
    pos = docs.select(
        F.col(id_col),
        F.col(key_col),
        F.explode(
            bloom_positions(F.col(key_col), m_bits, k)
        ).alias("pos"),
    )
    widx, mask = _word_mask("pos")
    probed = (
        pos.select(id_col, key_col, widx.alias("widx"), mask.alias("mask"))
        .join(flt, "widx", "left")
        .select(
            id_col,
            key_col,
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) != 0)
            ).alias("hit"),
        )
    )
    per_key = probed.groupBy(id_col, key_col).agg(
        F.min("hit").alias(out_col)  # min(boolean) = logical AND
    )
    return docs.join(per_key, [id_col, key_col], "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(False))
    )


def bloom_incremental_exact_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Wave-incremental exact dedup with Bloom pruning: every input row
    of ``new_docs`` comes back unchanged with ``(bloom_candidate,
    is_dup)`` appended — callers keep the survivors with
    ``.filter(~F.col("is_dup"))``, no rejoin (a rejoin on the id alone
    would collapse per-ROW verdicts when an id repeats with different
    texts).  ``is_dup`` is EXACT — equal to a plain fingerprint
    semi-join against the corpus (the filter only prunes which wave
    rows reach that join; false positives are verified away, and false
    negatives are impossible by construction).  NULL text is
    uncomparable ⇒ never a dup (exact_dedup's discipline).

    Shape per wave: build/refresh the filter over corpus fingerprints
    (one map-side-combined agg — in a maintained deployment this table
    is persisted and merged per wave via ``bloom_merge``, not rebuilt),
    probe the wave (filter-sized broadcast join), then semi-join ONLY
    the bloom-positive candidates against the corpus fingerprints."""
    from .text_analysis import fingerprint

    fp = fingerprint(F.col(text_col))
    corpus_fp = corpus_docs.select(fp.alias("fp")).filter(
        F.col("fp").isNotNull()
    )
    bloom = bloom_build(corpus_fp, "fp", m_bits, k)
    wave = new_docs.withColumn("_bloom_fp", fp)
    probed = bloom_probe(
        wave, bloom, "_bloom_fp", m_bits, k,
        id_col=id_col, out_col="bloom_candidate",
    )
    # verification is keyed on (id, fp) and deduplicated: a wave id that
    # appears with two texts must get a per-ROW verdict, and a wave row
    # duplicated verbatim must not fan out through the verdict join
    candidates = probed.filter(F.col("bloom_candidate")).select(
        F.col(id_col), F.col("_bloom_fp")
    ).distinct()
    confirmed = candidates.join(
        corpus_fp, candidates["_bloom_fp"] == corpus_fp["fp"], "left_semi"
    ).select(
        F.col(id_col).alias("_dup_id"), F.col("_bloom_fp").alias("_dup_fp")
    )
    return (
        probed.join(
            confirmed,
            (probed[id_col] == confirmed["_dup_id"])
            & (probed["_bloom_fp"] == confirmed["_dup_fp"]),
            "left",
        )
        .withColumn("is_dup", F.col("_dup_id").isNotNull())
        .drop("_bloom_fp", "_dup_id", "_dup_fp")
    )
