"""Composed multimodal curation pipeline — the media twin of
``training_pipeline.run_training_prep``: one call takes a raw
``media(media_id, kind, payload)`` table through per-kind near-duplicate
detection (image DCT-pHash, audio robust-fingerprint — both signature-once
→ pigeonhole pairs → connected components) and optional image
normalization, returning one verdict row per input row so callers filter
(never rejoin) to materialize the curated corpus.

Scale shape: each kind's signature pass is one Arrow-batched
``mapInPandas`` over only that kind's rows; everything downstream operates
on (media_id, int64) relations — payload bytes enter a shuffle exactly
once, and only when ``resize_to`` rewrites image keepers.  Per-kind chains
are independent, so Spark schedules them concurrently within the one job.

``media_id`` must be unique per row (the standard media-table contract —
every verdict join below keys on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.audio_dedup import audio_fingerprint_dedup
from ..operators.image_dedup import phash_image_dedup
from ..operators.multimodal import resize_images


def media_prep(
    media: DataFrame,
    *,
    image_max_hamming: int = 3,
    audio_max_hamming: int = 6,
    bucket_cap: "int | None" = 100_000,
    resize_to: "tuple[int, int] | None" = None,
    fake_decode: bool = False,
) -> DataFrame:
    """media(media_id, kind, payload) → the same rows plus curation
    verdicts: ``(media_id, kind, payload, keeper, is_keeper, resized)``.

    - image rows: DCT-pHash near-dup groups (Hamming ≤
      ``image_max_hamming``), keep-lowest-id; with ``resize_to=(w, h)``
      keeper payloads are rewritten to the normalized PNG (``resized``
      flags which rows were) — the thumbnail/normalize stage before
      batching to a vision encoder.
    - audio rows: gain-invariant fingerprint groups (Hamming ≤
      ``audio_max_hamming``), keep-lowest-id.
    - video and undecodable rows: kept (``keeper = media_id``) — a row
      the signature pass cannot judge is never silently dropped; its
      decode error is auditable via ``extract_media_features`` /
      ``compute_audio_fingerprint``.

    ``df.filter("is_keeper")`` is the curated corpus.  Deterministic end
    to end (signature laws, lowest-id keepers, PNG re-encode)."""
    img = phash_image_dedup(
        media,
        max_hamming=image_max_hamming,
        bucket_cap=bucket_cap,
        fake_decode=fake_decode,
    ).select("media_id", "keeper", "is_keeper")
    aud = audio_fingerprint_dedup(
        media, max_hamming=audio_max_hamming, bucket_cap=bucket_cap
    ).select("media_id", "keeper", "is_keeper")
    verdicts = img.unionByName(aud)
    out = (
        media.join(verdicts, "media_id", "left")
        .withColumn("keeper", F.coalesce(F.col("keeper"), F.col("media_id")))
        .withColumn("is_keeper", F.coalesce(F.col("is_keeper"), F.lit(True)))
    )
    if resize_to is None:
        return out.withColumn("resized", F.lit(False))
    w, h = resize_to
    # rewrite ONLY image keepers; the resize pass decodes just those rows
    keeper_images = out.filter(
        (F.col("kind") == "image") & F.col("is_keeper")
    ).select("media_id", "kind", "payload")
    rz = resize_images(keeper_images, w, h).select(
        "media_id", F.col("payload").alias("_rz_payload")
    )
    return (
        out.join(rz, "media_id", "left")
        .withColumn("resized", F.col("_rz_payload").isNotNull())
        .withColumn(
            "payload", F.coalesce(F.col("_rz_payload"), F.col("payload"))
        )
        .drop("_rz_payload")
    )
