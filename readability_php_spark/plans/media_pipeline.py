"""Composed multimodal curation pipeline — the media twin of
``training_pipeline.run_training_prep``: one call takes a raw
``media(media_id, kind, payload)`` table through per-kind near-duplicate
detection (image DCT-pHash, audio robust-fingerprint — both signature-once
→ pigeonhole pairs → connected components) and optional image
normalization, returning one verdict row per input row so callers filter
(never rejoin) to materialize the curated corpus.

Scale shape: each kind's signature pass is one Arrow-batched
``mapInPandas`` over only that kind's rows, and every dedup relation is
(media_id, int64).  The payload-bearing ``media`` relation shuffles once
in the verdict join (verdicts are O(rows) — not broadcastable at corpus
scale), and ``resize_to`` adds a second, keeper-only payload join.

Execution note: CALLING ``media_prep`` runs the two dedup chains — their
signature relations are eagerly ``localCheckpoint``-ed and connected
components is an iterative action loop — serially, image then audio,
before the returned DataFrame sees any caller action.  That is the same
call-time-jobs contract as ``phash_image_dedup``/``run_training_prep``;
only the final verdict/resize joins stay lazy.

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
    verdicts: ``(media_id, kind, payload, keeper, is_keeper, resized[,
    resize_error])``.

    - image rows: DCT-pHash near-dup groups (Hamming ≤
      ``image_max_hamming``), keep-lowest-id; with ``resize_to=(w, h)``
      keeper payloads are rewritten to the normalized PNG (``resized``
      flags which rows were; a keeper whose re-decode fails keeps its
      original payload and carries ``resize_error``) — the
      thumbnail/normalize stage before batching to a vision encoder.
      ``resize_to`` requires real decoding and is rejected under
      ``fake_decode=True`` (fake signatures would dedup, then every
      resize would silently fail).
    - audio rows: gain-invariant fingerprint groups (Hamming ≤
      ``audio_max_hamming``), keep-lowest-id.
    - video and undecodable rows: kept (``keeper = media_id``) — a row
      the signature pass cannot judge is never silently dropped; its
      decode error is auditable via ``extract_media_features`` /
      ``compute_audio_fingerprint``.

    ``df.filter("is_keeper")`` is the curated corpus.  Deterministic end
    to end (signature laws, lowest-id keepers, PNG re-encode)."""
    if resize_to is not None and fake_decode:
        raise ValueError("resize_to requires real decoding (fake_decode=False)")
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
    # rewrite ONLY image keepers; the resize pass decodes just those rows.
    # Failures surface as resize_error (original payload kept) — a silent
    # pass-through would make resize_to unauditable.
    keeper_images = out.filter(
        (F.col("kind") == "image") & F.col("is_keeper")
    ).select("media_id", "kind", "payload")
    rz = resize_images(keeper_images, w, h).select(
        "media_id",
        F.col("payload").alias("_rz_payload"),
        F.col("error").alias("resize_error"),
    )
    return (
        out.join(rz, "media_id", "left")
        .withColumn("resized", F.col("_rz_payload").isNotNull())
        .withColumn(
            "payload", F.coalesce(F.col("_rz_payload"), F.col("payload"))
        )
        .drop("_rz_payload")
    )
