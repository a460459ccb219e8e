"""Multimodal curation job: near-dup dedup (image DCT-pHash, audio
robust-fingerprint) + optional image normalization over a
``media(media_id, kind, payload)`` parquet table — the spark-submit
surface of ``plans/media_pipeline.media_prep``.

Output: the full verdict table at ``--output`` (one row per input row:
keeper / is_keeper / resized / resize_error — callers filter
``is_keeper`` for the curated corpus; dropping non-keepers here would
make the dedup unauditable); a one-line JSON metrics summary on stdout.
Usage::

    spark-submit jobs/media_job.py \
      --input media.parquet --output curated/ \
      --resize 256x256 --image-max-hamming 3 --audio-max-hamming 6
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="media parquet (media_id, kind, payload)")
    ap.add_argument("--output", required=True, help="verdict table out")
    ap.add_argument("--image-max-hamming", type=int, default=3)
    ap.add_argument("--audio-max-hamming", type=int, default=6)
    ap.add_argument("--bucket-cap", type=int, default=100_000)
    ap.add_argument("--resize", default=None, metavar="WxH",
                    help="normalize image keepers to this size (PNG re-encode)")
    ap.add_argument("--master", default=None,
                    help="local testing only; omit under spark-submit")
    args = ap.parse_args()

    resize_to = None
    if args.resize:
        w, _, h = args.resize.lower().partition("x")
        resize_to = (int(w), int(h))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from readability_php_spark.plans.media_pipeline import media_prep

    builder = SparkSession.builder.appName("media-curation")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    media = spark.read.parquet(args.input)
    out = media_prep(
        media,
        image_max_hamming=args.image_max_hamming,
        audio_max_hamming=args.audio_max_hamming,
        bucket_cap=args.bucket_cap,
        resize_to=resize_to,
    ).localCheckpoint()  # metrics aggs below must not re-run the chains
    out.write.mode("overwrite").parquet(args.output)

    agg = out.groupBy("kind").agg(
        F.count("*").alias("rows"),
        F.sum(F.col("is_keeper").cast("long")).alias("keepers"),
        F.sum(F.col("resized").cast("long")).alias("resized"),
    )
    metrics = {
        r.kind: {"rows": r.rows, "keepers": r.keepers, "resized": r.resized}
        for r in agg.collect()
    }
    print(json.dumps({"output": args.output, "kinds": metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
