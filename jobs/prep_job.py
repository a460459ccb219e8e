"""spark-submit entry point for the composed training-data prep pipeline.

    spark-submit \
      --py-files $(python -c 'from readability_php_spark.deploy import package_zip_path as p; print(p())') \
      jobs/prep_job.py \
      --input  s3://bucket/pages/ \
      --output s3://bucket/training_set/ \
      --min-tokens 50 --pack-budget 2048 --train 0.98 --val 0.01 --test 0.01

Chains extract → scrub_pii → exact_dedup → fuzzy_dedup (MinHash-LSH →
Jaccard verify → connected components; skip with --no-fuzzy) → line_dedup
→ token/quality filters → optional model-based filter (train a logistic
classifier in-job from --quality-labels, a parquet of (url, label 0/1)
seed judgments, then drop docs scoring under --quality-threshold) →
hash_split → pack_documents per (split, lang) → split-partitioned parquet
(see plans/training_pipeline.py for the stage-by-stage scale notes).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="training-data prep pipeline")
    ap.add_argument("--input", required=True, help="pages parquet path/table")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--train", type=float, default=0.9)
    ap.add_argument("--val", type=float, default=0.05)
    ap.add_argument("--test", type=float, default=0.05)
    ap.add_argument("--line-min-count", type=int, default=2)
    ap.add_argument("--no-fuzzy", action="store_true",
                    help="skip the near-duplicate (MinHash-LSH) stage")
    ap.add_argument("--fuzzy-threshold", type=float, default=0.8,
                    help="n-gram Jaccard threshold for verified near-dups")
    ap.add_argument("--quality-labels", default=None,
                    help="parquet of (url, label) seed judgments; trains an "
                         "in-job logistic quality classifier")
    ap.add_argument("--quality-threshold", type=float, default=0.5)
    ap.add_argument("--quality-dim", type=int, default=64,
                    help="hashed-TF feature dimension for the classifier")
    ap.add_argument("--quality-iters", type=int, default=20)
    ap.add_argument("--c4-rules", action="store_true",
                    help="apply the C4 line-level cleanup + doc flags")
    ap.add_argument("--gopher-rules", action="store_true",
                    help="apply the Gopher doc-level quality rule set")
    ap.add_argument("--substring-n", type=int, default=None,
                    help="enable exact duplicated-substring removal (Lee "
                         "et al. ExactSubstr): cut corpus-wide duplicated "
                         "N-token runs from all but one copy")
    ap.add_argument("--substring-keep", default="first",
                    choices=("first", "none"),
                    help="'first' keeps the earliest copy of each "
                         "duplicated run; 'none' cuts every copy")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of exemplar target docs (text column); "
                         "enables DSIR importance selection")
    ap.add_argument("--dsir-budget", type=int, default=None,
                    help="how many most-target-like docs DSIR keeps")
    ap.add_argument("--shuffle-seed", type=int, default=None,
                    help="seeded deterministic global shuffle before "
                         "packing (mixes sources within each training "
                         "sequence; default keeps url order)")
    ap.add_argument("--chunk-max-tokens", type=int, default=None,
                    help="context-window chunking before packing: cut "
                         "each doc into windows of this many tokens "
                         "(whitespace tokens, or trained-BPE tokens "
                         "under --tokenizer-dir)")
    ap.add_argument("--chunk-stride", type=int, default=None,
                    help="window stride for overlapped chunking "
                         "(whitespace mode only)")
    ap.add_argument("--tokenizer-dir", default=None,
                    help="trained-BPE tokenizer dir holding merges/ and "
                         "vocab/ parquet (bpe_train's merge_table and "
                         "encoded_vocab written with df.write.parquet): "
                         "switches min-tokens / chunk / pack budgets "
                         "from whitespace words to real tokenizer "
                         "tokens")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="stage-checkpoint path: the extract+dedup output "
                         "commits here and a rerun resumes from it")
    ap.add_argument("--master", default=None, help="local testing only; omit under spark-submit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from readability_php_spark.plans.training_pipeline import run_training_prep

    builder = SparkSession.builder.appName("training-data-prep")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    pages = spark.read.parquet(args.input)

    # The classifier (if requested) trains INSIDE run_training_prep, on
    # the labeled urls' text exactly as the scoring stage sees it —
    # extract → scrub → dedup → line-dedup → token filter — closing the
    # train/serve feature skew a pre-pipeline trainer can't avoid
    # (line_dedup's counts come from the full corpus and can't be
    # replayed on a seed set).
    labels = None
    if args.quality_labels:
        labels = spark.read.parquet(args.quality_labels).select("url", "label")
        # labels.count() is a one-column scan of the tiny seed parquet
        print(f"quality classifier will train on {labels.count()} labeled docs")

    res = run_training_prep(
        spark,
        pages,
        args.output,
        min_tokens=args.min_tokens,
        pack_budget=args.pack_budget,
        fractions={"train": args.train, "val": args.val, "test": args.test},
        line_min_count=args.line_min_count,
        fuzzy=not args.no_fuzzy,
        fuzzy_threshold=args.fuzzy_threshold,
        c4_rules=args.c4_rules,
        gopher_rules=args.gopher_rules,
        substring_n=args.substring_n,
        substring_keep=args.substring_keep,
        quality_labels=labels,
        dsir_target=(
            spark.read.parquet(args.dsir_target).select("text")
            if args.dsir_target
            else None
        ),
        dsir_budget=args.dsir_budget,
        quality_dim=args.quality_dim,
        quality_iters=args.quality_iters,
        classifier_threshold=args.quality_threshold,
        chunk_max_tokens=args.chunk_max_tokens,
        chunk_stride=args.chunk_stride,
        tokenizer=(
            (
                spark.read.parquet(args.tokenizer_dir.rstrip("/") + "/merges"),
                spark.read.parquet(args.tokenizer_dir.rstrip("/") + "/vocab"),
            )
            if args.tokenizer_dir
            else None
        ),
        shuffle_seed=args.shuffle_seed,
        checkpoint_dir=args.checkpoint_dir,
    )
    print(
        f"done: in={res.docs_in} extracted={res.docs_extracted} "
        f"after_dedup={res.docs_after_dedup} final={res.docs_final} "
        f"splits={res.split_counts} output={res.output_path}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
