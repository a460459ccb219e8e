"""The composed training-data prep pipeline: raw crawl pages → packed,
deduped, scrubbed, split training text.

This is the end-to-end shape a pretraining data team actually runs, built
entirely from this repo's operators:

    pages (url, html, ...)
      └─ extract_operator          # Arrow-batched kernel, error column
      └─ filter(error IS NULL)
      └─ scrub_pii                 # email/IPv4 redaction (JVM regex)
      └─ exact_dedup               # md5-fingerprint keep-lowest-id
      └─ line_dedup                # cross-corpus boilerplate lines
      └─ quality + length filters  # token count / quality score / repetition
      └─ hash_split                # deterministic train/val/test
      └─ pack_documents            # token-budget sequence packing
      └─ write partitionBy(split)

Every stage is deterministic (content-keyed hashes, no rand()), so the
whole pipeline is re-runnable and auditable: the same corpus always yields
the same training set, regardless of cluster size or partitioning.

Scale notes: stages 1-3 are narrow maps over the scan; exact_dedup is one
32-byte-key aggregate; line_dedup is one md5-key aggregate + reassembly;
split is a map; packing is one window per (split, lang); the final write
shuffles on split for compact output.  Nothing here is quadratic and no
stage moves the raw HTML after extraction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Configuration
from ..operators.dedup import exact_dedup, line_dedup
from ..operators.extract import extract_operator
from ..operators.packing import pack_documents
from ..operators.sampling import hash_split
from ..operators.scrub import scrub_pii
from ..operators.text_analysis import token_count
from .pipeline import tune_session_for_extraction


@dataclass
class PrepResult:
    output_path: str
    docs_in: int
    docs_extracted: int
    docs_after_dedup: int
    docs_final: int
    split_counts: dict


def run_training_prep(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    *,
    config: Optional[Configuration] = None,
    min_tokens: int = 20,
    pack_budget: int = 2048,
    fractions: Optional[dict] = None,
    line_min_count: int = 2,
) -> PrepResult:
    """pages(url, html[, lang]) → packed training rows at ``output_path``
    (parquet, partitioned by split), plus conservation metrics."""
    tune_session_for_extraction(spark)
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    docs_in = pages.count()

    extracted = extract_operator(
        pages, config or Configuration(substitute_entities=True)
    ).filter(F.col("error").isNull()).select("url", "extracted_text")
    # id = content-stable hash of the url (packing/split need a sortable id)
    docs = extracted.select(
        F.xxhash64("url").alias("doc_id"), "url",
        F.col("extracted_text").alias("text"),
    )
    docs = docs.persist()
    docs_extracted = docs.count()

    scrubbed = scrub_pii(docs, text_col="text", out_col="text_s").select(
        "doc_id", "url", F.col("text_s").alias("text")
    )
    # exact dedup BEFORE line dedup: identical docs must collapse to one
    # kept copy, not have all their (shared) lines deleted from each other
    unique_docs = exact_dedup(scrubbed)
    cleaned = line_dedup(
        unique_docs, text_col="text", min_count=line_min_count
    ).join(unique_docs.select("doc_id", "url"), "doc_id")
    docs_after_dedup = cleaned.count()

    with_tokens = cleaned.select(
        "doc_id", "url", F.col("text_clean").alias("text"),
        token_count(F.col("text_clean")).alias("n_tokens"),
    ).filter(F.col("n_tokens") >= min_tokens)

    split = hash_split(with_tokens, fractions, key_col="url")
    packed = pack_documents(
        split, budget=pack_budget, group_cols=("split",),
        order_col="doc_id", tokens_col="n_tokens",
    ).join(split.select("doc_id", "url", "text"), "doc_id")

    packed.repartition("split").write.mode("overwrite").partitionBy(
        "split"
    ).parquet(output_path)

    out = spark.read.parquet(output_path)
    split_counts = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    docs.unpersist()
    return PrepResult(
        output_path=output_path,
        docs_in=docs_in,
        docs_extracted=docs_extracted,
        docs_after_dedup=docs_after_dedup,
        docs_final=sum(split_counts.values()),
        split_counts=split_counts,
    )
