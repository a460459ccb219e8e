"""Deterministic document packing: group variable-length documents into
fixed token-budget training sequences.

Pretraining data prep concatenates documents into constant-length sequences;
the operator that decides *which documents share a sequence* must be
deterministic (resumable, auditable) and cheap at 10^12 docs.  This is the
classic greedy-by-order scheme expressed as pure window algebra:

    prefix  = sum(n_tokens) OVER (PARTITION BY group ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
    pack_id = floor(prefix / budget)

i.e. a document belongs to the pack in which its first token would land
under plain concatenation in doc_id order.  Exactly reproducible in any
SQL engine (the DuckDB oracle is the same three lines).

Scale shape: one shuffle (the window partition key).  At 10^12 docs a
single global window would serialize per group — the deployment pattern is
hierarchical: hash-bucket the corpus (part_id), pack within buckets
(window key = (group, part_id)), and let sequence ids be (bucket, pack_id)
pairs.  ``pack_documents`` takes the group columns explicitly so callers
choose the granularity; per-group work is a linear scan after the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_documents(
    docs: DataFrame,
    budget: int,
    group_cols: tuple[str, ...] = ("lang",),
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each document a ``pack_id`` within its group; documents with
    ``prefix // budget`` equal share one training sequence.  Oversized
    documents (> budget) get a pack of their own (flagged ``oversize``).
    ``passthrough_cols`` ride through unchanged — used when the packing
    order key is a derived column (e.g. a shuffle key) and the caller
    still needs the real unit id in the output."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("prefix")
    out = docs.select(
        *group_cols, order_col, tokens_col, *passthrough_cols, prefix
    )
    return out.select(
        *group_cols,
        order_col,
        tokens_col,
        *passthrough_cols,
        F.floor(F.col("prefix") / budget).cast("bigint").alias("pack_id"),
        (F.col(tokens_col) > budget).alias("oversize"),
    )


def pack_documents_bucketed(
    docs: DataFrame,
    budget: int,
    buckets: int = 64,
    group_cols: tuple[str, ...] = ("lang",),
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bucket_col: str | None = None,
) -> DataFrame:
    """The hierarchical deployment pattern of ``pack_documents``, as code:
    hash-bucket each group's documents and pack within ``(group, bucket)``,
    so a sequence id is the ``(bucket, pack_id)`` pair.  A single global
    window per group serializes that group through one task at 10^12 docs;
    bucketing bounds every window partition at ~1/``buckets`` of the group
    while keeping determinism (the bucket is a content hash of the order
    key, not a partition-dependent id).

    ``bucket_col`` overrides the default ``pmod(xxhash64(order_col))``
    bucketing with a caller-computed column — used by the oracle gate,
    where the bucket function must be replayable outside Spark."""
    if bucket_col is None:
        docs = docs.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col(order_col)), F.lit(buckets)).cast("int"),
        )
    elif bucket_col != "bucket":
        docs = docs.withColumn("bucket", F.col(bucket_col))
    return pack_documents(
        docs,
        budget,
        group_cols=(*group_cols, "bucket"),
        order_col=order_col,
        tokens_col=tokens_col,
    )


def pack_stats(packed: DataFrame, budget: int,
               group_cols: tuple[str, ...] = ("lang",),
               tokens_col: str = "n_tokens") -> DataFrame:
    """Per-pack fill metrics: tokens, docs, fill ratio (how much of the
    budget the pack actually uses — the waste metric packing exists to
    minimize).  ``tokens_col`` mirrors pack_documents' parameter so a
    pack built over e.g. n_chars needs no rename."""
    return (
        packed.groupBy(*group_cols, "pack_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum(tokens_col).alias("tokens"),
        )
        .withColumn("fill", F.round(F.col("tokens") / budget, 4))
    )


def chunk_documents_by_cost(
    docs: DataFrame,
    cost_vocab: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking under a PER-WORD COST model — the
    trained-tokenizer complement of :func:`chunk_documents`: window
    budgets are measured in real tokenizer tokens (``cost_vocab`` maps
    ``word → word_tokens``, e.g. from
    :func:`~readability_php_spark.operators.bpe.bpe_word_cost_vocab`)
    instead of whitespace words, which under-count CJK/code and
    over-count prose by 1.3-2× against any real BPE vocabulary.

    Law: a word belongs to the window in which its FIRST token would
    land under plain concatenation —
    ``chunk_id = floor(cost_prefix / max_tokens)`` — the exact law
    :func:`pack_documents` applies one level up, so chunk-then-pack uses
    one budget arithmetic end to end, and the window prefix-sum is
    replayable in any SQL engine (the DuckDB gate does).  Consequences,
    both inherited from the packing law: a chunk may EXCEED
    ``max_tokens`` by up to its boundary-straddling word's cost − 1
    (costs are word-atomic — a window never splits a word), and chunk
    ids may SKIP when one word's cost spans multiple windows (they stay
    strictly increasing per document).  Windows are non-overlapping; for
    stride-overlapped windows use the whitespace
    :func:`chunk_documents` (a stride has no meaning in cost space —
    restarting a window mid-word would split a token).

    Emits ``(id_col, chunk_id, n_chunk_tokens, chunk_text)`` —
    ``n_chunk_tokens`` is the chunk's COST sum (the budget metric, what
    downstream packing should consume); words missing from
    ``cost_vocab`` cost their unmerged symbol count (chars + marker),
    matching ``bpe_token_counts``' fallback.  ``chunk_text`` is the
    chunk's words re-joined with single spaces (the same lossy-
    whitespace normalization ``chunk_documents`` documents).

    Scale shape: one corpus word explode → broadcast join against the
    vocabulary-sized cost relation → ONE hash shuffle on the doc id
    (the window; the per-(id, chunk) re-aggregation reuses the same
    partitioning).  No stage is quadratic; the cost relation is always
    the broadcast side."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )
    words = (
        docs.select(F.col(id_col).alias("id"), toks.alias("a"))
        .filter(F.size("a") > 0)
        .select("id", F.posexplode("a").alias("pos", "word"))
    )
    costed = words.join(
        F.broadcast(cost_vocab.select("word", "word_tokens")), "word", "left"
    ).select(
        "id",
        "pos",
        "word",
        F.coalesce(
            F.col("word_tokens"), F.length("word") + F.lit(1)
        ).alias("cost"),
    )
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = costed.select(
        "id",
        "pos",
        "word",
        "cost",
        F.floor((F.sum("cost").over(w) - F.col("cost")) / max_tokens)
        .cast("bigint")
        .alias("chunk_id"),
    )
    return (
        assigned.groupBy("id", "chunk_id")
        .agg(
            F.sum("cost").alias("n_chunk_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.getField("word"),
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_id",
            "n_chunk_tokens",
            "chunk_text",
        )
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document's token sequence into
    windows of ``max_tokens``, advancing ``stride`` tokens per window
    (stride < max_tokens → overlapping windows, the standard way long
    documents enter a fixed-context model without losing cross-boundary
    text).  Emits ``(id, chunk_id, n_chunk_tokens, chunk_text)``; chunk 0
    starts at token 0, chunk k at token k*stride, and the last window may
    be short.  Token = whitespace run, matching token_count/text_analysis.
    Once a window reaches the document's end no further starts are
    emitted: with stride < max_tokens the next window would be a strict
    suffix of it (already fully covered), and duplicated tail text in the
    training stream is exactly what chunking must not introduce.

    **Text normalization**: case is PRESERVED, but ``chunk_text`` is the
    tokens re-joined with single spaces — runs of whitespace (including
    newlines, i.e. line/paragraph structure) collapse to one space.  That
    is inherent to token-indexed windowing without offset bookkeeping;
    callers that need verbatim text with structure intact should treat
    chunking as opt-in lossy (``run_training_prep`` documents the same).

    This is the upstream complement of ``pack_documents``: chunking cuts
    oversized documents DOWN to the context budget, packing stitches
    small ones UP to it; run chunk → pack for constant-length batches.

    Scale shape: pure per-row column algebra — tokenize once, generate
    window starts with ``sequence``, slice+join per window, one explode.
    No shuffle; output rows ≈ ceil(n/stride) per doc, cost linear in
    (overlap factor × corpus tokens).  Degenerate strides are rejected
    (stride > max_tokens would silently drop the tokens between windows).
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    stride = max_tokens if stride is None else stride
    if not 1 <= stride <= max_tokens:
        raise ValueError("stride must be in [1, max_tokens]")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col).alias("id"), toks.alias("a")).filter(
        F.size("a") > 0
    )
    # window starts 0, stride, 2*stride, ... < n  (1-based for slice),
    # stopping once a window covers the end: a start s > 0 whose
    # predecessor already reached n (s - stride + max_tokens >= n) would
    # emit a strict suffix of that predecessor
    starts = F.filter(
        F.expr(f"sequence(0, size(a) - 1, {stride})"),
        lambda s: (s == F.lit(0))
        | (s + F.lit(max_tokens - stride) < F.size("a")),
    )
    chunks = base.select(
        "id",
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.slice(F.col("a"), s + 1, max_tokens),
            )
        ).alias("chunk_id", "ctoks"),
    )
    return chunks.select(
        F.col("id").alias(id_col),
        "chunk_id",
        F.size("ctoks").alias("n_chunk_tokens"),
        F.array_join("ctoks", " ").alias("chunk_text"),
    )
