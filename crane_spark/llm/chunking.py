"""Document chunking and sequence packing for training-data prep.

* chunk_documents — slice each document's token stream into fixed-size
  windows with overlap (the context-window prep step before
  tokenization). Pure array ops (sequence/slice/explode): narrow, no
  shuffle, codegen all the way — a 100 TB corpus chunks at scan speed.
* pack_by_token_budget — assign documents to fixed-token-budget packs
  (the sequence-packing step that minimizes padding waste). Greedy
  first-fit is inherently sequential, so the scalable variant packs by
  CUMULATIVE token count within an orderable partition (source): one
  window cumsum, deterministic output, and pack boundaries that are
  stable under reruns. Bins overfill by at most one document, the
  standard streaming-packing tradeoff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each doc into overlapping token windows.

    Window i covers tokens [i*stride, i*stride + chunk_tokens); the
    last window may be short. Returns (id, chunk_idx, chunk_text,
    chunk_tokens).
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(stride))).cast("int")
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    i = F.col("chunk_idx")
    piece = F.slice(toks, i * stride + 1, chunk_tokens)
    return (
        docs.select(F.col(id_col), toks.alias("_toks"), F.explode(idxs).alias("chunk_idx"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(F.col("_toks"), i * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.size(F.slice(F.col("_toks"), i * stride + 1, chunk_tokens))
            .cast("long")
            .alias("chunk_len"),
        )
    )


def pack_by_token_budget(
    docs: DataFrame,
    order_col: str = "doc_id",
    partition_col: str = "source",
    text_col: str = "text",
    budget: int = 2048,
) -> DataFrame:
    """Assign each doc a pack_id such that consecutive docs (by
    `order_col`, within `partition_col`) share a pack until the token
    budget is exhausted. pack_id = floor(cumulative_tokens_before /
    budget), with the running total from `exact_prefix_sum` — the
    naive `sum OVER (PARTITION BY source ...)` window hands one task
    per source a corpus-sized sort (source has a handful of values),
    while the bucketed construction runs B parallel cell cumsums per
    source and offsets them with aggregate-row arithmetic. Bit-equal
    to the window, no driver loop, no data-sized partition."""
    from crane_spark.operators.indexing import exact_prefix_sum

    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    d = exact_prefix_sum(
        docs.select(partition_col, order_col, n_tok.alias("n_tokens")),
        measure="n_tokens",
        key=order_col,
        tiebreaks=[],
        out="_cum_before",
        major=partition_col,
        exclusive=True,
    )
    return d.withColumn(
        "pack_id",
        F.floor(F.col("_cum_before") / F.lit(float(budget))).cast("long"),
    ).drop("_cum_before")
