"""Document chunking: fixed-token windows with overlap.

The standard pre-training / RAG preprocessing step the reference has no
analog for (gulfstream-h/ksql is a query client): split each document into
``chunk_tokens``-token windows advancing by ``chunk_tokens - overlap``,
carrying (doc_id, chunk_idx, chunk text, token count).

Spark-first: the whole operator is one codegen'd projection — tokenize
(functions/text.words, shared with the dedup family), build the chunk
index range with ``sequence``, and slice/join per chunk via
``transform`` + ``posexplode``.  No shuffle at all: chunking is
embarrassingly parallel per document, so the plan is scan -> project ->
generate, and downstream dedup/similarity operators shuffle on their own
keys.  DuckDB twin: sql_chunk_documents (same normalize/split/slice
formula), so chunk boundaries are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import SQL_WORDS, words


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, chunk_idx, chunk, n_tokens); documents with no tokens
    produce no chunks; the final window may be shorter than chunk_tokens."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    toks = words(F.col(text_col))
    n = F.size(toks)
    # ceil((n - overlap) / stride), at least 1 when the doc has any tokens
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_tokens),
    )
    return (
        df.select(F.col(id_col), chunks.alias("__chunks"))
        .select(F.col(id_col), F.posexplode("__chunks").alias("chunk_idx", "__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.array_join("__toks", " ").alias("chunk"),
            F.size("__toks").cast("bigint").alias("n_tokens"),
        )
    )


def sql_chunk_documents(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """DuckDB oracle twin of chunk_documents over the documents table."""
    stride = chunk_tokens - overlap
    w = SQL_WORDS.format(c="text")
    return f"""
        WITH t AS (SELECT doc_id, {w} AS toks FROM documents),
        c AS (
            SELECT doc_id, toks,
                   unnest(range(greatest(ceil((len(toks) - {overlap}) / {stride})::bigint, 1))) AS chunk_idx
            FROM t
        ),
        s AS (
            SELECT doc_id, chunk_idx,
                   toks[(chunk_idx * {stride} + 1):(chunk_idx * {stride} + {chunk_tokens})] AS ctoks
            FROM c
        )
        SELECT doc_id, chunk_idx, array_to_string(ctoks, ' ') AS chunk,
               len(ctoks)::bigint AS n_tokens
        FROM s WHERE len(ctoks) > 0
    """
