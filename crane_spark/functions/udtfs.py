"""Python UDTFs (Spark 4 user-defined TABLE functions): the lateral-
join API form for one-row-in / many-rows-out expansion with imperative
per-row logic.

UDTFs run row-at-a-time Python — the SLOW path. Every hot-path
expansion in this engine uses vectorized builtins instead (explode /
posexplode: `posexplode_tokens`; windowed chunking: `doc_chunks`), and
this module exists for API parity plus the cases where the per-row
logic is genuinely imperative. The chunker here is the lateral twin of
queries/corpus.doc_chunks.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: int, chunk_text: string, n_tokens: int")
class ChunkDocument:
    """Overlapping token-window chunks of one document.

    `SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_document(d.text,
    8, 2) c` — window of ``size`` tokens advancing by ``size -
    overlap``; the final partial window is kept iff it adds tokens.
    """

    def eval(self, text: str, size: int = 8, overlap: int = 2):
        if text is None:
            return
        toks = text.split(" ")
        step = max(size - overlap, 1)
        cid = 0
        for start in range(0, max(len(toks) - overlap, 1), step):
            window = toks[start : start + size]
            if not window:
                break
            yield cid, " ".join(window), len(window)
            cid += 1
            if start + size >= len(toks):
                break


def register_udtfs(spark) -> None:
    """Expose the UDTFs to SQL (idempotent)."""
    spark.udtf.register("chunk_document", ChunkDocument)
