"""Python UDTFs (Spark 4 user-defined table functions).

The native column-expression paths (explode over transform/slice) are
ALWAYS the first choice — they run JVM-side inside codegen. A UDTF is
the escape hatch for 1→N row logic that genuinely needs Python (a
real tokenizer, a document segmenter with model state, a parser with
a third-party library): it registers as a TABLE function usable from
SQL via LATERAL, so the Python hop is contained to exactly the
fan-out step while the rest of the query stays declarative.

``ChunkDocs`` mirrors the H17/H31 non-overlapping chunker so tests
can assert UDTF output == the native plan's output row-for-row — the
contract a team porting a Python segmenter to this engine would
verify first.

Scale note: a UDTF evaluates per input row in the Python worker
(pickled batches by default; Arrow-optimized when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is on). Partition
parallelism is preserved — each task streams its rows through its own
worker — but per-row Python costs ~10-100x a codegen expression, so
the UDTF carries ONLY the fan-out column, never the full row.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, n_tokens int, chunk string")
class ChunkDocs:
    """Non-overlapping width-W token chunks of one document.

    SQL usage (after ``spark.udtf.register("chunk_docs", ChunkDocs)``):

        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk
        FROM documents d, LATERAL chunk_docs(d.text, 16) c
    """

    def eval(self, text: str, width: int):
        toks = [t for t in (text or "").split(" ") if t]
        for i in range(0, len(toks), width):
            part = toks[i : i + width]
            yield i // width, len(part), " ".join(part)


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("chunk_docs", ChunkDocs)
