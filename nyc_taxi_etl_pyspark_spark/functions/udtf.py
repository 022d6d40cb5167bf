"""Python UDTF surface (SURVEY.md §2.10 extension — the reference has no
UDF/UDAF/UDTF at all; this completes the engine's function-surface tour:
built-in Catalyst exprs → pandas_udf → mapInPandas →
applyInPandasWithState → UDTF).

One production-shaped UDTF: the document CHUNKER — split a document into
fixed-size token windows with overlap, the standard pre-tokenization step
for LLM training and RAG indexing. One input row fans out to N chunk rows
inside the Python worker (no explode shuffle; same scale argument as
``operators/multimodal.py::frame_sample``).

UDTFs are the slow path (row-at-a-time Python). The chunker earns it:
per-row fan-out with data-dependent cardinality and string assembly is
awkward as a single Catalyst expression, and the UDTF keeps the row
budget O(chunks), never materializing a shuffled token table. For pure
counting use the built-in paths (q_token_count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

CHUNK_SIZE = 32
CHUNK_OVERLAP = 8
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


@udtf(returnType="doc_id bigint, chunk_idx int, start_tok int, n_chunk_tokens int, chunk_text string")
class ChunkDocument:
    """Yield overlapping ``CHUNK_SIZE``-token chunks every ``_STRIDE``
    tokens. Deterministic pure function of the text — oracle-checkable."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        toks = [t for t in (text or "").split(" ") if t]
        for idx, start in enumerate(range(0, len(toks), _STRIDE)):
            chunk = toks[start : start + CHUNK_SIZE]
            yield doc_id, idx, start, len(chunk), " ".join(chunk)


def chunk_documents(
    spark: SparkSession, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Apply the chunker UDTF laterally to every document."""
    spark.udtf.register("chunk_document", ChunkDocument)
    docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).createOrReplaceTempView(
        "__chunk_input"
    )
    return spark.sql(
        "SELECT c.* FROM __chunk_input AS d, "
        "LATERAL chunk_document(d.doc_id, d.text) AS c"
    )
