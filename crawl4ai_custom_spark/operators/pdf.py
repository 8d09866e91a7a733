"""PDF processing over binary columns — the multimodal seam for documents.

Reference parity: processors/pdf/processor.py (page text + metadata). Spark
re-expression: one Arrow-batched mapInPandas stage over the pdf binary
column, same shape as operators/multimodal.py — the decode kernel
(kernel/pdfmini.py) is a real stdlib FlateDecode/Tj extractor, swappable
for pdfminer on clusters that have it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.pdfmini import pdf_page_count, pdf_text

PDF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_pages", IntegerType()),
        StructField("text", StringType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def extract_pdf_text(pdfs: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """(media_id, payload binary) -> (media_id, n_pages, text, n_bytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_pages": [pdf_page_count(p) for p in payloads],
                    "text": [pdf_text(p) for p in payloads],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return pdfs.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(fn, PDF_SCHEMA)
