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


PDF_PAGES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("page_number", IntegerType()),
        StructField("page_text", StringType()),
        StructField("n_images", IntegerType()),
        StructField("n_pages", IntegerType()),
        StructField("title", StringType()),
        StructField("author", StringType()),
        StructField("producer", StringType()),
        StructField("created", StringType()),
        StructField("modified", StringType()),
        StructField("encrypted", StringType()),
        StructField("file_size", IntegerType()),
    ]
)


def extract_pdf_pages(pdfs: DataFrame, id_col: str = "media_id",
                      payload_col: str = "payload") -> DataFrame:
    """Per-page rows with document metadata fanned onto each
    (reference PDFPage + PDFMetadata surface, processor.py:25-49): one
    row per (pdf, page) carrying page text, embedded-image count, and the
    /Info metadata (dates as ISO strings, encrypted as 'true'/'false').
    Same single mapInPandas shape as extract_pdf_text — the fan-out
    happens inside the Arrow batch, no separate explode stage."""
    from ..kernel.pdfmini import pdf_metadata, pdf_pages

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(p) if p is not None else b""
                meta = pdf_metadata(data)
                pages = pdf_pages(data) or [
                    {"page_number": 0, "text": "", "n_images": 0}
                ]
                for pg in pages:
                    rows.append({
                        "media_id": mid,
                        "page_number": pg["page_number"],
                        "page_text": pg["text"],
                        "n_images": pg["n_images"],
                        "n_pages": meta["pages"],
                        "title": meta["title"],
                        "author": meta["author"],
                        "producer": meta["producer"],
                        "created": meta["created"],
                        "modified": meta["modified"],
                        "encrypted": "true" if meta["encrypted"] else "false",
                        "file_size": meta["file_size"],
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in PDF_PAGES_SCHEMA])

    return pdfs.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(fn, PDF_PAGES_SCHEMA)
