"""LLM-backed strategy boundary: real Spark plumbing, stubbed model call.

Reference parity targets (both OUT OF SCOPE as external services, per
SURVEY.md §2.7/§2.8): ``LLMContentFilter``
(/root/reference/crawl4ai/content_filter_strategy.py:780-1060) and
``LLMExtractionStrategy`` (/root/reference/crawl4ai/extraction_strategy.py:
493-988). The reference chunks the page, sends each chunk to a hosted model,
and caches by md5.

What IS real here (and tested): the Spark shape — chunk the text column,
batch chunks through one Arrow stage, call a pluggable client once per
chunk, reassemble per-doc results in order, md5-keyed de-duplication of
identical chunks within a batch (the reference's cache, scoped to the
batch). The model call itself is behind ``LLMClient``:

  - ``StubLLMClient``   deterministic extractive fake (first-k sentences) —
                        CI-safe, no network, documents the contract
  - a real client would wrap an API SDK; it plugs in without touching the
    dataflow (the closure ships only the client object)
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


class LLMClient:
    """Model-call boundary. complete(prompt) -> str."""

    def complete(self, prompt: str) -> str:  # pragma: no cover - interface
        raise NotImplementedError(
            "external LLM services are out of scope in this environment; "
            "plug in a client wrapping your API SDK"
        )


class StubLLMClient(LLMClient):
    """Deterministic fake: 'summarize' = keep the first k sentences."""

    def __init__(self, max_sentences: int = 2):
        self.max_sentences = max_sentences

    def complete(self, prompt: str) -> str:
        body = prompt.rsplit("\n---\n", 1)[-1]
        return " ".join(_SENT_RE.split(body.strip())[: self.max_sentences])


LLM_FILTER_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("fit_text", StringType()),
    ]
)


def llm_content_filter(
    docs: DataFrame,
    client: LLMClient,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 2000,
    instruction: str = "Extract the main content as markdown.",
) -> DataFrame:
    """(id, fit_text): per-doc 'fit' content via chunked model calls.

    One mapInPandas stage; chunks dedup by md5 within the batch (reference
    cache semantics), calls arrive in deterministic order, per-doc output
    is the in-order join of its chunks' completions."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict[str, str] = {}
            out_ids, out_txt = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                parts = []
                for i in range(0, max(len(text), 1), chunk_chars):
                    chunk = text[i : i + chunk_chars]
                    key = hashlib.md5(chunk.encode()).hexdigest()
                    got = cache.get(key)
                    if got is None:
                        got = cache[key] = client.complete(
                            f"{instruction}\n---\n{chunk}"
                        )
                    parts.append(got)
                out_ids.append(str(did))
                out_txt.append("\n\n".join(p for p in parts if p))
            yield pd.DataFrame({"id": out_ids, "fit_text": out_txt})

    return docs.select(id_col, text_col).mapInPandas(fn, LLM_FILTER_SCHEMA)
