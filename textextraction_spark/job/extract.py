"""The vectorized extraction operator: ``mapInPandas`` over Arrow batches.

This is the Spark face of the pure kernel (SURVEY.md §2.10): the reference
processes documents in a sequential ``foreach`` (``Worker.cs:102``); here
each executor thread pulls Arrow batches of (url, html) rows and runs the
kernel per document — per-document Python amortized per batch, zero
per-row serialization (no row-at-a-time UDFs anywhere, per input_hint).

Scale notes (100 TB design):
- The UDF consumes only (url, warc_ts, html): callers must ``select`` those
  three before mapInPandas so the parquet scan prunes ``text``/``lang``
  (mapInPandas ingests whole rows — SURVEY.md §4.2).
- html rows can be MBs; cap Arrow batch size via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in pipeline config)
  so a batch of huge pages cannot OOM an executor (SURVEY.md §7.4.4).
- Regexes/gazetteers compile once per python worker process at module
  import — the executor-singleton pattern replacing the reference's
  load-once engine init (``Worker.cs:61-95``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from textextraction_spark.core.extract import extract_document
from textextraction_spark.job.schemas import EXTRACT_OUTPUT_SCHEMA


def extract_batch(
    batches: Iterator[pd.DataFrame], encrypt_phi: bool = False
) -> Iterator[pd.DataFrame]:
    """Iterator[pd.DataFrame(url, warc_ts, html)] -> extraction results."""
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        texts: list[str] = [""] * n
        spans: list[list[dict]] = [[]] * n
        conf = [0.0] * n
        n_lines = [0] * n
        n_bytes = [0] * n
        is_pdf = [False] * n
        errors = [""] * n
        for i, data in enumerate(pdf["html"].values):
            b = bytes(data) if data is not None else b""
            r = extract_document(b, encrypt_phi=encrypt_phi)
            texts[i] = r.extracted_text
            # vars().copy() beats dataclasses.asdict ~8x (no recursion)
            spans[i] = [vars(s).copy() for s in r.spans]
            conf[i] = r.confidence
            n_lines[i] = r.n_lines
            n_bytes[i] = len(b)
            is_pdf[i] = r.is_pdf
            errors[i] = r.error
        yield pd.DataFrame(
            {
                "url": pdf["url"].values,
                "warc_ts": pdf["warc_ts"].values,
                "extracted_text": texts,
                "spans": spans,
                "confidence": conf,
                "n_lines": n_lines,
                "n_bytes": n_bytes,
                "is_pdf": is_pdf,
                "error": errors,
            }
        )


def extract_pages(pages_df, encrypt_phi: bool = False):
    """pages DataFrame -> extracted DataFrame (no lineage columns yet).

    Projects to the minimal column set FIRST so column pruning reaches the
    scan, then runs the Arrow-batched kernel.
    """
    from functools import partial

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(pages_df.sparkSession)
    fn = partial(extract_batch, encrypt_phi=encrypt_phi) if encrypt_phi else extract_batch
    return pages_df.select("url", "warc_ts", "html").mapInPandas(
        fn, schema=EXTRACT_OUTPUT_SCHEMA
    )
