"""Document-level extraction: bytes in -> (text, spans, confidence) out.

The per-document orchestration the reference spreads over ``RunOcr`` +
``ExtractMedicalData`` + ``ExtractInvoiceData`` (``Worker.cs:96-200,
201-281, 282-457``), as one pure function.  Routing mirrors the reference's
single input kind becoming two here: ``%PDF``-sniffed bytes take the layout
block path, everything else the HTML DOM path.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from textextraction_spark.core.boilerplate import extract_html
from textextraction_spark.core.model import Doc, Span
from textextraction_spark.core.pdfblocks import is_pdf, parse_pdf
from textextraction_spark.core.spans import extract_spans


@dataclass
class ExtractResult:
    extracted_text: str
    spans: list[Span]
    confidence: float
    is_pdf: bool
    n_lines: int
    error: str = ""
    doc: Doc | None = field(default=None, repr=False)

    def doc_json(self) -> str:
        """Deterministic JSON of the page tree — the ``OCRText`` column
        analog (``Worker.cs:271``).  Key order pinned by json.dumps
        sort_keys for byte-identity (SURVEY.md §2.8 F10)."""
        d = self.doc
        tree = [
            {
                "page": p.page_no,
                "lines": [
                    {
                        "line": ln.line_no,
                        "text": ln.text,
                        "start": ln.start,
                        "end": ln.end,
                        "words": [[w.text, w.start, w.end] for w in ln.words],
                    }
                    for ln in p.lines
                ],
            }
            for p in (d.pages if d else [])
        ]
        return json.dumps(tree, sort_keys=True, separators=(",", ":"))


PHI_FIELDS = ("patient.name", "patient.birth_date")

_GZIP_MAGIC = b"\x1f\x8b"
_UTF8_BOM = b"\xef\xbb\xbf"

# Bounded inflate: a crawled payload claiming gzip may be a decompression
# bomb; cap the inflated size so one row can never OOM an executor.  A
# payload that is corrupt, truncated, or inflates past the cap is rejected
# wholesale via TransportError -> the row's ``error`` column (no partial
# text, and compressed junk is never routed through the HTML parser).
MAX_INFLATE_BYTES = 64 << 20


class TransportError(ValueError):
    """Raised for undecodable transport wrapping (corrupt/oversized gzip);
    caught by extract_document and surfaced in the ``error`` column."""


def _bounded_gunzip(data: bytes, limit: int) -> bytes:
    """Inflate ALL gzip members (WARC payloads are legally multi-member
    concatenations; stopping at the first member would silently truncate)
    up to ``limit`` total bytes; raises TransportError on corrupt,
    truncated, or over-limit payloads."""
    import zlib

    out: list[bytes] = []
    total = 0
    remaining = data
    try:
        while remaining:
            d = zlib.decompressobj(wbits=31)  # 31 = gzip container
            chunk = d.decompress(remaining, limit - total + 1)
            total += len(chunk)
            if total > limit or d.unconsumed_tail:
                raise TransportError(
                    f"gzip payload inflates past {limit} bytes (bomb guard)"
                )
            if not d.eof:
                raise TransportError("truncated gzip member")
            out.append(chunk)
            remaining = d.unused_data
            if remaining and remaining[:2] != _GZIP_MAGIC:
                raise TransportError("trailing garbage after gzip member")
    except zlib.error as e:
        raise TransportError(f"corrupt gzip payload: {e}") from None
    return b"".join(out)


def normalize_bytes(data: bytes) -> bytes:
    """Common-Crawl payload normalization, applied before routing: WARC
    payloads are frequently stored gzip-compressed (possibly as multiple
    concatenated members), and real-world HTML often leads with a UTF-8
    BOM.  Both are transport artifacts — the extraction contract is over
    the underlying document, so they are stripped here (gzip first: a BOM
    can only appear on decompressed bytes).  A payload that starts with
    the gzip magic but fails to inflate — corrupt, truncated, or past the
    MAX_INFLATE_BYTES bomb guard — raises TransportError: compressed junk
    must land in the ``error`` column, not flow through the HTML parser
    as gibberish "content"."""
    if data[:2] == _GZIP_MAGIC:
        data = _bounded_gunzip(data, MAX_INFLATE_BYTES)
    if data[:3] == _UTF8_BOM:
        data = data[3:]
    return data


def extract_document(data: bytes, encrypt_phi: bool = False) -> ExtractResult:
    """Pure function of the document bytes (north_rule determinism).

    encrypt_phi mirrors the reference's ``EnableEncryption`` flag
    (``Worker.cs:238-250``): patient fields' span text is replaced by its
    deterministic fixed-IV AES ciphertext (core/crypt.py, F9)."""
    try:
        data = normalize_bytes(data)
        doc = parse_pdf(data) if is_pdf(data) else extract_html(data)
        spans = extract_spans(doc)
        if encrypt_phi:
            from textextraction_spark.core.crypt import encrypt_field

            for s in spans:
                if s.field in PHI_FIELDS:
                    s.text = encrypt_field(s.text)
        return ExtractResult(
            extracted_text=doc.text(),
            spans=spans,
            confidence=doc.confidence,
            is_pdf=doc.is_pdf,
            n_lines=len(doc.lines),
            doc=doc,
        )
    except Exception as e:  # never kill a batch on one bad document
        return ExtractResult(
            extracted_text="",
            spans=[],
            confidence=0.0,
            is_pdf=False,
            n_lines=0,
            error=f"{type(e).__name__}: {e}",
        )
