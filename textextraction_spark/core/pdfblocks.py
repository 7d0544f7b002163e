"""PDF path — layout-aware block extraction (SURVEY.md §2.1 S2/S3).

The reference rasterizes PDFs at 300 DPI (``Pdf-To-ImageStream/
Convert.cs:9-34``) and OCRs each page back into a block tree
(``Worker.cs:144-200``).  We skip the raster/OCR round-trip entirely: the
``html:binary`` column carries the PDF bytes and we parse the text content
streams directly — page -> text block (``BT .. ET``) -> reading-order sort
(top-to-bottom, then left-to-right), mirroring the reference's
page -> block -> line traversal order.

Scope: minimal PDF 1.4 subset (the fixture format per FIXTURES.md §2.4):
per page one content stream, blocks of the form

    BT x y Td (text) Tj ET
    BT a b c d e f Tm [(s1) kern (s2)] TJ ET     (matrix + show-array form)

with PDF string escapes (named + octal), stored either raw or as a
**FlateDecode** (zlib) compressed stream —
``<< /Filter /FlateDecode /Length N >> stream ... endstream`` — which is
how virtually every real-world PDF stores content streams (FlateDecode is
plain zlib, stdlib-decodable; no external dependency).  Compressed
streams are inflated in a pre-pass, then parsed identically to raw ones.
A corrupt flate stream raises (→ the row's ``error`` column).

Coordinates are PDF user-space-ish integer "pixels"; origin bottom-left, so
reading order = y DESCENDING, then x ascending.  Anything outside this
subset yields an empty Doc with an error recorded by the caller (image-only
PDFs would additionally need the reference's OCR path).
"""

from __future__ import annotations

import re
import zlib

from textextraction_spark.core.model import Doc, Line, Page

PDF_MAGIC = b"%PDF"

_PAGE_SPLIT = re.compile(rb"%%PageBreak")
# Block = BT ... ET where the body consumes (string literals) atomically,
# so an 'ET' INSIDE a show string (e.g. `(BUDGET)`) cannot terminate the
# block early.  (Found by the hypothesis escape-roundtrip property.)
_BT_ET = re.compile(rb"BT((?:\((?:[^()\\]|\\.)*\)|[^(])*?)ET", re.DOTALL)
_TD = re.compile(rb"(-?\d+)\s+(-?\d+)\s+Td")
# text matrix: a b c d e f Tm — (e, f) is the position; real PDFs place
# text with Tm at least as often as Td
_TM = re.compile(
    rb"(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?\d+)\s+(-?\d+)\s+Tm"
)
# show operators: (string) Tj  OR  [(s1) kern (s2) ...] TJ (strings
# concatenated, kerning numbers ignored — the dominant real-world form).
# The TJ-array body consumes (string literals) atomically so a ']' or
# '(' INSIDE a show string cannot truncate the array match.
_SHOW = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*Tj"
    rb"|\[((?:\((?:[^()\\]|\\.)*\)|[^\[\]()])*)\]\s*TJ",
    re.DOTALL,
)
_TJ_STR = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_ESC = re.compile(rb"\\([nrtbf()\\]|[0-7]{1,3})")

# FlateDecode object: dict carrying /Filter /FlateDecode, then the stream
# keyword; /Length (when present) slices the exact payload — binary zlib
# bytes may legally contain the "endstream" token, so the length is
# authoritative and the token search is only the fallback.
_FLATE_OBJ = re.compile(rb"<<(?P<dict>[^>]*?/FlateDecode[^>]*?)>>\s*stream\r?\n")
_LENGTH = re.compile(rb"/Length\s+(\d+)")
_ENDSTREAM = re.compile(rb"\s*endstream")


def is_pdf(data: bytes) -> bool:
    return data[:4] == PDF_MAGIC


def _inflate_streams(data: bytes) -> bytes:
    """Replace every FlateDecode stream object with its inflated content
    (raising ValueError on corrupt zlib — surfaced via the error column).
    Non-flate bytes pass through untouched, so mixed raw/compressed PDFs
    parse with one code path."""
    if b"/FlateDecode" not in data:
        return data
    out = bytearray()
    pos = 0
    for m in _FLATE_OBJ.finditer(data):
        if m.start() < pos:  # overlapping match inside a consumed stream
            continue
        start = m.end()
        lm = _LENGTH.search(m.group("dict"))
        if lm:
            end = start + int(lm.group(1))
        else:
            em = _ENDSTREAM.search(data, start)
            end = em.start() if em else len(data)
        try:
            inflated = zlib.decompress(data[start:end])
        except zlib.error as e:
            raise ValueError(f"corrupt FlateDecode stream: {e}") from None
        em = _ENDSTREAM.search(data, end)
        tail = em.end() if em else len(data)
        out += data[pos : m.start()]
        out += inflated
        pos = tail
    out += data[pos:]
    return bytes(out)


_ESC_MAP = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    """PDF string escapes: named (\\n \\r \\t \\b \\f \\( \\) \\\\) and
    1-3 digit octal codes (\\101 == 'A')."""

    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if g.isdigit():
            return bytes([int(g, 8) & 0xFF])
        return _ESC_MAP[g]

    return _ESC.sub(sub, raw).decode("latin-1")


def parse_pdf(data: bytes) -> Doc:
    """PDF bytes -> Doc with reading-order-sorted lines per page."""
    data = _inflate_streams(data)
    pages: list[Page] = []
    offset = 0
    body_parts = _PAGE_SPLIT.split(data)
    page_no = 0
    for part in body_parts:
        blocks: list[tuple[int, int, str]] = []  # (x, y, text)
        for seg in _BT_ET.finditer(part):
            body = seg.group(1)
            tm = _TM.search(body)
            if tm:
                x, y = int(tm.group(5)), int(tm.group(6))
            else:
                td = _TD.search(body)
                x, y = (int(td.group(1)), int(td.group(2))) if td else (0, 0)
            texts = []
            for m in _SHOW.finditer(body):
                if m.group(1) is not None:  # (s) Tj
                    texts.append(_unescape(m.group(1)))
                else:  # [(s1) k (s2) ...] TJ — concatenate show strings
                    texts.append(
                        "".join(
                            _unescape(s.group(1)) for s in _TJ_STR.finditer(m.group(2))
                        )
                    )
            text = " ".join(t for t in texts if t).strip()
            if text:
                blocks.append((x, y, text))
        if not blocks:
            continue
        page_no += 1
        # Reading order: top-to-bottom (y descending — PDF origin is
        # bottom-left), then left-to-right.
        blocks.sort(key=lambda b: (-b[1], b[0]))
        lines: list[Line] = []
        for i, (x, y, text) in enumerate(blocks):
            start = offset
            end = start + len(text)
            # Synthetic pixel bbox: block origin + 8px/char x 16px line.
            bbox = (x, y, x + 8 * len(text), y + 16)
            lines.append(
                Line(
                    page=page_no,
                    line_no=i + 1,
                    text=text,
                    start=start,
                    end=end,
                    bbox=bbox,
                )
            )
            offset = end + 1
        pages.append(Page(page_no=page_no, lines=lines))

    # Confidence: parse coverage — fraction of BT..ET segments that yielded
    # text (1.0 for well-formed fixtures), analog of mean OCR confidence.
    n_segs = len(_BT_ET.findall(data))
    n_lines = sum(len(p.lines) for p in pages)
    conf = (n_lines / n_segs) if n_segs else 0.0
    return Doc(pages=pages, confidence=conf, is_pdf=True)
