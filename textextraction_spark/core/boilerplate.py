"""Boilerplate classification: RawBlocks -> main-content Doc.

Boilerpipe/Readability-style heuristics (per the north_star): a block is
boilerplate iff (a) it sits under a structural boilerplate ancestor
(nav/footer/header/aside/...), or (b) its link density exceeds
``MAX_LINK_DENSITY`` (link farms, nav bars rendered as plain divs).
Kept blocks become lines of the document in reading order; joining rule is
a single ``"\\n"`` between blocks — THE byte-identity contract for
``extracted_text`` (SURVEY.md §7.4.1), frozen here and by golden tests.

Confidence is the kept-word ratio — the analog of the reference's mean OCR
confidence per document (``Worker.cs:119-128``): a page full of boilerplate
extracts with low confidence just as a noisy scan OCRs with low confidence.
"""

from __future__ import annotations

from textextraction_spark.core.dom import RawBlock, parse_blocks
from textextraction_spark.core.model import Doc, Line, Page

MAX_LINK_DENSITY = 1.0 / 3.0


def is_content_block(b: RawBlock) -> bool:
    if b.n_words == 0:
        return False
    if b.boiler_ancestor:
        return False
    if b.link_density > MAX_LINK_DENSITY:
        return False
    return True


def doc_from_blocks(blocks: list[RawBlock]) -> Doc:
    """Kept blocks -> single-page Doc with offset-tracked lines/words.

    HTML documents are one logical page (page 1); the PDF path produces
    real pages.  Line numbering restarts per page like the reference's
    ``srNo`` (``Worker.cs:155``, reset per page at ``:146``)."""
    kept = [b for b in blocks if is_content_block(b)]
    total_words = sum(b.n_words for b in blocks)
    kept_words = sum(b.n_words for b in kept)

    lines: list[Line] = []
    offset = 0
    for i, b in enumerate(kept):
        start = offset
        end = start + len(b.text)
        lines.append(
            Line(
                page=1,
                line_no=i + 1,
                text=b.text,
                start=start,
                end=end,
            )
        )
        offset = end + 1  # the "\n" joiner

    conf = (kept_words / total_words) if total_words else 0.0
    return Doc(pages=[Page(page_no=1, lines=lines)], confidence=conf, is_pdf=False)


def extract_html(html_bytes: bytes) -> Doc:
    """html bytes -> main-content Doc (pure function)."""
    return doc_from_blocks(parse_blocks(html_bytes))
