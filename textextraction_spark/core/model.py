"""Document model: the analog of the reference's OCR tree.

Reference shape (ProcessedPdf -> PageData -> LineData -> WordData with
bounding boxes): ``TextExtraction/Model/ImageOcr.cs:130-165``.  Ours is the
same hierarchy with *character offsets* into the final extracted text as the
primary coordinates (the HTML path has no pixels); the PDF path additionally
carries an (x, y) block origin that is converted to the reference's
"x1,y1,x2,y2" pdf-point rect string (``TextExtraction/Helper.cs:13-17``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Word:
    """A whitespace token with [start, end) offsets into extracted_text."""

    text: str
    start: int
    end: int


@dataclass
class Line:
    """One content line (= one kept DOM block / one PDF text block).

    Mirrors LineData (``Model/ImageOcr.cs:150-160``): line_no is assigned in
    reading order exactly like the reference's ``srNo++`` traversal counter
    (``Worker.cs:155,182``).
    """

    page: int
    line_no: int
    text: str
    start: int
    end: int
    # PDF block origin in "pixel" units (x1, y1, x2, y2); None for HTML.
    bbox: tuple[int, int, int, int] | None = None
    # Lazy word cache — tokenization is ~15% of kernel time and only the
    # doc_json audit column consumes words, so they build on demand.
    _words: list[Word] | None = field(default=None, repr=False, compare=False)

    @property
    def words(self) -> list[Word]:
        if self._words is None:
            self._words = build_words(self.text, self.start)
        return self._words


@dataclass
class Page:
    """Mirrors PageData (``Model/ImageOcr.cs:141-149``)."""

    page_no: int
    lines: list[Line] = field(default_factory=list)


@dataclass
class Span:
    """An extracted field value + location — the reference's per-field
    ``{Text, PageNumber, Rectangle}`` triple (``Model/InvoiceNumber.cs:9-11``)
    extended with char offsets (our HTML-native coordinate system)."""

    field: str  # e.g. "invoice.number"
    label: str  # e.g. "INV_NUM", "PERSON", "DATE"
    text: str
    page: int
    line: int
    start: int
    end: int
    rect: str  # "x1,y1,x2,y2" pdf points for PDF blocks; "" for HTML


@dataclass
class Doc:
    """Mirrors ProcessedPdf (``Model/ImageOcr.cs:130-140``)."""

    pages: list[Page] = field(default_factory=list)
    confidence: float = 0.0
    is_pdf: bool = False

    @property
    def lines(self) -> list[Line]:
        return [ln for p in self.pages for ln in p.lines]

    def text(self) -> str:
        return "\n".join(ln.text for ln in self.lines)


def build_words(line_text: str, line_start: int) -> list[Word]:
    """Tokenize a line into whitespace words with global char offsets."""
    words: list[Word] = []
    i = 0
    n = len(line_text)
    while i < n:
        while i < n and line_text[i].isspace():
            i += 1
        if i >= n:
            break
        j = i
        while j < n and not line_text[j].isspace():
            j += 1
        words.append(Word(line_text[i:j], line_start + i, line_start + j))
        i = j
    return words


PX_TO_PT = 4.166666666666667
"""300 DPI pixels -> 72pt points, the reference's constant
(``TextExtraction/Helper.cs:13-17``, rederived at ``Worker.cs:504-524``)."""


def rect_to_pdf_points(bbox: tuple[int, int, int, int]) -> str:
    """Format a pixel bbox as the reference's "x1,y1,x2,y2" point string
    (``Helper.cs:13-17``). Two decimal places, deterministic."""
    return ",".join(f"{c / PX_TO_PT:.2f}" for c in bbox)
