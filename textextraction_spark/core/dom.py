"""S3 replacement — HTML bytes -> block stream (SURVEY.md §2.1 S3).

The reference materializes documents by walking Tesseract's 4-level
Block -> Para -> TextLine -> Word iterator in traversal order
(``TextExtraction/Worker.cs:144-200``).  Our documents are HTML, so the
analog is a DOM walk in document order: stdlib ``html.parser`` events are
folded into a flat stream of *text blocks*, one per block-level element,
each carrying link-density and ancestor metadata for the boilerplate
classifier (boilerplate.py).

Determinism contract: the block stream is a pure function of the bytes —
no wall clock, no randomness, no per-batch state — which is what makes
extracted text byte-identical at any parallelism (north_rule).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# Elements that start/end a text block (CSS display:block-ish set).
BLOCK_TAGS = frozenset(
    """address article aside blockquote body caption dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr li main nav ol
    option p pre section select summary table tbody td tfoot th thead tr ul
    br""".split()
)

# Subtrees whose text is never content.
# NOTE: <head> itself is NOT skipped — a malformed doc missing </head>
# would swallow the whole body; <title> covers the only head text.
SKIP_TAGS = frozenset("script style noscript template svg iframe title".split())

# Ancestor tags that mark a block as structural boilerplate regardless of
# its link density (tag-path classification per the north_star).
BOILER_ANCESTORS = frozenset("nav footer header aside form select option".split())

_WS = re.compile(r"\s+")


@dataclass
class RawBlock:
    """One block-level run of inline text, pre-classification."""

    index: int  # document order
    text: str  # whitespace-normalized
    n_words: int
    n_link_words: int  # words inside <a>
    boiler_ancestor: bool  # under nav/footer/header/aside/...
    tag_path: str  # e.g. "body/div/p" (outermost block ancestry)

    @property
    def link_density(self) -> float:
        return self.n_link_words / self.n_words if self.n_words else 0.0


class _BlockCollector(HTMLParser):
    """Fold parser events into RawBlocks.  Tolerates malformed HTML
    (unclosed tags, stray end tags) — stack ops are best-effort, matching
    how lenient real-world crawl parsing must be."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[RawBlock] = []
        self._parts: list[tuple[str, bool]] = []  # (text, in_link)
        self._stack: list[str] = []
        self._skip_depth = 0
        self._link_depth = 0
        self._boiler_depth = 0

    # -- block lifecycle ------------------------------------------------
    def _flush(self) -> None:
        if not self._parts:
            return
        raw = "".join(t for t, _ in self._parts)
        text = _WS.sub(" ", raw).strip()
        if text:
            # Recompute word-level link attribution on normalized text:
            # count words of each part separately.
            n_words = 0
            n_link = 0
            for t, in_link in self._parts:
                w = len(t.split())
                n_words += w
                if in_link:
                    n_link += w
            n_words = max(n_words, len(text.split()))
            self.blocks.append(
                RawBlock(
                    index=len(self.blocks),
                    text=text,
                    n_words=len(text.split()),
                    n_link_words=min(n_link, len(text.split())),
                    boiler_ancestor=self._boiler_depth > 0,
                    tag_path="/".join(self._stack[-4:]),
                )
            )
        self._parts = []

    # -- parser events --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag != "br" and tag != "hr":
                self._stack.append(tag)
                if tag in BOILER_ANCESTORS:
                    self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in ("br", "hr"):
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in BLOCK_TAGS and tag not in ("br", "hr"):
            self._flush()
            # best-effort unwind to the matching open tag
            if tag in self._stack:
                while self._stack:
                    popped = self._stack.pop()
                    if popped in BOILER_ANCESTORS:
                        self._boiler_depth = max(0, self._boiler_depth - 1)
                    if popped == tag:
                        break
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth > 0 or not data:
            return
        self._parts.append((data, self._link_depth > 0))

    def close(self) -> None:  # flush trailing text of malformed docs
        super().close()
        self._flush()


def parse_blocks(html_bytes: bytes) -> list[RawBlock]:
    """HTML bytes -> ordered RawBlocks.  Decoding: UTF-8 with latin-1
    fallback (crawl data is dirty; the fallback never raises)."""
    try:
        text = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        text = html_bytes.decode("latin-1")
    p = _BlockCollector()
    try:
        p.feed(text)
        p.close()
    except Exception:
        # html.parser is robust, but never let one bad doc kill a batch;
        # return whatever was collected (error surfaced by caller).
        p._flush()
    return p.blocks
