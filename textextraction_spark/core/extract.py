"""Document-level extraction: bytes in -> (text, spans, confidence) out.

The per-document orchestration the reference spreads over ``RunOcr`` +
``ExtractMedicalData`` + ``ExtractInvoiceData`` (``Worker.cs:96-200,
201-281, 282-457``), as one pure function.  Routing mirrors the reference's
single input kind becoming two here: ``%PDF``-sniffed bytes take the layout
block path, everything else the HTML DOM path.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from textextraction_spark.core.boilerplate import extract_html
from textextraction_spark.core.model import Doc, Span
from textextraction_spark.core.pdfblocks import NoTextLayerError, is_pdf, parse_pdf
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

# HTML5 encoding sniff (whatwg "determining the character encoding"):
# a BOM outranks every other signal; with no BOM, a ``<meta charset=...>``
# / ``http-equiv Content-Type`` declaration in the prescan window decides.
# UTF-32 BOMs are checked before UTF-16 (the UTF-32-LE BOM *starts with*
# the UTF-16-LE BOM).
_UNICODE_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

# Spec prescan reads the first 1024 bytes; real pages routinely declare
# late, so use a 2048-byte window (still O(1) per doc).
_META_PRESCAN_BYTES = 2048

# Prescan tokenization (whatwg "prescan a byte stream"): comments are
# skipped, and only an actual <meta> tag's attributes count — a bare
# regex over the window matched 'charset=' inside comments and inside
# arbitrary attribute values (e.g. a meta description MENTIONING a
# charset) and mangled valid pages.
_PRESCAN_COMMENT = re.compile(rb"<!--.*?(?:-->|\Z)", re.DOTALL)
_META_TAG = re.compile(rb"<meta[\s/][^>]{0,1024}?>", re.IGNORECASE)
_META_ATTR = re.compile(
    rb"""([a-zA-Z-]+)\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)""",
)
_CONTENT_CHARSET = re.compile(
    rb"charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:\-]+)", re.IGNORECASE
)

# Codecs that already match the downstream scanner's native decode
# (UTF-8 with latin-1 fallback) — declaring them is a no-op, so skip the
# transcode round-trip.
_UTF8_ALIASES = frozenset({"utf-8", "ascii", "iso8859-1", "latin-1"})

# whatwg encoding labels Python's codec registry doesn't know or maps
# differently: x-user-defined is defined by the Encoding Standard as a
# windows-1252-superset for legacy form submission — cp1252 is the
# closest stream decode.
_LABEL_ALIASES = {"x-user-defined": "cp1252", "unicode": "utf-16-le"}


def _sniff_meta_charset(window: bytes) -> str | None:
    """The declared charset per the prescan rules, or None: comments
    stripped, then the first <meta> carrying either a ``charset``
    attribute or an ``http-equiv=Content-Type`` + ``content=...charset``
    pair."""
    window = _PRESCAN_COMMENT.sub(b"", window)
    for tag in _META_TAG.finditer(window):
        attrs: dict[bytes, bytes] = {}
        for m in _META_ATTR.finditer(tag.group(0)):
            v = m.group(2)
            if v[:1] in (b'"', b"'"):
                v = v[1:-1]
            attrs.setdefault(m.group(1).lower(), v)
        if b"charset" in attrs:
            label = attrs[b"charset"]
        elif (
            attrs.get(b"http-equiv", b"").lower() == b"content-type"
            and b"content" in attrs
        ):
            cm = _CONTENT_CHARSET.search(attrs[b"content"])
            if not cm:
                continue
            label = cm.group(1)
        else:
            continue
        return label.strip(b" \t'\"").decode("ascii", "replace")
    return None

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


def _transcode(
    data: bytes, label: str, from_meta: bool = False
) -> bytes | None:
    """UTF-8 bytes for ``data`` decoded as ``label``, or None when the
    label is unknown (caller keeps the original bytes) or already an
    identity encoding for the downstream scanner.

    ``from_meta``: the whatwg prescan mandates that a META-declared
    UTF-16/32 label be read as UTF-8 — a BOM-less document whose meta
    tag was prescannable as ASCII-compatible bytes cannot actually BE
    UTF-16, and honoring the label literally destroys valid pages."""
    import codecs

    label = _LABEL_ALIASES.get(label.lower(), label)
    try:
        name = codecs.lookup(label).name
    except LookupError:
        return None
    if from_meta and (name.startswith("utf-16") or name.startswith("utf-32")):
        return None  # spec: prescanned UTF-16 label means UTF-8
    if name in _UTF8_ALIASES:
        return None
    try:
        return data.decode(name, "replace").encode("utf-8")
    except Exception:
        return None  # non-stream-safe codec edge: keep original bytes


def normalize_charset(data: bytes, declared: str | None = None) -> bytes:
    """Transcode a non-UTF-8 HTML payload to UTF-8 bytes, following the
    HTML5 sniffing precedence (BOM > declared ``<meta charset>``), so the
    downstream byte-level scanner sees one canonical encoding.

    Real Common-Crawl HTML is far from uniformly UTF-8 — windows-125x,
    KOI8-R, Shift_JIS, GB2312, and UTF-16-with-BOM pages are all common,
    and the previous utf-8→latin-1 fallback silently turned every one of
    them into mojibake "content".  The reference never faces this (its
    OCR path rasterizes pixels), so the behavior here follows the web
    platform spec rather than the reference.

    Robustness contract: pure function, never raises; an unknown or
    undecodable declared charset leaves the bytes untouched (the
    scanner's own utf-8/latin-1 fallback still applies), and decode uses
    errors="replace" so a single mis-declared page cannot kill a batch.

    ``declared`` is a TRANSPORT-level charset label (an HTTP
    ``Content-Type: ...; charset=`` header carried alongside the payload,
    e.g. from a WARC record's envelope).  whatwg precedence: BOM >
    transport > meta — when a transport label is present and KNOWN, the
    in-document meta is not consulted at all (consulting both was the
    round-3 double-transcode bug: the transport pass yields UTF-8 bytes
    whose stale meta then re-transcoded them into mojibake).
    """
    for bom, codec in _UNICODE_BOMS:
        if data.startswith(bom):
            return data[len(bom):].decode(codec, "replace").encode("utf-8")
    if declared:
        import codecs

        try:
            codecs.lookup(_LABEL_ALIASES.get(declared.lower(), declared))
        except LookupError:
            pass  # unknown transport label: fall through to the meta sniff
        else:
            out = _transcode(data, declared)
            return data if out is None else out
    label = _sniff_meta_charset(data[:_META_PRESCAN_BYTES])
    if label:
        out = _transcode(data, label, from_meta=True)
        if out is not None:
            return out
    return data


def normalize_bytes(data: bytes, declared_charset: str | None = None) -> bytes:
    """Common-Crawl payload normalization, applied before routing: WARC
    payloads are frequently stored gzip-compressed (possibly as multiple
    concatenated members), and real-world HTML often leads with a UTF-8
    BOM.  Both are transport artifacts — the extraction contract is over
    the underlying document, so they are stripped here (gzip first: a BOM
    can only appear on decompressed bytes).  A payload that starts with
    the gzip magic but fails to inflate — corrupt, truncated, or past the
    MAX_INFLATE_BYTES bomb guard — raises TransportError: compressed junk
    must land in the ``error`` column, not flow through the HTML parser
    as gibberish "content".  Non-PDF payloads additionally pass the HTML5
    charset sniff (normalize_charset) so UTF-16-with-BOM and
    meta-declared-windows-125x/Shift_JIS/... pages decode as their
    authors intended instead of as latin-1 mojibake."""
    if data[:2] == _GZIP_MAGIC:
        data = _bounded_gunzip(data, MAX_INFLATE_BYTES)
    if data[:3] == _UTF8_BOM:
        data = data[3:]
    if not is_pdf(data):
        # HTML route only: PDF bytes carry their own string encodings and
        # must reach the layout parser untouched.  Ordering matters: the
        # charset sniff runs on DECODED content bytes (a gzip-stored
        # body's transport charset describes the inflated text, and
        # transcoding compressed bytes would corrupt them — round-3 bug).
        data = normalize_charset(data, declared=declared_charset)
    return data


def extract_document(
    data: bytes,
    encrypt_phi: bool = False,
    declared_charset: str | None = None,
) -> ExtractResult:
    """Pure function of the document bytes (north_rule determinism) —
    plus, optionally, the transport-declared charset label that real
    crawl envelopes (HTTP headers inside WARC records) carry alongside
    the payload.

    encrypt_phi mirrors the reference's ``EnableEncryption`` flag
    (``Worker.cs:238-250``): patient fields' span text is replaced by its
    deterministic fixed-IV AES ciphertext (core/crypt.py, F9)."""
    try:
        data = normalize_bytes(data, declared_charset=declared_charset)
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
    except NoTextLayerError:
        # image-only (scanned) PDF: a legitimate per-row OUTCOME, not a
        # parse failure — a stable machine-readable error token so users
        # can route these rows to an OCR stage (the reference's path)
        return ExtractResult(
            extracted_text="",
            spans=[],
            confidence=0.0,
            is_pdf=True,
            n_lines=0,
            error="no_text_layer",
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
