"""Office document text extraction — DOCX (OOXML, ECMA-376) and ODT
(OpenDocument, ISO 26300) — in pure stdlib zipfile + xml.etree.

The reference extracts text from HTML and PDF documents
(/root/reference/TextExtraction/Worker.cs:144-200); real crawls also
carry office documents, and both modern formats are ZIP containers
around XML — fully decodable with the standard library, so they get
the same no-stub treatment as the media codecs:

- **DOCX**: ``word/document.xml`` — paragraphs ``w:p``, runs ``w:r``
  with text ``w:t``, explicit ``w:tab`` / ``w:br``.  Run boundaries
  are formatting artifacts (a bold word splits a run), so the
  extractor must join runs seamlessly — the fixtures split every
  paragraph at a doc_id-dependent position to pin that.
- **ODT**: ``content.xml`` — ``text:p`` under ``office:body``, with
  ``text:tab``, ``text:line-break``, and the run-collapse-resistant
  ``text:s`` (explicit spaces with a count attribute).

Both fixture families emit the SAME paragraph text for the same
doc_id, so two independent container+XML walks must agree character
for character (the office analog of the PNG/BMP/TIFF cross-codec pin),
and the DuckDB oracle rebuilds the exact text with string
concatenation + ``string_agg`` in SQL.

Supported envelope (pinned fail-soft): well-formed ZIP with the
format's main XML part; password-protected/corrupt archives, missing
parts, and malformed XML return None, never raise.

100 TB shape: identical to the extract path — synthesis and parse run
executor-side inside Arrow batches via mapInPandas; document bytes
never cross an exchange.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import functions as F

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"

# fixed DOS timestamp so the fixture zips are byte-deterministic
_ZDATE = (1980, 1, 1, 0, 0, 0)


# ------------------------------------------------------------------ fixtures
def _para_text(doc_id: int, j: int) -> str:
    v = (31 * doc_id + 17 * j) % 1000
    if j % 3 == 0:
        return f"doc {doc_id}\tpara {j} value {v}"
    return f"doc {doc_id} para {j} value {v}"


def _n_paras(doc_id: int) -> int:
    return 2 + doc_id % 5


def _zwrite(zf: zipfile.ZipFile, name: str, data: bytes,
            compress: int = zipfile.ZIP_DEFLATED) -> None:
    zi = zipfile.ZipInfo(name, date_time=_ZDATE)
    zi.compress_type = compress
    zf.writestr(zi, data)


def make_docx(doc_id: int) -> bytes:
    """Genuine minimal DOCX: [Content_Types].xml + _rels/.rels +
    word/document.xml.  Every paragraph is split into two runs at a
    doc_id-dependent character (run joins pinned); ``j % 3 == 0``
    paragraphs carry an explicit ``<w:tab/>`` between runs."""
    paras = []
    for j in range(_n_paras(doc_id)):
        text = _para_text(doc_id, j)
        if j % 3 == 0:
            left, right = text.split("\t", 1)
            runs = (
                f"<w:r><w:t xml:space=\"preserve\">{left}</w:t></w:r>"
                f"<w:r><w:tab/><w:t xml:space=\"preserve\">{right}</w:t></w:r>"
            )
        else:
            cut = 3 + (doc_id + j) % (len(text) - 4)
            runs = (
                f"<w:r><w:t xml:space=\"preserve\">{text[:cut]}</w:t></w:r>"
                f"<w:r><w:rPr><w:b/></w:rPr>"
                f"<w:t xml:space=\"preserve\">{text[cut:]}</w:t></w:r>"
            )
        paras.append(f"<w:p>{runs}</w:p>")
    document = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"
        f"<w:document xmlns:w=\"{_W}\"><w:body>"
        + "".join(paras)
        + "</w:body></w:document>"
    )
    content_types = (
        "<?xml version=\"1.0\"?>"
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/"
        "content-types\">"
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>"
        "<Override PartName=\"/word/document.xml\" ContentType=\"application/"
        "vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml\"/>"
        "</Types>"
    )
    rels = (
        "<?xml version=\"1.0\"?>"
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/"
        "2006/relationships\">"
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/"
        "officeDocument/2006/relationships/officeDocument\" "
        "Target=\"word/document.xml\"/></Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _zwrite(zf, "[Content_Types].xml", content_types.encode())
        _zwrite(zf, "_rels/.rels", rels.encode())
        _zwrite(zf, "word/document.xml", document.encode())
    return buf.getvalue()


def make_odt(doc_id: int) -> bytes:
    """Genuine minimal ODT: stored (uncompressed) ``mimetype`` first —
    the OpenDocument magic-detection requirement — + manifest +
    content.xml.  Emits the SAME text as ``make_docx`` for the same
    doc_id; one inner space per non-tab paragraph rides as an explicit
    ``<text:s/>`` element to pin that expansion."""
    paras = []
    for j in range(_n_paras(doc_id)):
        text = _para_text(doc_id, j)
        if j % 3 == 0:
            left, right = text.split("\t", 1)
            body = f"{left}<text:tab/>{right}"
        else:
            # "doc N para ..." -> exercise text:s on the second space
            head, tail = text.split(" ", 2)[0], text.split(" ", 2)[2]
            mid = text.split(" ", 2)[1]
            body = f"{head} {mid}<text:s/>{tail}"
        paras.append(f"<text:p>{body}</text:p>")
    content = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        f"<office:document-content xmlns:office=\"{_OFFICE}\" "
        f"xmlns:text=\"{_TEXT}\" office:version=\"1.2\">"
        "<office:body><office:text>"
        + "".join(paras)
        + "</office:text></office:body></office:document-content>"
    )
    manifest = (
        "<?xml version=\"1.0\"?>"
        "<manifest:manifest xmlns:manifest=\"urn:oasis:names:tc:"
        "opendocument:xmlns:manifest:1.0\">"
        "<manifest:file-entry manifest:media-type=\"application/vnd.oasis."
        "opendocument.text\" manifest:full-path=\"/\"/>"
        "<manifest:file-entry manifest:media-type=\"text/xml\" "
        "manifest:full-path=\"content.xml\"/></manifest:manifest>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _zwrite(zf, "mimetype",
                b"application/vnd.oasis.opendocument.text",
                compress=zipfile.ZIP_STORED)
        _zwrite(zf, "META-INF/manifest.xml", manifest.encode())
        _zwrite(zf, "content.xml", content.encode())
    return buf.getvalue()


# ----------------------------------------------------------------- extractors
def extract_docx_text(data: bytes) -> str | None:
    """DOCX -> newline-joined paragraph text, or None (never raises).
    Runs join seamlessly; ``w:tab`` -> TAB, ``w:br`` -> newline."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml = zf.read("word/document.xml")
        root = ET.fromstring(xml)
        paras = []
        for p in root.iter(f"{{{_W}}}p"):
            parts = []
            for node in p.iter():
                tag = node.tag
                if tag == f"{{{_W}}}t":
                    parts.append(node.text or "")
                elif tag == f"{{{_W}}}tab":
                    parts.append("\t")
                elif tag == f"{{{_W}}}br":
                    parts.append("\n")
            paras.append("".join(parts))
        return "\n".join(paras)
    except Exception:
        return None


def extract_odt_text(data: bytes) -> str | None:
    """ODT -> newline-joined paragraph text, or None (never raises).
    ``text:tab`` -> TAB, ``text:line-break`` -> newline, ``text:s`` ->
    that many spaces (default 1); tail text after inline elements is
    preserved."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml = zf.read("content.xml")
        root = ET.fromstring(xml)

        def walk(el) -> list:
            # recursive document-order assembly: a child's tail belongs
            # AFTER its own subtree, so a flat .iter() cannot order it
            parts = [el.text or ""]
            for child in el:
                tag = child.tag
                if tag == f"{{{_TEXT}}}tab":
                    parts.append("\t")
                elif tag == f"{{{_TEXT}}}line-break":
                    parts.append("\n")
                elif tag == f"{{{_TEXT}}}s":
                    c = child.get(f"{{{_TEXT}}}c") or child.get("c") or "1"
                    parts.append(" " * int(c))
                else:
                    parts.extend(walk(child))
                if child.tail:
                    parts.append(child.tail)
            return parts

        paras = []
        for p in root.iter(f"{{{_TEXT}}}p"):
            paras.append("".join(walk(p)))
        return "\n".join(paras)
    except Exception:
        return None


# ------------------------------------------------------------------ operator
OFFICE_FMTS = ["docx", "odt"]


def office_text(spark, sf_dir: str):
    """Office-document extraction path: genuine DOCX/ODT containers per
    doc (family by doc_id % 2) -> mapInPandas runs the full unzip + XML
    walk on the actual bytes and emits the extracted text plus simple
    stats.  Pytest-oracle-gated (outside the 50-query driver cap; the
    cap is pinned exactly 50 — see __spark_entry__)."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def office_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [
                (make_docx if int(i) % 2 == 0 else make_odt)(int(i))
                for i in doc_id
            ]
        )

    media = d.select("doc_id", office_udf("doc_id").alias("media"))

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("doc_id", "fmt", "n_paras", "n_chars", "text")
        for pdf in batches:
            rows = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"].values, pdf["media"].values):
                fam = int(doc_id) % 2
                txt = (extract_docx_text if fam == 0 else extract_odt_text)(
                    bytes(blob)
                )
                rows["doc_id"].append(doc_id)
                rows["fmt"].append(OFFICE_FMTS[fam])
                if txt is None:
                    rows["n_paras"].append(0)
                    rows["n_chars"].append(0)
                    rows["text"].append(None)
                    continue
                rows["n_paras"].append(txt.count("\n") + 1 if txt else 0)
                rows["n_chars"].append(len(txt))
                rows["text"].append(txt)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        batch,
        schema=(
            "doc_id long, fmt string, n_paras long, n_chars long, text string"
        ),
    )


# the oracle rebuilds the EXACT extracted text in SQL: per-paragraph
# string construction from the fixture formulas, tab = chr(9),
# paragraphs joined with chr(10) in order
OFFICE_TEXT_ORACLE = """
WITH g AS (
  SELECT doc_id, 2 + doc_id % 5 AS n FROM documents
),
p AS (
  SELECT g.doc_id, g.n, j,
         CASE WHEN j % 3 = 0
              THEN 'doc ' || g.doc_id || chr(9) || 'para ' || j
                   || ' value ' || (31 * g.doc_id + 17 * j) % 1000
              ELSE 'doc ' || g.doc_id || ' para ' || j
                   || ' value ' || (31 * g.doc_id + 17 * j) % 1000
         END AS line
  FROM g, UNNEST(range(g.n)) AS u(j)
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'docx' ELSE 'odt' END AS fmt,
       n::BIGINT AS n_paras,
       length(string_agg(line, chr(10) ORDER BY j))::BIGINT AS n_chars,
       string_agg(line, chr(10) ORDER BY j) AS text
FROM p GROUP BY doc_id, n
"""
