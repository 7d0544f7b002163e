"""Spreadsheet / presentation text extraction — XLSX and PPTX
(OOXML, ECMA-376 parts 1/4) — in pure stdlib zipfile + xml.etree.

The round-5 office family (operators/office.py) covered the
word-processor formats (DOCX/ODT/EPUB); crawls also carry the other
two OOXML containers, and both are ZIP+XML all the way down:

- **XLSX** is three indirections deep, and each one is load-bearing
  in the fixtures:
  1. ``xl/workbook.xml`` lists sheets IN WORKBOOK ORDER with ``r:id``
     references; ``xl/_rels/workbook.xml.rels`` maps each rId to its
     part — and the fixture's rId numbering runs OPPOSITE to the
     sheet file numbering, so an extractor that guesses
     ``sheet1.xml, sheet2.xml, ...`` concatenates sheets in the wrong
     order.
  2. ``xl/sharedStrings.xml`` interns cell strings — si POSITION is
     the index (ECMA-376 §18.4); the fixtures reuse only 4 distinct
     shared strings per sheet so repeat cells genuinely point at one
     entry, and every entry is split into two rich-text runs, so both
     the index mapping and the run join are pinned.
  3. Worksheet cells carry ``r="B3"``-style references and the
     fixture writes each row's cells REVERSED; output order must come
     from parsing the A1 reference (column letters are base-26 with
     no zero digit), not from document order.
  Cell kinds cycle shared-string / number / ``inlineStr`` so all
  three value channels appear in every sheet.
- **PPTX**: ``ppt/presentation.xml``'s ``sldIdLst`` gives the slide
  ORDER via ``r:id`` indirection through
  ``ppt/_rels/presentation.xml.rels``; fixtures with
  ``doc_id % 4 == 3`` list slides reversed relative to their file
  numbering (the EPUB spine pin, one container over).  Slide text is
  the ``a:t`` run walk under ``p:txBody`` — every paragraph split
  into two runs that must join seamlessly.

Layout: cells join with TAB, rows / sheets / paragraphs / slides with
NEWLINE; the DuckDB oracle rebuilds the exact string with three
levels of ``string_agg``.

Supported envelope (pinned fail-soft): well-formed ZIP with the
format's parts; corrupt archives, missing parts/rels, dangling rIds,
and malformed XML return None, never raise.

Reference analog: none — the reference reads HTML/PDF only
(/root/reference/TextExtraction/Worker.cs:144-200); this is part of
the beyond-reference document-format suite.

100 TB shape: identical to the extract path — synthesis and parse run
executor-side inside Arrow batches via mapInPandas; document bytes
never cross an exchange.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import functions as F

_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"

_ZDATE = (1980, 1, 1, 0, 0, 0)


def _zwrite(zf: zipfile.ZipFile, name: str, data: bytes) -> None:
    zi = zipfile.ZipInfo(name, date_time=_ZDATE)
    zi.compress_type = zipfile.ZIP_DEFLATED
    zf.writestr(zi, data)


# ------------------------------------------------------------------ fixtures
def _xlsx_shape(doc_id: int, s: int) -> tuple[int, int]:
    return 2 + (doc_id + s) % 3, 2 + (doc_id + s) % 2  # (n_rows, n_cols)


def _cell_text(doc_id: int, s: int, i: int, j: int) -> tuple[int, str]:
    """(kind, text) for sheet s cell (i, j): 0 = shared string,
    1 = number, 2 = inline string."""
    kind = (doc_id + i + j) % 3
    if kind == 0:
        # only 4 distinct shared strings per (doc, sheet): the table
        # INTERNS (repeat cells point at one si), so the index->entry
        # mapping is exercised by real reuse, not 1:1 positions
        return 0, f"sh {doc_id}.{s}.{(i + 2 * j) % 4}"
    if kind == 1:
        return 1, str((7 * doc_id + 13 * s + 3 * i + 5 * j) % 1000)
    return 2, f"in {doc_id}.{s}.{i}.{j}"


def _col_name(j: int) -> str:
    """0-based column index -> A1 letters (base-26, no zero digit)."""
    name = ""
    j += 1
    while j:
        j, r = divmod(j - 1, 26)
        name = chr(ord("A") + r) + name
    return name


def make_xlsx(doc_id: int) -> bytes:
    """Deterministic XLSX: ``1 + doc_id % 3`` sheets; rId numbering
    reversed vs sheet file numbering; interned shared-string table
    with every entry split into two rich-text runs; each row's cells
    written reversed (refs must be parsed)."""
    n_sheets = 1 + doc_id % 3
    # collect shared strings in insertion order
    sst: list[str] = []
    sst_idx: dict[str, int] = {}
    sheets_xml: list[bytes] = []
    for s in range(n_sheets):
        n_rows, n_cols = _xlsx_shape(doc_id, s)
        rows = []
        for i in range(n_rows):
            cells = []
            for j in range(n_cols):
                kind, txt = _cell_text(doc_id, s, i, j)
                ref = f"{_col_name(j)}{i + 1}"
                if kind == 0:
                    if txt not in sst_idx:
                        sst_idx[txt] = len(sst)
                        sst.append(txt)
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{sst_idx[txt]}</v></c>'
                    )
                elif kind == 1:
                    cells.append(f'<c r="{ref}"><v>{txt}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t>{txt}</t>'
                        "</is></c>"
                    )
            rows.append(
                f'<row r="{i + 1}">' + "".join(reversed(cells)) + "</row>"
            )
        sheets_xml.append(
            (
                f'<worksheet xmlns="{_MAIN}"><sheetData>'
                + "".join(rows)
                + "</sheetData></worksheet>"
            ).encode()
        )
    # workbook order s=0..n-1 -> rId{s+1} -> sheet{n_sheets - s}.xml
    wb = (
        f'<workbook xmlns="{_MAIN}" xmlns:r="{_R}"><sheets>'
        + "".join(
            f'<sheet name="S{s}" sheetId="{s + 1}" r:id="rId{s + 1}"/>'
            for s in range(n_sheets)
        )
        + "</sheets></workbook>"
    ).encode()
    rels = (
        f'<Relationships xmlns="{_REL}">'
        + "".join(
            f'<Relationship Id="rId{s + 1}" Type="{_R}/worksheet" '
            f'Target="worksheets/sheet{n_sheets - s}.xml"/>'
            for s in range(n_sheets)
        )
        + "</Relationships>"
    ).encode()
    # si position IS the index (ECMA-376 §18.4): insertion order, each
    # entry split into two rich-text runs
    sst_items = []
    for txt in sst:
        cut = max(1, len(txt) // 2)
        sst_items.append(
            f"<si><r><t>{txt[:cut]}</t></r>"
            f'<r><t xml:space="preserve">{txt[cut:]}</t></r></si>'
        )
    sst_xml = (
        f'<sst xmlns="{_MAIN}" count="{len(sst)}" uniqueCount="{len(sst)}">'
        + "".join(sst_items)
        + "</sst>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _zwrite(
            zf,
            "[Content_Types].xml",
            b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            b'content-types"/>',
        )
        _zwrite(
            zf,
            "_rels/.rels",
            (
                f'<Relationships xmlns="{_REL}"><Relationship Id="rId1" '
                f'Type="{_R}/officeDocument" Target="xl/workbook.xml"/>'
                "</Relationships>"
            ).encode(),
        )
        _zwrite(zf, "xl/workbook.xml", wb)
        _zwrite(zf, "xl/_rels/workbook.xml.rels", rels)
        _zwrite(zf, "xl/sharedStrings.xml", sst_xml)
        # file numbering: sheet{k}.xml holds workbook position n-k
        for s in range(n_sheets):
            _zwrite(
                zf,
                f"xl/worksheets/sheet{n_sheets - s}.xml",
                sheets_xml[s],
            )
    return buf.getvalue()


def _slide_para(doc_id: int, s: int, j: int) -> str:
    return (
        f"slide {s} para {j} of {doc_id} v "
        f"{(31 * doc_id + 17 * j + 7 * s) % 1000}"
    )


def make_pptx(doc_id: int) -> bytes:
    """Deterministic PPTX: ``1 + doc_id % 4`` slides, each with two
    paragraphs split into two ``a:r`` runs; ``sldIdLst`` lists slides
    REVERSED vs file numbering when ``doc_id % 4 == 3``."""
    n_slides = 1 + doc_id % 4
    reverse = doc_id % 4 == 3
    order = list(range(n_slides))
    if reverse:
        order.reverse()
    # presentation position p -> slide index order[p] -> file order[p]+1
    pres = (
        f'<p:presentation xmlns:p="{_P}" xmlns:r="{_R}"><p:sldIdLst>'
        + "".join(
            f'<p:sldId id="{256 + p}" r:id="rId{p + 2}"/>'
            for p in range(n_slides)
        )
        + "</p:sldIdLst></p:presentation>"
    ).encode()
    rels = (
        f'<Relationships xmlns="{_REL}">'
        + "".join(
            f'<Relationship Id="rId{p + 2}" Type="{_R}/slide" '
            f'Target="slides/slide{order[p] + 1}.xml"/>'
            for p in range(n_slides)
        )
        + "</Relationships>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        _zwrite(
            zf,
            "_rels/.rels",
            (
                f'<Relationships xmlns="{_REL}"><Relationship Id="rId1" '
                f'Type="{_R}/officeDocument" Target="ppt/presentation.xml"/>'
                "</Relationships>"
            ).encode(),
        )
        _zwrite(zf, "ppt/presentation.xml", pres)
        _zwrite(zf, "ppt/_rels/presentation.xml.rels", rels)
        for s in range(n_slides):
            paras = []
            for j in range(2):
                txt = _slide_para(doc_id, s, j)
                cut = max(1, (doc_id + j) % (len(txt) - 1) + 1)
                paras.append(
                    f"<a:p><a:r><a:t>{txt[:cut]}</a:t></a:r>"
                    f'<a:r><a:t xml:space="preserve">{txt[cut:]}</a:t>'
                    "</a:r></a:p>"
                )
            slide = (
                f'<p:sld xmlns:p="{_P}" xmlns:a="{_A}"><p:cSld><p:spTree>'
                "<p:sp><p:txBody>" + "".join(paras) + "</p:txBody></p:sp>"
                "</p:spTree></p:cSld></p:sld>"
            ).encode()
            _zwrite(zf, f"ppt/slides/slide{s + 1}.xml", slide)
    return buf.getvalue()


# ----------------------------------------------------------------- extract
_A1_RE = re.compile(r"^([A-Z]+)(\d+)$")


def _parse_ref(ref: str):
    m = _A1_RE.match(ref or "")
    if not m:
        return None
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - ord("A") + 1)
    return int(m.group(2)) - 1, col - 1


def extract_xlsx_text(data: bytes) -> str | None:
    """XLSX -> text: sheets in WORKBOOK order (rels-resolved), rows in
    ref order joined by newline, cells by tab; shared / numeric /
    inline channels all honored.  None on anything malformed."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            wb = ET.fromstring(zf.read("xl/workbook.xml"))
            rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            targets = {
                rel.get("Id"): rel.get("Target")
                for rel in rels.iter(f"{{{_REL}}}Relationship")
            }
            sst: list[str] = []
            if "xl/sharedStrings.xml" in zf.namelist():
                root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
                for si in root.iter(f"{{{_MAIN}}}si"):
                    sst.append(
                        "".join(
                            t.text or "" for t in si.iter(f"{{{_MAIN}}}t")
                        )
                    )
            sheets = []
            for sheet in wb.iter(f"{{{_MAIN}}}sheet"):
                rid = sheet.get(f"{{{_R}}}id")
                target = targets.get(rid)
                if target is None:
                    return None
                ws = ET.fromstring(zf.read("xl/" + target))
                cells: dict[tuple[int, int], str] = {}
                for c in ws.iter(f"{{{_MAIN}}}c"):
                    rc = _parse_ref(c.get("r"))
                    if rc is None:
                        return None
                    t = c.get("t")
                    if t == "inlineStr":
                        is_el = c.find(f"{{{_MAIN}}}is")
                        val = "".join(
                            x.text or ""
                            for x in (is_el.iter(f"{{{_MAIN}}}t") if is_el
                                      is not None else ())
                        )
                    else:
                        v = c.find(f"{{{_MAIN}}}v")
                        val = v.text or "" if v is not None else ""
                        if t == "s":
                            val = sst[int(val)]
                    cells[rc] = val
                rows: dict[int, list[tuple[int, str]]] = {}
                for (r, col), val in cells.items():
                    rows.setdefault(r, []).append((col, val))
                lines = [
                    "\t".join(v for _, v in sorted(rows[r]))
                    for r in sorted(rows)
                ]
                sheets.append("\n".join(lines))
        return "\n".join(sheets)
    except Exception:
        return None


def extract_pptx_text(data: bytes) -> str | None:
    """PPTX -> text: slides in sldIdLst order (rels-resolved),
    paragraphs joined by newline, runs seamlessly.  None on anything
    malformed."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            pres = ET.fromstring(zf.read("ppt/presentation.xml"))
            rels = ET.fromstring(
                zf.read("ppt/_rels/presentation.xml.rels")
            )
            targets = {
                rel.get("Id"): rel.get("Target")
                for rel in rels.iter(f"{{{_REL}}}Relationship")
            }
            slides = []
            for sld in pres.iter(f"{{{_P}}}sldId"):
                target = targets.get(sld.get(f"{{{_R}}}id"))
                if target is None:
                    return None
                root = ET.fromstring(zf.read("ppt/" + target))
                paras = []
                for p in root.iter(f"{{{_A}}}p"):
                    paras.append(
                        "".join(
                            t.text or "" for t in p.iter(f"{{{_A}}}t")
                        )
                    )
                slides.append("\n".join(paras))
        return "\n".join(slides)
    except Exception:
        return None


# ------------------------------------------------------------------ operator
SHEET_FMTS = ["xlsx", "pptx"]


def sheet_text(spark, sf_dir: str):
    """Spreadsheet/presentation extraction path: genuine XLSX/PPTX
    containers per doc (family by doc_id % 2) -> mapInPandas runs the
    full unzip + rels-resolution + XML walk on the actual bytes.
    Pytest-oracle-gated (outside the pinned 50-query driver cap)."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def sheet_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [
                (make_xlsx if int(i) % 2 == 0 else make_pptx)(int(i))
                for i in doc_id
            ]
        )

    media = d.select("doc_id", sheet_udf("doc_id").alias("media"))

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("doc_id", "fmt", "n_units", "n_chars", "text")
        for pdf in batches:
            rows = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"].values, pdf["media"].values):
                fam = int(doc_id) % 2
                ext = extract_xlsx_text if fam == 0 else extract_pptx_text
                txt = ext(bytes(blob))
                rows["doc_id"].append(doc_id)
                rows["fmt"].append(SHEET_FMTS[fam])
                if txt is None:
                    rows["n_units"].append(0)
                    rows["n_chars"].append(0)
                    rows["text"].append(None)
                    continue
                n_units = (
                    1 + int(doc_id) % 3 if fam == 0 else 1 + int(doc_id) % 4
                )
                rows["n_units"].append(n_units)
                rows["n_chars"].append(len(txt))
                rows["text"].append(txt)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        batch,
        schema=(
            "doc_id long, fmt string, n_units long, n_chars long, text string"
        ),
    )


# Three string_agg levels rebuild the exact xlsx text (cell -> TAB ->
# row -> NEWLINE -> sheet -> NEWLINE, in workbook order); the pptx
# branch rebuilds paragraphs per slide and applies the doc_id%4==3
# reversal as a computed presentation position.
SHEET_TEXT_ORACLE = """
WITH xg AS (
  SELECT doc_id, 1 + doc_id % 3 AS n_sheets FROM documents
  WHERE doc_id % 2 = 0
),
xcell AS (
  SELECT xg.doc_id, s, i, j,
         CASE (xg.doc_id + i + j) % 3
           WHEN 0 THEN 'sh ' || xg.doc_id || '.' || s || '.' || (i + 2 * j) % 4
           WHEN 1 THEN
             ((7 * xg.doc_id + 13 * s + 3 * i + 5 * j) % 1000)::VARCHAR
           ELSE 'in ' || xg.doc_id || '.' || s || '.' || i || '.' || j
         END AS cell
  FROM xg,
       UNNEST(range(xg.n_sheets)) a(s),
       UNNEST(range(2 + (xg.doc_id + s) % 3)) b(i),
       UNNEST(range(2 + (xg.doc_id + s) % 2)) c(j)
),
xrow AS (
  SELECT doc_id, s, i, string_agg(cell, chr(9) ORDER BY j) AS line
  FROM xcell GROUP BY doc_id, s, i
),
xsheet AS (
  SELECT doc_id, s, string_agg(line, chr(10) ORDER BY i) AS sheet
  FROM xrow GROUP BY doc_id, s
),
xdoc AS (
  SELECT doc_id, string_agg(sheet, chr(10) ORDER BY s) AS text
  FROM xsheet GROUP BY doc_id
),
pg AS (
  SELECT doc_id, 1 + doc_id % 4 AS n_slides FROM documents
  WHERE doc_id % 2 = 1
),
ppara AS (
  SELECT pg.doc_id, pg.n_slides, s, j,
         CASE WHEN pg.doc_id % 4 = 3 THEN pg.n_slides - 1 - s ELSE s END
             AS pos,
         'slide ' || s || ' para ' || j || ' of ' || pg.doc_id || ' v '
             || (31 * pg.doc_id + 17 * j + 7 * s) % 1000 AS line
  FROM pg, UNNEST(range(pg.n_slides)) a(s), UNNEST(range(2)) b(j)
),
pdoc AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos, j) AS text
  FROM ppara GROUP BY doc_id
)
SELECT x.doc_id, 'xlsx' AS fmt, g.n_sheets::BIGINT AS n_units,
       length(x.text)::BIGINT AS n_chars, x.text AS text
FROM xdoc x JOIN xg g USING (doc_id)
UNION ALL
SELECT p.doc_id, 'pptx' AS fmt, g.n_slides::BIGINT AS n_units,
       length(p.text)::BIGINT AS n_chars, p.text AS text
FROM pdoc p JOIN pg g USING (doc_id)
"""
