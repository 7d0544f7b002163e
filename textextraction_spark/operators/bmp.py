"""BMP (Windows DIB / BITMAPINFOHEADER) — a real pixel path for the
uncompressed-bitmap tail of the crawl, in pure stdlib struct + numpy.

Round 4 gave BMP an honest HEADER parse (``multimodal.parse_image_dims``
handles BITMAPINFOHEADER and the OS/2 core header, including top-down
negative heights); rounds 5's JPEG (``operators/jpeg.py``) and PNG
(``operators/png.py``) codecs closed the two dominant web formats, and
this module finishes the decodable-without-codec-libraries image tail:
a full BI_RGB decoder for the two layouts real BMPs overwhelmingly use
— 24-bit truecolor and 8-bit palette — in both row orders (bottom-up
positive-height, the BMP default, and top-down negative-height).

BMP is uncompressed, so like PNG the exactness standard is bit-exact
with NO error bound: decode must reproduce the encoder's input exactly
(row padding stripped, BGR swizzled to RGB, palette mapped, bottom-up
rows reversed), and the DuckDB oracle recomputes decoded pixel
statistics arithmetically from the fixture formulas.

Supported envelope (pinned by fail-soft tests): biBitCount 8 / 24,
biCompression 0 (BI_RGB), biSize >= 40 (pixel data located via
bfOffBits, so BITMAPV4/V5 headers work unchanged).  RLE4/RLE8/bitfield
compression, 1/4/16/32-bit depths, and OS/2 core headers return None
rather than garbage.

Reference analog: the reference rasterizes PDFs for OCR
(/root/reference/OCR/Image.cs:20-66) but never decodes crawl images;
this operator is part of the beyond-reference multimodal suite.

100 TB shape: identical to the other media operators — synthesis and
decode run executor-side inside Arrow batches via mapInPandas; no pixel
data ever crosses an exchange or reaches the driver.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


# ------------------------------------------------------------------ encoder
def encode_bmp(
    img: np.ndarray,
    palette: list | None = None,
    top_down: bool = False,
) -> bytes:
    """Encode a real BMP: (h, w, 3) uint8 RGB -> 24-bit BI_RGB, or
    (h, w) uint8 indices + ``palette`` -> 8-bit palette BMP.  Rows are
    4-byte padded; ``top_down`` emits the negative-height layout."""
    if img.ndim == 3:
        h, w = img.shape[:2]
        bits = 24
        pal_bytes = b""
        rows = img[:, :, ::-1].astype(np.uint8)  # RGB -> BGR
        stride = (w * 3 + 3) // 4 * 4
    else:
        h, w = img.shape
        bits = 8
        pal_bytes = b"".join(
            bytes((b, g, r, 0)) for (r, g, b) in (palette or [])
        )
        rows = img.astype(np.uint8)[:, :, None]
        stride = (w + 3) // 4 * 4
    body = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        line = rows[y].tobytes()
        body += line + b"\x00" * (stride - len(line))
    off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bits, 0,
        len(body), 2835, 2835, len(pal_bytes) // 4, 0,
    )
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return hdr + info + pal_bytes + bytes(body)


# ------------------------------------------------------------------ decoder
def decode_bmp(data: bytes):
    """Full BI_RGB decode.  Returns an (h, w, 3) uint8 RGB array (rows
    in visual top-to-bottom order regardless of the stored layout) or
    None for anything malformed or outside the supported envelope.
    Never raises."""
    try:
        if len(data) < 54 or data[:2] != b"BM":
            return None
        (off,) = struct.unpack("<I", data[10:14])
        (hdr_size,) = struct.unpack("<I", data[14:18])
        if hdr_size < 40 or 14 + hdr_size > len(data):
            return None
        w, h_raw, planes, bits, comp = struct.unpack("<iiHHI", data[18:34])
        (clr_used,) = struct.unpack("<I", data[46:50])
        if planes != 1 or comp != 0 or bits not in (8, 24):
            return None
        top_down = h_raw < 0
        h = -h_raw if top_down else h_raw
        if w <= 0 or h <= 0 or w * h > 1 << 26:
            return None
        bypp = bits // 8
        stride = (w * bypp + 3) // 4 * 4
        if off + stride * h > len(data) or off < 14 + hdr_size:
            return None
        pal = None
        if bits == 8:
            n_pal = clr_used or 256
            pal_start = 14 + hdr_size
            if pal_start + 4 * n_pal > off:
                return None
            raw_pal = np.frombuffer(
                data, np.uint8, count=4 * n_pal, offset=pal_start
            ).reshape(-1, 4)
            pal = raw_pal[:, [2, 1, 0]]  # BGRA -> RGB
        grid = np.frombuffer(
            data, np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)
        if not top_down:
            grid = grid[::-1]
        if bits == 24:
            px = grid[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
            return np.ascontiguousarray(px)
        idx = grid[:, :w]
        if int(idx.max()) >= len(pal):
            return None
        return pal[idx]
    except Exception:
        return None


# ------------------------------------------------------- fixture + operator
# family = doc_id % 4: 24-bit bottom-up / 24-bit top-down / 8-bit
# palette bottom-up / 8-bit palette top-down.  The truecolor and
# palette value formulas intentionally mirror the PNG fixtures
# (operators/png.py) so both oracles share one arithmetic shape; the
# row-order split means half of every family's streams exercise the
# bottom-up row reversal.
BMP_FMTS = ["rgb24", "rgb24td", "pal8", "pal8td"]


def _bmp_geometry(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % 5, 4 + (doc_id * 3) % 5


def make_bmp(doc_id: int) -> bytes:
    """Deterministic BMP fixture.  Truecolor channel k =
    (d + 3r + 5c + 77k) % 256; palette index = (d + 3r + 5c) % n_pal
    with n_pal = 2 + d % 15 and entry i = (7d+11i, 13d+17i, 3d+19i)
    (all % 256) — the PNG fixture formulas over the BMP container."""
    w, h = _bmp_geometry(doc_id)
    fam = doc_id % 4
    top_down = fam % 2 == 1
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = (doc_id + 3 * rr + 5 * cc) % 256
    if fam < 2:
        img = np.stack(
            [(base + 77 * k) % 256 for k in range(3)], axis=-1
        ).astype(np.uint8)
        return encode_bmp(img, top_down=top_down)
    n_pal = 2 + doc_id % 15
    idx = ((doc_id + 3 * rr + 5 * cc) % n_pal).astype(np.uint8)
    pal = [
        ((7 * doc_id + 11 * i) % 256, (13 * doc_id + 17 * i) % 256,
         (3 * doc_id + 19 * i) % 256)
        for i in range(n_pal)
    ]
    return encode_bmp(idx, palette=pal, top_down=top_down)


def _bmp_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = (
        "doc_id", "fmt", "w", "h",
        "mean_px", "min_px", "max_px", "mean_r", "mean_g", "mean_b",
    )
    for pdf in batches:
        rows = {k: [] for k in cols}
        for doc_id, media in zip(pdf["doc_id"].values, pdf["media"].values):
            img = decode_bmp(bytes(media))
            rows["doc_id"].append(doc_id)
            rows["fmt"].append(BMP_FMTS[int(doc_id) % 4])
            if img is None:
                rows["w"].append(0)
                rows["h"].append(0)
                for k in ("mean_px", "mean_r", "mean_g", "mean_b"):
                    rows[k].append(0.0)
                for k in ("min_px", "max_px"):
                    rows[k].append(0)
                continue
            rows["h"].append(img.shape[0])
            rows["w"].append(img.shape[1])
            rows["mean_px"].append(round(float(img.mean()), 6))
            rows["min_px"].append(int(img.min()))
            rows["max_px"].append(int(img.max()))
            for k, ch in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
                rows[k].append(round(float(img[:, :, ch].mean()), 6))
        yield pd.DataFrame(rows)


def media_bmp_decode(spark, sf_dir: str):
    """Real BMP pixel path: synthesize a genuine BI_RGB BMP per doc
    (family by doc_id % 4: 24-bit / 8-bit palette, x bottom-up /
    top-down) -> mapInPandas runs the full decode (row de-padding,
    bottom-up reversal, BGR swizzle, palette map) on the actual bytes
    and emits decoded pixel statistics.  Driver-gated as
    ``media_features`` kind='bmp' (slice-pinned)."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def bmp_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series([make_bmp(int(i)) for i in doc_id])

    media = d.select("doc_id", bmp_udf("doc_id").alias("media"))
    return media.mapInPandas(
        _bmp_decode_batch,
        schema=(
            "doc_id long, fmt string, w long, h long, mean_px double, "
            "min_px long, max_px long, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


# BMP is uncompressed: the oracle recomputes every decoded sample from
# the fixture formulas exactly (no error bound).  Row order and BGR
# swizzling don't change pixel statistics, but they DO change decode
# correctness — the bit-exact pytest round trips pin those, and any
# layout bug that shifts values breaks these aggregates too.
MEDIA_BMP_DECODE_ORACLE = """
WITH g AS (
  SELECT doc_id,
         CAST(doc_id % 4 AS INT) AS fam,
         4 + doc_id % 5 AS w,
         4 + (doc_id * 3) % 5 AS h,
         2 + doc_id % 15 AS n_pal
  FROM documents
),
tc AS (
  SELECT doc_id, fam, w, h, k, r, c,
         (doc_id + 3 * r + 5 * c + 77 * k) % 256 AS v
  FROM g, UNNEST(range(g.h)) a(r), UNNEST(range(g.w)) b(c),
       UNNEST(range(3)) d(k)
  WHERE fam < 2
),
pal AS (
  SELECT doc_id, fam, w, h, k, r, c,
         CASE k WHEN 0 THEN (7 * doc_id + 11 * idx) % 256
                WHEN 1 THEN (13 * doc_id + 17 * idx) % 256
                ELSE (3 * doc_id + 19 * idx) % 256 END AS v
  FROM (
    SELECT doc_id, fam, w, h, r, c,
           (doc_id + 3 * r + 5 * c) % n_pal AS idx
    FROM g, UNNEST(range(g.h)) a(r), UNNEST(range(g.w)) b(c)
    WHERE fam >= 2
  ), UNNEST(range(3)) e(k)
),
allsamp AS (
  SELECT * FROM tc UNION ALL SELECT * FROM pal
)
SELECT doc_id,
       (['rgb24', 'rgb24td', 'pal8', 'pal8td'])[fam + 1] AS fmt,
       w::BIGINT AS w, h::BIGINT AS h,
       round(avg(v), 6) AS mean_px,
       min(v)::BIGINT AS min_px, max(v)::BIGINT AS max_px,
       round(avg(v) FILTER (k = 0), 6) AS mean_r,
       round(avg(v) FILTER (k = 1), 6) AS mean_g,
       round(avg(v) FILTER (k = 2), 6) AS mean_b
FROM allsamp GROUP BY doc_id, fam, w, h
"""
