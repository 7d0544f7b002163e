"""PNG (ISO/IEC 15948 / RFC 2083) — a real pixel path for the web's
second-dominant image format, in pure stdlib (zlib) + numpy.

Rounds 3-4 gave PNG an honest HEADER parse (IHDR walk in
``multimodal.parse_image_dims``); round 5 closed the JPEG pixel gap
(``operators/jpeg.py``) and this module closes the PNG one.  Unlike
JPEG, PNG is LOSSLESS, so the exactness standard is stronger: the full
decode — chunk walk with CRC-32 verification, IDAT concatenation, zlib
inflate, per-scanline unfiltering (all five filter types: None / Sub /
Up / Average / Paeth), palette mapping — must reproduce the encoder's
input BIT-EXACTLY on every fixture and every arbitrary image, and the
DuckDB oracle recomputes decoded pixel statistics arithmetically from
the fixture formulas with no error bound.

Supported envelope (pinned by fail-soft tests): bit depths 8 and —
since the round-5 close-out — 16 (big-endian samples, color types
0/2/6), color types 0 (grayscale), 2 (truecolor), 3 (palette + PLTE,
8-bit only per spec practice here), 6 (RGBA), compression 0, filter
method 0, interlace 0 AND 1 (**Adam7**: seven independently-filtered
passes over the spec §8.2 sub-grids, each with its own
previous-row-resets-to-zero filter state, scattered back onto the full
pixel grid; empty passes on small images contribute no bytes, and the
expected inflated length is the per-pass sum — a lying IHDR still
fails soft).  The close-out's final sweep added the remaining
spec-legal shapes: **sub-byte depths 1/2/4** (gray and palette —
MSB-first bit-packed scanlines with zero padding bits, filtered at
byte distance 1, unpacked per Adam7 pass so interlace composes) and
**color type 4 (grayscale+alpha)** at depths 8/16.  Every color type x
depth x interlace combination the spec defines now decodes except
nothing — the PNG envelope is COMPLETE; ``multimodal.real_decode``
is no longer needed for any PNG.

The encoder cycles the scanline filter type with the row index
(row % 5), so every fixture stream exercises ALL FIVE unfilter paths —
a decoder that mishandles any one of them cannot round-trip a fixture
taller than four rows, and the driver-gated oracle would catch it.

Reference analog: the reference rasterizes PDFs for OCR
(/root/reference/OCR/Image.cs:20-66) but never decodes crawl images;
this operator is part of the beyond-reference multimodal suite.

100 TB shape: identical to the other media operators — synthesis and
decode run executor-side inside Arrow batches via mapInPandas; no pixel
data ever crosses an exchange or reaches the driver.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (before palette mapping)
_SPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# ------------------------------------------------------------------ encoder
def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to one raw scanline (uint8 1-D)."""
    n = len(row)
    if ftype == 0:
        return row.tobytes()
    r = row.astype(np.int32)
    pv = prev.astype(np.int32)
    left = np.zeros(n, np.int32)
    left[bpp:] = r[:-bpp]
    if ftype == 1:  # Sub
        return ((r - left) % 256).astype(np.uint8).tobytes()
    if ftype == 2:  # Up
        return ((r - pv) % 256).astype(np.uint8).tobytes()
    if ftype == 3:  # Average
        return ((r - (left + pv) // 2) % 256).astype(np.uint8).tobytes()
    # Paeth — sequential in x only through the fixed ORIGINAL bytes, so
    # still expressible per element
    out = bytearray(n)
    for i in range(n):
        a = int(r[i - bpp]) if i >= bpp else 0
        b = int(pv[i])
        c = int(pv[i - bpp]) if i >= bpp else 0
        out[i] = (int(r[i]) - _paeth(a, b, c)) % 256
    return bytes(out)


# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _byte_rows(px: np.ndarray, depth: int) -> np.ndarray:
    """(rows, cols, spp) pixel block -> (rows, ceil(cols*spp*depth/8))
    uint8 scanline bytes (16-bit samples big-endian, sub-byte samples
    packed MSB-first with zero padding bits, per spec)."""
    rows = px.shape[0]
    if depth == 16:
        return px.astype(">u2").view(np.uint8).reshape(rows, -1)
    if depth == 8:
        return px.astype(np.uint8).reshape(rows, -1)
    # 1/2/4-bit: expand each sample to its bits (MSB first), pack
    flat = px.astype(np.uint8).reshape(rows, -1)
    bits = (
        (flat[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).reshape(rows, -1)
    return np.packbits(bits, axis=1)


def _unpack_samples(rows_bytes: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(rows, stride_bytes) packed scanline bytes -> (rows, w) raw
    sample values (0 .. 2**depth - 1), MSB-first."""
    bits = np.unpackbits(rows_bytes, axis=1)[:, : w * depth]
    vals = bits.reshape(rows_bytes.shape[0], w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights).sum(axis=2).astype(np.uint8)


def _filter_block(px: np.ndarray, depth: int, spp: int) -> bytearray:
    """Filter one (sub-)image's scanlines, cycling the filter type with
    the row index so every stream exercises all five filters.  The
    previous-row predictor resets at the block start (each Adam7 pass
    filters independently, spec §8.2)."""
    flat = _byte_rows(px, depth)
    bpp = max(1, spp * depth // 8)  # sub-byte rows filter at distance 1
    prev = np.zeros(flat.shape[1], np.uint8)
    lines = bytearray()
    for y in range(flat.shape[0]):
        ftype = y % 5
        lines.append(ftype)
        lines += _filter_row(ftype, flat[y], prev, bpp)
        prev = flat[y]
    return lines


def encode_png(
    img: np.ndarray,
    color_type: int,
    palette: list | None = None,
    depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """Encode an image as a real PNG stream.

    ``img`` is (h, w) for color types 0 and 3 (for 3, values are
    palette indices) or (h, w, spp) for types 2 / 6.  ``depth=16``
    (color types 0/2/6) takes uint16 samples, written big-endian.
    ``interlace=True`` writes Adam7: seven independently-filtered
    passes over the pixel sub-grids.  The scanline filter type cycles
    with the row index (row % 5) so every stream exercises all five
    filters."""
    if img.ndim == 2:
        h, w = img.shape
        raw = img[:, :, None]
    else:
        h, w = img.shape[:2]
        raw = img
    spp = _SPP[color_type]
    if depth == 16 and color_type == 3:
        raise ValueError("palette PNGs are 8-bit here")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError("sub-byte depths are gray/palette only")
    lines = bytearray()
    if interlace:
        for xs, ys, xstep, ystep in _ADAM7:
            sub = raw[ys::ystep, xs::xstep]
            if sub.shape[0] and sub.shape[1]:
                lines += _filter_block(sub, depth, spp)
    else:
        lines = _filter_block(raw, depth, spp)
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0
    )
    out = _SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        plte = b"".join(bytes(rgb) for rgb in (palette or []))
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(bytes(lines)))
    return out + _chunk(b"IEND", b"")


# ------------------------------------------------------------------ decoder
def _unfilter_block(raw: bytes, base: int, rows: int, stride: int, bpp: int):
    """Undo the per-scanline filters over one filtered block (the whole
    image, or one Adam7 pass): ``rows`` scanlines of ``1 + stride``
    bytes starting at ``base``.  Returns a (rows, stride) uint8 array
    or None on an unknown filter type."""
    out = np.zeros((rows, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(rows):
        off = base + y * (1 + stride)
        ftype = raw[off]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=off + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) % 256
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (a + prev[i]) // 2) % 256
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(a, b, c)) % 256
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes):
    """Full PNG decode.  Returns ``(color_type, array)`` — (h, w) for
    grayscale, (h, w, 3) for truecolor and palette (mapped), (h, w, 4)
    for RGBA; uint8 at depth 8, uint16 at depth 16 — or None
    ((h, w, 2) for grayscale+alpha); uint8 at depths 1-8 (sub-byte
    samples as raw 0..2**depth-1 values), uint16 at depth 16 — or None
    for anything malformed (truncated stream, bad CRC, bad zlib stream,
    wrong inflated length — sequential or per-Adam7-pass — sub-byte
    truecolor, 16-bit palette).  Never raises."""
    try:
        if len(data) < 8 or data[:8] != _SIG:
            return None
        pos = 8
        ihdr = None
        plte = None
        idat = bytearray()
        seen_iend = False
        while pos + 8 <= len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            typ = data[pos + 4 : pos + 8]
            end = pos + 8 + ln
            if end + 4 > len(data):
                return None  # truncated chunk
            payload = data[pos + 8 : end]
            (crc,) = struct.unpack(">I", data[end : end + 4])
            if zlib.crc32(typ + payload) != crc:
                return None
            if typ == b"IHDR":
                if ihdr is not None or ln != 13:
                    return None
                ihdr = struct.unpack(">IIBBBBB", payload)
            elif typ == b"PLTE":
                if ln % 3 != 0:
                    return None
                plte = payload
            elif typ == b"IDAT":
                idat += payload
            elif typ == b"IEND":
                seen_iend = True
                break
            pos = end + 4
        if ihdr is None or not idat or not seen_iend:
            return None
        w, h, depth, ctype, comp, filt, inter = ihdr
        if (
            depth not in (1, 2, 4, 8, 16)
            or ctype not in _SPP
            or (depth == 16 and ctype == 3)
            or (depth < 8 and ctype not in (0, 3))
            or comp != 0
            or filt != 0
            or inter not in (0, 1)
            or w == 0
            or h == 0
            or w * h > 1 << 26  # decompression-bomb guard
        ):
            return None
        spp = _SPP[ctype]
        sub = depth < 8  # bit-packed gray / palette scanlines
        bpp = 1 if sub else spp * depth // 8  # filter distance, bytes

        def row_bytes(width: int) -> int:
            return (width * spp * depth + 7) // 8 if sub else width * bpp

        raw = zlib.decompress(bytes(idat))
        if inter == 0:
            if len(raw) != h * (1 + row_bytes(w)):
                return None
            out = _unfilter_block(raw, 0, h, row_bytes(w), bpp)
            if out is None:
                return None
            if sub:
                out = _unpack_samples(out, w, depth)
        else:  # Adam7: seven independently-filtered sub-grids
            passes = []
            total = 0
            for xs, ys, xstep, ystep in _ADAM7:
                pw = (w - xs + xstep - 1) // xstep if w > xs else 0
                ph = (h - ys + ystep - 1) // ystep if h > ys else 0
                passes.append((xs, ys, xstep, ystep, pw, ph))
                if pw and ph:
                    total += ph * (1 + row_bytes(pw))
            if len(raw) != total:
                return None
            gw = w if sub else w * bpp  # grid columns, per-pixel for sub
            out = np.zeros((h, gw), np.uint8)
            pos2 = 0
            for xs, ys, xstep, ystep, pw, ph in passes:
                if not (pw and ph):
                    continue
                block = _unfilter_block(raw, pos2, ph, row_bytes(pw), bpp)
                if block is None:
                    return None
                pos2 += ph * (1 + row_bytes(pw))
                if sub:  # unpack the pass's bit-packed rows first
                    block = _unpack_samples(block, pw, depth)
                # scatter the pass's pixels onto the full byte grid
                px = block.reshape(ph, pw, 1 if sub else bpp)
                grid = out.reshape(h, w, 1 if sub else bpp)
                grid[ys::ystep, xs::xstep] = px
        if depth == 16:
            out = (
                out.reshape(h, w * spp, 2)
                .view(">u2")
                .reshape(h, w * spp)
                .astype(np.uint16)
            )
        if ctype == 0:
            return 0, out
        if ctype == 2:
            return 2, out.reshape(h, w, 3)
        if ctype == 4:
            return 4, out.reshape(h, w, 2)
        if ctype == 6:
            return 6, out.reshape(h, w, 4)
        # palette: map indices through PLTE
        if plte is None:
            return None
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(out.max()) >= len(pal):
            return None
        return 3, pal[out]
    except Exception:
        return None


# ------------------------------------------------------- fixture + operator
# family = doc_id % 4: gray / rgb / rgba / palette; dims mirror the
# frame-sampler geometry (4..8 x 4..8).  All formulas are integer mod
# arithmetic so the DuckDB oracle recomputes decoded statistics exactly.
PNG_FMTS = ["gray", "rgb", "rgba", "pal"]


def _png_geometry(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % 5, 4 + (doc_id * 3) % 5


def make_png(doc_id: int) -> bytes:
    """Deterministic PNG fixture.  Pixel formulas (everything % 256):
    gray v = d + 3r + 5c; rgb/rgba channel k = d + 3r + 5c + 77k;
    palette index = (d + 3r + 5c) % n_pal with n_pal = 2 + d % 15 and
    palette entry i = (7d + 11i, 13d + 17i, 3d + 19i)."""
    w, h = _png_geometry(doc_id)
    fam = doc_id % 4
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = (doc_id + 3 * rr + 5 * cc) % 256
    if fam == 0:
        return encode_png(base.astype(np.uint8), 0)
    if fam in (1, 2):
        spp = 3 if fam == 1 else 4
        img = np.stack(
            [(base + 77 * k) % 256 for k in range(spp)], axis=-1
        ).astype(np.uint8)
        return encode_png(img, 2 if fam == 1 else 6)
    n_pal = 2 + doc_id % 15
    idx = ((doc_id + 3 * rr + 5 * cc) % n_pal).astype(np.uint8)
    pal = [
        ((7 * doc_id + 11 * i) % 256, (13 * doc_id + 17 * i) % 256,
         (3 * doc_id + 19 * i) % 256)
        for i in range(n_pal)
    ]
    return encode_png(idx, 3, palette=pal)


def _png_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = (
        "doc_id", "fmt", "w", "h",
        "mean_px", "min_px", "max_px", "mean_r", "mean_g", "mean_b",
    )
    for pdf in batches:
        rows = {k: [] for k in cols}
        for doc_id, media in zip(pdf["doc_id"].values, pdf["media"].values):
            dec = decode_png(bytes(media))
            rows["doc_id"].append(doc_id)
            rows["fmt"].append(PNG_FMTS[int(doc_id) % 4])
            if dec is None:
                rows["w"].append(0)
                rows["h"].append(0)
                for k in ("mean_px", "mean_r", "mean_g", "mean_b"):
                    rows[k].append(0.0)
                for k in ("min_px", "max_px"):
                    rows[k].append(0)
                continue
            ctype, img = dec
            rows["h"].append(img.shape[0])
            rows["w"].append(img.shape[1])
            # whole-sample stats over every decoded channel (alpha too)
            rows["mean_px"].append(round(float(img.mean()), 6))
            rows["min_px"].append(int(img.min()))
            rows["max_px"].append(int(img.max()))
            if ctype == 0:
                for k in ("mean_r", "mean_g", "mean_b"):
                    rows[k].append(None)
            else:
                for k, ch in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
                    rows[k].append(round(float(img[:, :, ch].mean()), 6))
        yield pd.DataFrame(rows)


def media_png_decode(spark, sf_dir: str):
    """Real PNG pixel path: synthesize a genuine PNG per doc (family by
    doc_id % 4: grayscale / truecolor / RGBA / palette, scanline filter
    cycling through all five types) -> mapInPandas runs the FULL decode
    (CRC-verified chunk walk, zlib inflate, unfilter, palette map) on
    the actual compressed bytes and emits decoded pixel statistics.
    Driver-gated as ``media_features`` kind='png' (slice-pinned)."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def png_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series([make_png(int(i)) for i in doc_id])

    media = d.select("doc_id", png_udf("doc_id").alias("media"))
    return media.mapInPandas(
        _png_decode_batch,
        schema=(
            "doc_id long, fmt string, w long, h long, mean_px double, "
            "min_px long, max_px long, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


# PNG is lossless, so the oracle recomputes the DECODED samples from
# the fixture formulas directly — no error bound, no block structure.
# Sample grid: r in [0,h), c in [0,w), channel k in [0,spp) with the
# per-family value formula; palette maps idx through the entry formula.
MEDIA_PNG_DECODE_ORACLE = """
WITH g AS (
  SELECT doc_id,
         CAST(doc_id % 4 AS INT) AS fam,
         4 + doc_id % 5 AS w,
         4 + (doc_id * 3) % 5 AS h,
         2 + doc_id % 15 AS n_pal
  FROM documents
),
samp AS (
  -- gray: k = 0 only; rgb: k in 0..2; rgba: k in 0..3 (alpha counted
  -- in the whole-sample stats, exactly like the decoder)
  SELECT doc_id, fam, w, h, k, r, c,
         (doc_id + 3 * r + 5 * c + 77 * k) % 256 AS v
  FROM g, UNNEST(range(g.h)) a(r), UNNEST(range(g.w)) b(c),
       UNNEST(range(CASE g.fam WHEN 0 THEN 1 WHEN 1 THEN 3
                               WHEN 2 THEN 4 ELSE 0 END)) d(k)
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
    WHERE fam = 3
  ), UNNEST(range(3)) e(k)
),
allsamp AS (
  SELECT * FROM samp UNION ALL SELECT * FROM pal
)
SELECT doc_id,
       (['gray', 'rgb', 'rgba', 'pal'])[fam + 1] AS fmt,
       w::BIGINT AS w, h::BIGINT AS h,
       round(avg(v), 6) AS mean_px,
       min(v)::BIGINT AS min_px, max(v)::BIGINT AS max_px,
       CASE WHEN fam = 0 THEN NULL
            ELSE round(avg(v) FILTER (k = 0), 6) END AS mean_r,
       CASE WHEN fam = 0 THEN NULL
            ELSE round(avg(v) FILTER (k = 1), 6) END AS mean_g,
       CASE WHEN fam = 0 THEN NULL
            ELSE round(avg(v) FILTER (k = 2), 6) END AS mean_b
FROM allsamp GROUP BY doc_id, fam, w, h
"""
