"""TIFF 6.0 (baseline) — a real pixel path for the scanned-document
tail of the crawl, in pure stdlib struct + numpy.

Round 4 gave TIFF an honest HEADER parse (``multimodal._parse_tiff_dims``
walks the first IFD in either byte order); this module completes the
baseline-TIFF pixel path the way rounds 5's JPEG/PNG/BMP codecs did for
their formats: a full first-IFD decoder for the two compressions
baseline TIFF 6.0 requires readers to support — Compression=1 (none)
and Compression=32773 (PackBits RLE) — for 8-bit grayscale
(PhotometricInterpretation 1) and RGB (PhotometricInterpretation 2),
in BOTH byte orders (II little-endian and MM big-endian), with
multi-strip assembly (RowsPerStrip < height exercises the strip loop
on every fixture).

Uncompressed and PackBits are lossless, so the standard is bit-exact
with NO error bound: decode must reproduce the encoder's input exactly
(strip reassembly, PackBits run expansion, endian-correct tag reads),
and the DuckDB oracle recomputes decoded pixel statistics
arithmetically from the fixture formulas.

Round-5 close-out extends the envelope with the scanned-document
mainstay: **Compression=5 (LZW, spec §13)** — MSB-first bit packing
with the "early change" code widths (the writer widens the field when
the next code to assign reaches ``(1 << width) - 1``; the reader, whose
string table runs one entry behind the writer's, mirrors the bump at
``- 2``), ClearCode/EOI handling, and the 4094-entry table reset — plus
**Predictor=2 (horizontal differencing, tag 317)**, applied per row per
sample channel before compression and undone with a wrapping cumulative
sum after.  LZW+predictor is what real scanner output uses; both are
lossless, so the bit-exact standard holds: NO error bound anywhere.

Supported envelope (pinned by fail-soft tests): BitsPerSample 8,
SamplesPerPixel 1 / 3, Compression 1 / 5 / 8 / 32946 / 32773
(Deflate — the modern TIFF writer default — is a per-strip zlib
stream, accepted under both its standard tag 8 and the legacy Adobe
32946, and composes with Predictor 2 like LZW does), Predictor 1 / 2,
strip layout.  JPEG-in-TIFF compression, tiled layout, 16-bit samples,
and planar configuration 2 return None rather than garbage —
``multimodal.real_decode`` remains the production swap-in for those.

Reference analog: the reference feeds Tesseract TIFF renders of PDF
pages (/root/reference/OCR/Image.cs:20-66) but never decodes crawl
images; this operator is part of the beyond-reference multimodal suite.

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

# tag ids (TIFF 6.0 baseline)
_W, _H, _BPS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _RPS, _STRIP_CNT, _PLANAR = 273, 277, 278, 279, 284
_PREDICTOR = 317

_CLEAR, _EOI = 256, 257  # LZW control codes (TIFF 6.0 §13)


# ---------------------------------------------------------------------- LZW
def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW (spec §13): codes packed MSB-first, initial
    width 9, ClearCode=256 / EOI=257, and the spec's "early change" —
    the code width widens as soon as the next code to ASSIGN reaches
    ``(1 << width) - 1`` (one code earlier than GIF's LSB-first
    variant, ``multimodal._lzw_encode``).  The table resets via an
    explicit ClearCode when the next code reaches 4094."""
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        bitbuf &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(_CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # spec §13: ClearCode when the table fills
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([b])
    if w:
        emit(table[w], width)
        # the reader will create one more entry on seeing EOI's
        # predecessor — mirror its width bump for the EOI field
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes | None:
    """Decode a TIFF §13 LZW strip to exactly ``expected`` bytes, or
    None for any malformed / truncated / mis-sized stream.  The
    decoder's string table runs one entry behind the writer's (the
    entry for the code just read is only created when the NEXT code
    arrives), so the early-change width bump fires at
    ``(1 << width) - 2`` where the writer used ``- 1``."""
    out = bytearray()
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width, prev = 9, None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return None  # ran out of stream before EOI
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        bitbuf &= (1 << nbits) - 1
        if code == _CLEAR:
            table = list(base)
            width, prev = 9, None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code > 255:
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                return None
            table.append(prev + entry[:1])
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        out += entry
        if len(out) > expected:
            return None
        prev = entry
    return bytes(out) if len(out) == expected else None


# ----------------------------------------------- Predictor 2 (h-differencing)
def _hdiff_encode(strip: np.ndarray, spp: int) -> np.ndarray:
    """Horizontal differencing (tag 317 = 2) on a (rows, w*spp) strip:
    each row independently, per sample channel, wrapping mod 256."""
    px = strip.reshape(strip.shape[0], -1, spp).astype(np.uint8)
    out = px.copy()
    out[:, 1:] = px[:, 1:] - px[:, :-1]
    return out.reshape(strip.shape)


def _hdiff_decode(strip: np.ndarray, spp: int) -> np.ndarray:
    px = strip.reshape(strip.shape[0], -1, spp)
    return np.cumsum(px, axis=1, dtype=np.uint8).reshape(strip.shape)


# ----------------------------------------------------------------- PackBits
def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits (TIFF 6.0 §9): runs of >= 3 identical bytes
    become (257 - n, byte); everything else literal groups."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes((257 - run, data[i]))
            i += run
            continue
        # literal group: until the next >=3 run or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes | None:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        code = data[i]
        i += 1
        if code < 128:  # literal of code+1 bytes
            if i + code + 1 > n:
                return None
            out += data[i : i + code + 1]
            i += code + 1
        elif code > 128:  # repeat next byte 257-code times
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - code)
            i += 1
        # code == 128: no-op
    return bytes(out) if len(out) == expected else None


# ------------------------------------------------------------------ encoder
def encode_tiff(
    img: np.ndarray,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int = 2,
    lzw: bool = False,
    predictor: int = 1,
    deflate: bool = False,
) -> bytes:
    """Encode an 8-bit image ((h, w) gray or (h, w, 3) RGB) as a real
    baseline TIFF: header + pixel strips + one IFD.  ``rows_per_strip``
    defaults to 2 so every fixture is multi-strip.  ``lzw=True`` uses
    Compression=5 (§13 LZW); ``deflate=True`` uses Compression=8
    (per-strip zlib); ``predictor=2`` applies horizontal differencing
    (tag 317) per row before compression."""
    if packbits + lzw + deflate > 1:
        raise ValueError("pick one compression")
    e = ">" if big_endian else "<"
    if img.ndim == 2:
        h, w = img.shape
        spp, photo = 1, 1
        flat = img.astype(np.uint8)
    else:
        h, w = img.shape[:2]
        spp, photo = 3, 2
        flat = img.astype(np.uint8).reshape(h, w * 3)
    comp = 5 if lzw else (8 if deflate else (32773 if packbits else 1))
    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = flat[y0 : y0 + rows_per_strip]
        if predictor == 2:
            rows = _hdiff_encode(rows, spp)
        raw = rows.tobytes()
        if lzw:
            strips.append(lzw_encode(raw))
        elif deflate:
            strips.append(zlib.compress(raw))
        elif packbits:
            strips.append(packbits_encode(raw))
        else:
            strips.append(raw)
    header = struct.pack(e + "2sHI", b"MM" if big_endian else b"II", 42, 0)
    body = bytearray(header)
    offsets = []
    for s in strips:
        offsets.append(len(body))
        body += s
    if len(body) % 2:
        body += b"\x00"  # IFD must start on a word boundary
    ifd_off = len(body)
    struct.pack_into(e + "I", body, 4, ifd_off)

    def entry(tag, typ, count, value_or_off):
        return struct.pack(e + "HHII", tag, typ, count, value_or_off)

    n_strips = len(strips)
    # out-of-line arrays (strip offsets/counts, and SHORT BPS for rgb)
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * 11 + 4  # 11 entries (317 always written)
    if n_strips == 1:
        off_val, cnt_val = offsets[0], len(strips[0])
    else:
        off_val = extra_base + len(extra)
        extra += struct.pack(e + f"{n_strips}I", *offsets)
        cnt_val = extra_base + len(extra)
        extra += struct.pack(e + f"{n_strips}I", *(len(s) for s in strips))
    if spp == 1:
        # SHORT value packed left-justified in the 4-byte slot: the
        # big-endian encoding needs it in the slot's high bytes
        bps_entry = entry(_BPS, 3, 1, 8 << 16 if big_endian else 8)
    else:
        bps_off = extra_base + len(extra)
        extra += struct.pack(e + "3H", 8, 8, 8)
        bps_entry = entry(_BPS, 3, 3, bps_off)
    entries = [
        entry(_W, 3, 1, (w << 16) if big_endian else w),
        entry(_H, 3, 1, (h << 16) if big_endian else h),
        bps_entry,
        entry(_COMP, 3, 1, (comp << 16) if big_endian else comp),
        entry(_PHOTO, 3, 1, (photo << 16) if big_endian else photo),
        entry(_STRIP_OFF, 4, n_strips, off_val),
        entry(_SPP, 3, 1, (spp << 16) if big_endian else spp),
        entry(_RPS, 3, 1, (rows_per_strip << 16)
              if big_endian else rows_per_strip),
        entry(_STRIP_CNT, 4, n_strips, cnt_val),
        entry(_PLANAR, 3, 1, (1 << 16) if big_endian else 1),
        entry(_PREDICTOR, 3, 1, (predictor << 16) if big_endian else predictor),
    ]
    body += struct.pack(e + "H", len(entries))
    for en in entries:
        body += en
    body += struct.pack(e + "I", 0)  # next-IFD pointer: none
    body += extra
    return bytes(body)


# ------------------------------------------------------------------ decoder
def _read_tag_value(e: str, typ: int, count: int, slot: bytes, data: bytes):
    """Return the tag's value list (SHORT/LONG only — all a baseline
    strip TIFF needs)."""
    size = {3: 2, 4: 4}.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        buf = slot[:total]
    else:
        (off,) = struct.unpack(e + "I", slot)
        if off + total > len(data):
            return None
        buf = data[off : off + total]
    fmt = e + str(count) + ("H" if typ == 3 else "I")
    return list(struct.unpack(fmt, buf))


def decode_tiff(data: bytes):
    """Full baseline-TIFF decode of the first IFD.  Returns (h, w)
    uint8 for grayscale or (h, w, 3) for RGB, or None for anything
    malformed or outside the supported envelope.  Never raises."""
    try:
        if len(data) < 8:
            return None
        if data[:2] == b"II" and data[2:4] == b"*\x00":
            e = "<"
        elif data[:2] == b"MM" and data[2:4] == b"\x00*":
            e = ">"
        else:
            return None
        (ifd,) = struct.unpack(e + "I", data[4:8])
        if ifd + 2 > len(data):
            return None
        (n,) = struct.unpack(e + "H", data[ifd : ifd + 2])
        if ifd + 2 + 12 * n + 4 > len(data):
            return None
        tags = {}
        for i in range(n):
            base = ifd + 2 + 12 * i
            tag, typ, count = struct.unpack(e + "HHI", data[base : base + 8])
            tags[tag] = (typ, count, data[base + 8 : base + 12])
        def val(tag, default=None):
            if tag not in tags:
                return default
            typ, count, slot = tags[tag]
            return _read_tag_value(e, typ, count, slot, data)

        w = val(_W)
        h = val(_H)
        comp = val(_COMP, [1])
        photo = val(_PHOTO)
        spp = val(_SPP, [1])
        bps = val(_BPS, [8])
        planar = val(_PLANAR, [1])
        offs = val(_STRIP_OFF)
        cnts = val(_STRIP_CNT)
        rps = val(_RPS, [None])
        pred = val(_PREDICTOR, [1])
        if None in (w, h, photo, offs, cnts) or not w or not h:
            return None
        w, h = w[0], h[0]
        spp = spp[0]
        comp = comp[0]
        if (
            w == 0 or h == 0 or w * h > 1 << 26
            or spp not in (1, 3)
            or any(b != 8 for b in bps)
            or comp not in (1, 5, 8, 32946, 32773)
            or pred[0] not in (1, 2)
            or planar[0] != 1
            or photo[0] not in (1, 2)
            or (photo[0] == 1) != (spp == 1)
            or len(offs) != len(cnts)
        ):
            return None
        rows_per_strip = rps[0] if rps[0] else h
        stride = w * spp
        raw = bytearray()
        y = 0
        for off, cnt in zip(offs, cnts):
            if off + cnt > len(data):
                return None
            seg = data[off : off + cnt]
            rows = min(rows_per_strip, h - y)
            expected = rows * stride
            if comp == 32773:
                seg = packbits_decode(seg, expected)
                if seg is None:
                    return None
            elif comp == 5:
                seg = lzw_decode(seg, expected)
                if seg is None:
                    return None
            elif comp in (8, 32946):  # Deflate (standard + legacy Adobe)
                seg = zlib.decompress(seg)
                if len(seg) != expected:
                    return None
            elif len(seg) != expected:
                return None
            raw += seg
            y += rows
        if y != h or len(raw) != h * stride:
            return None
        arr = np.frombuffer(bytes(raw), np.uint8).reshape(h, stride)
        if pred[0] == 2:
            arr = _hdiff_decode(arr, spp)
        return arr if spp == 1 else arr.reshape(h, w, 3)
    except Exception:
        return None


# ------------------------------------------------------- fixture + operator
# family = doc_id % 10: gray/rgb x {uncompressed LE, PackBits BE,
# LZW LE, LZW BE, Deflate} with Predictor=2 on families 5/6/8 —
# compression x byte order x spp x predictor in ten streams, all
# multi-strip (rows_per_strip=2 < h).  Even families are gray, odd
# rgb, so the cross-codec agreement pins (PNG==BMP==TIFF on d%4
# slices) keep holding.  Value formulas mirror the PNG/BMP fixtures
# so the oracles share one shape; compression never changes decoded
# statistics, so the oracle's only family-dependent column is fmt.
TIFF_FMTS = [
    "gray", "rgb", "gray_pb", "rgb_pb",
    "gray_lzw", "rgb_lzw_p2", "gray_lzw_be_p2", "rgb_lzw_be",
    "gray_zip_p2", "rgb_zip_be",
]


def _tiff_geometry(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % 5, 4 + (doc_id * 3) % 5


def make_tiff(doc_id: int) -> bytes:
    """Deterministic TIFF fixture: gray v = (d + 3r + 5c) % 256, rgb
    channel k = (d + 3r + 5c + 77k) % 256; families 2/3 are PackBits +
    big-endian (MM); families 4-7 are LZW (LE then BE); families 8/9
    are Deflate (LE then BE); Predictor=2 horizontal differencing on
    5/6/8."""
    w, h = _tiff_geometry(doc_id)
    fam = doc_id % 10
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = (doc_id + 3 * rr + 5 * cc) % 256
    if fam % 2 == 0:
        img = base.astype(np.uint8)
    else:
        img = np.stack(
            [(base + 77 * k) % 256 for k in range(3)], axis=-1
        ).astype(np.uint8)
    return encode_tiff(
        img,
        big_endian=fam in (2, 3, 6, 7, 9),
        packbits=fam in (2, 3),
        lzw=fam in (4, 5, 6, 7),
        deflate=fam in (8, 9),
        predictor=2 if fam in (5, 6, 8) else 1,
    )


def _tiff_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = (
        "doc_id", "fmt", "w", "h",
        "mean_px", "min_px", "max_px", "mean_r", "mean_g", "mean_b",
    )
    for pdf in batches:
        rows = {k: [] for k in cols}
        for doc_id, media in zip(pdf["doc_id"].values, pdf["media"].values):
            img = decode_tiff(bytes(media))
            rows["doc_id"].append(doc_id)
            rows["fmt"].append(TIFF_FMTS[int(doc_id) % 10])
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
            if img.ndim == 2:
                for k in ("mean_r", "mean_g", "mean_b"):
                    rows[k].append(None)
            else:
                for k, ch in (("mean_r", 0), ("mean_g", 1), ("mean_b", 2)):
                    rows[k].append(round(float(img[:, :, ch].mean()), 6))
        yield pd.DataFrame(rows)


def media_tiff_decode(spark, sf_dir: str):
    """Real TIFF pixel path: synthesize a genuine baseline TIFF per doc
    (family by doc_id % 10: gray/rgb x uncompressed-LE / PackBits-BE /
    LZW-LE / LZW-BE / Deflate, Predictor=2 on families 5/6/8, all
    multi-strip) ->
    mapInPandas runs the full decode (endian-correct IFD walk, strip
    assembly, PackBits expansion, §13 LZW with early-change widths,
    per-strip zlib inflate,
    horizontal-differencing undo) on the actual bytes and emits decoded
    pixel statistics.  Driver-gated as ``media_features`` kind='tiff'
    (slice-pinned)."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def tiff_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series([make_tiff(int(i)) for i in doc_id])

    media = d.select("doc_id", tiff_udf("doc_id").alias("media"))
    return media.mapInPandas(
        _tiff_decode_batch,
        schema=(
            "doc_id long, fmt string, w long, h long, mean_px double, "
            "min_px long, max_px long, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


# Lossless compressions: the oracle recomputes every decoded sample
# from the fixture formulas exactly.  Endianness, strip assembly, and
# RLE expansion don't change pixel statistics — the bit-exact pytest
# round trips pin those — but any bug that shifts values breaks these
# aggregates too.
MEDIA_TIFF_DECODE_ORACLE = """
WITH g AS (
  SELECT doc_id,
         CAST(doc_id % 10 AS INT) AS fam,
         4 + doc_id % 5 AS w,
         4 + (doc_id * 3) % 5 AS h
  FROM documents
),
samp AS (
  SELECT doc_id, fam, w, h, k, r, c,
         (doc_id + 3 * r + 5 * c + 77 * k) % 256 AS v
  FROM g, UNNEST(range(g.h)) a(r), UNNEST(range(g.w)) b(c),
       UNNEST(range(CASE WHEN g.fam % 2 = 0 THEN 1 ELSE 3 END)) d(k)
)
SELECT doc_id,
       (['gray', 'rgb', 'gray_pb', 'rgb_pb',
         'gray_lzw', 'rgb_lzw_p2', 'gray_lzw_be_p2', 'rgb_lzw_be',
         'gray_zip_p2', 'rgb_zip_be'])[fam + 1] AS fmt,
       w::BIGINT AS w, h::BIGINT AS h,
       round(avg(v), 6) AS mean_px,
       min(v)::BIGINT AS min_px, max(v)::BIGINT AS max_px,
       CASE WHEN fam % 2 = 0 THEN NULL
            ELSE round(avg(v) FILTER (k = 0), 6) END AS mean_r,
       CASE WHEN fam % 2 = 0 THEN NULL
            ELSE round(avg(v) FILTER (k = 1), 6) END AS mean_g,
       CASE WHEN fam % 2 = 0 THEN NULL
            ELSE round(avg(v) FILTER (k = 2), 6) END AS mean_b
FROM samp GROUP BY doc_id, fam, w, h
"""
