"""Multimodal binary-column plumbing (task brief §multimodal).

Treats media as opaque ``binary`` columns with typed metadata.  The
*plumbing* — schema, Arrow batch shape, ``mapInPandas`` signature,
deterministic routing by media kind — is real and tested.  Codec status
per kind (round 2):

- **image**: HONEST header decode — ``parse_image_dims`` reads real
  PNG (IHDR), GIF (logical screen descriptor), and JPEG (SOF marker
  walk) headers in pure stdlib; the ``media_image_dims`` query builds
  genuine image files and the decoder parses their actual bytes.
- **audio/video**: still stubbed (``decode_stub`` derives md5-fake
  metadata; no ffmpeg/librosa in this image); ``real_decode`` raises
  NotImplementedError as the marked integration point.

Because stub metadata is md5-derived and image dims come from the real
headers of formula-built files, the DuckDB oracles reproduce every value.

Scale notes: media bytes never leave the executor; the UDF emits only
small metadata rows.  At 100 TB the same cap on Arrow batch bytes applies
as for html (pipeline config ``arrow_max_records``).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]
IMG_FORMATS = ["png", "gif", "jpeg"]


def real_decode(data: bytes, kind: str):
    """The real FULL decoder integration point (pixel data / samples /
    frames) — requires pillow/librosa/ffmpeg, none of which exist in this
    image.  Header-level image metadata does NOT need it: see
    ``parse_image_dims``."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this image; "
        "wire pillow/av here in production"
    )


# ---------------------------------------------------- honest image headers
def make_image_bytes(fmt: str, width: int, height: int) -> bytes:
    """Minimal REAL image file of the given format and dimensions
    (valid signature + header; no pixel data — header parsers stop
    before it).  Deterministic, so oracles can recompute sizes."""
    if fmt == "png":
        ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + chunk + struct.pack(">I", zlib.crc32(chunk))
            + struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH3B", width, height, 0, 0, 0)
    if fmt == "jpeg":
        sof0 = struct.pack(
            ">BHH B", 8, height, width, 3
        ) + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        return b"\xff\xd8\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0 + b"\xff\xd9"
    raise ValueError(f"unknown format {fmt}")


IMG_N_BYTES = {f: len(make_image_bytes(f, 1, 1)) for f in IMG_FORMATS}


def parse_image_dims(data: bytes) -> tuple[str, int, int] | None:
    """Real header parse: (format, width, height), or None if the bytes
    are not a recognized image (including truncated headers — a corrupt
    row must never kill the batch).  Pure stdlib — works on any genuine
    PNG/GIF/baseline-or-progressive JPEG, not just our fixtures."""
    try:
        return _parse_image_dims(data)
    except (struct.error, IndexError, ValueError):
        return None


def _parse_image_dims(data: bytes) -> tuple[str, int, int] | None:
    if data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h)
    if data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers, no length
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                return ("jpeg", w, h)
            pos += 2 + seglen
        return None
    return None


def decode_stub(data: bytes, kind: str) -> dict:
    """Deterministic fake decode for the audio/video kinds in
    media_metadata: md5-derived metadata (see module doc).  Images never
    reach this — they get the real header parse; audio has its own real
    WAV path in media_audio_features."""
    h = int(hashlib.md5(data).hexdigest()[:8], 16)
    meta = {"n_bytes": len(data), "kind": kind}
    if kind == "audio":
        meta.update(width=0, height=0, n_frames=h % 48000)
    else:  # video
        meta.update(width=h % 1920, height=(h // 7) % 1080, n_frames=1 + h % 240)
    # frame-sample every 2nd frame
    meta["n_sampled"] = (meta["n_frames"] + 1) // 2
    return meta


# ------------------------------------- real decode -> resize -> features
# PGM (P5) is a raw grayscale bitmap — header + pixel bytes, decodable
# and resizable in pure stdlib/numpy.  Images are synthesized from a
# doc_id gradient formula, so the DuckDB oracle reconstructs the REAL
# resized pixel statistics arithmetically: this path has no stub
# anywhere (decode, resize, and feature-extract all operate on actual
# pixel data).
def make_pgm(doc_id: int) -> bytes:
    w = 8 + doc_id % 9
    h = 8 + (doc_id * 3) % 9
    px = bytes(
        (3 * r + 5 * c + doc_id) % 256 for r in range(h) for c in range(w)
    )
    return f"P5\n{w} {h}\n255\n".encode() + px


def decode_pgm(data: bytes):
    """Real P5 parse -> (height x width) numpy array; None on anything
    malformed (wrong magic, bad header, short pixel buffer) — a corrupt
    row must never kill the batch."""
    import numpy as np

    try:
        if not data.startswith(b"P5"):
            return None
        parts = data.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        if w <= 0 or h <= 0 or len(parts[3]) < w * h:
            return None
        px = np.frombuffer(parts[3], dtype=np.uint8, count=w * h)
        return px.reshape(h, w)
    except (ValueError, IndexError):
        return None


def resize_nearest(img, factor: int = 2):
    """Nearest-neighbor downsample: every factor-th pixel (real resize)."""
    return img[::factor, ::factor]


def _decode_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "rw", "rh", "mean_px", "min_px", "max_px")}
        for doc_id, media in zip(pdf["doc_id"].values, pdf["media"].values):
            img = decode_pgm(bytes(media))
            rows["doc_id"].append(doc_id)
            if img is None or img.size == 0:
                for k in ("rh", "rw", "mean_px", "min_px", "max_px"):
                    rows[k].append(0)
                continue
            small = resize_nearest(img)
            rows["rh"].append(small.shape[0])
            rows["rw"].append(small.shape[1])
            rows["mean_px"].append(round(float(small.mean()), 6))
            rows["min_px"].append(int(small.min()))
            rows["max_px"].append(int(small.max()))
        yield pd.DataFrame(rows)


def media_decode_resize(spark, sf_dir: str):
    """The fully-real multimodal path: synthesize a genuine PGM bitmap
    per doc -> mapInPandas decodes the actual pixel buffer, resizes it
    (nearest-neighbor x2), and extracts features (mean/min/max of the
    RESIZED pixels).  No stub at any stage; the oracle reconstructs the
    same statistics from the gradient formula arithmetically."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def pgm_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series([make_pgm(int(i)) for i in doc_id])

    media = d.select("doc_id", pgm_udf("doc_id").alias("media"))
    return media.mapInPandas(
        _decode_resize_batch,
        schema=(
            "doc_id long, rw long, rh long, mean_px double, "
            "min_px long, max_px long"
        ),
    )


# resized grid: rows 0,2,..<h ; cols 0,2,..<w  -> pixel (6r'+10c'+doc_id)%256
MEDIA_DECODE_RESIZE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         8 + doc_id % 9 AS w,
         8 + (doc_id * 3) % 9 AS h
  FROM documents
),
rdims AS (
  SELECT doc_id, w, h,
         CAST(ceil(w / 2.0) AS BIGINT) AS rw,
         CAST(ceil(h / 2.0) AS BIGINT) AS rh
  FROM dims
),
px AS (
  SELECT d.doc_id, d.rw, d.rh,
         (6 * r + 10 * c + d.doc_id) % 256 AS v
  FROM rdims d,
       UNNEST(range(d.rh)) AS a(r),
       UNNEST(range(d.rw)) AS b(c)
)
SELECT doc_id, rw, rh,
       round(avg(v), 6) AS mean_px,
       min(v)::BIGINT AS min_px,
       max(v)::BIGINT AS max_px
FROM px GROUP BY doc_id, rw, rh
"""


# --------------------------------------------- real audio decode (WAV PCM)
# WAV is RIFF + raw PCM — synthesizable and decodable with the stdlib
# ``wave`` module, so the audio path gets the same no-stub treatment as
# images: real container parse, real sample buffer, real signal features.
WAV_RATES = [8000, 16000, 44100]


def make_wav(doc_id: int) -> bytes:
    import io
    import wave

    n = 64 + doc_id % 64  # sample count
    rate = WAV_RATES[doc_id % 3]
    samples = b"".join(
        int(((7 * i + doc_id) % 1000) - 500).to_bytes(2, "little", signed=True)
        for i in range(n)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_wav(data: bytes):
    """Real WAV parse -> (sample_rate, int16 numpy array), or (0, empty)
    on malformed RIFF — a corrupt row must never kill the batch."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            rate = w.getframerate()
            pcm = w.readframes(w.getnframes())
        return rate, np.frombuffer(pcm[: 2 * (len(pcm) // 2)], dtype=np.int16)
    except (wave.Error, EOFError, ValueError):
        return 0, np.zeros(0, dtype=np.int16)


def _audio_feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = {
            k: []
            for k in ("doc_id", "sample_rate", "n_samples", "rms", "peak")
        }
        for doc_id, media in zip(pdf["doc_id"].values, pdf["media"].values):
            rate, x = decode_wav(bytes(media))
            rows["doc_id"].append(doc_id)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(len(x))
            if len(x) == 0:
                rows["rms"].append(0.0)
                rows["peak"].append(0)
                continue
            rows["rms"].append(
                round(float(np.sqrt((x.astype(np.float64) ** 2).mean())), 6)
            )
            rows["peak"].append(int(np.abs(x.astype(np.int64)).max()))
        yield pd.DataFrame(rows)


def media_audio_features(spark, sf_dir: str):
    """Real audio path: genuine WAV files (RIFF container, 16-bit PCM
    from a doc_id formula) decoded executor-side with the stdlib wave
    module; features = RMS and peak of the ACTUAL sample buffer.  The
    oracle recomputes both arithmetically.  Video remains the only
    stubbed kind (decoding it genuinely requires codecs)."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def wav_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series([make_wav(int(i)) for i in doc_id])

    media = d.select("doc_id", wav_udf("doc_id").alias("media"))
    return media.mapInPandas(
        _audio_feature_batch,
        schema="doc_id long, sample_rate long, n_samples long, rms double, peak long",
    )


MEDIA_AUDIO_ORACLE = f"""
WITH dims AS (
  SELECT doc_id,
         64 + doc_id % 64 AS n,
         ([{", ".join(str(r) for r in WAV_RATES)}])[CAST(doc_id % 3 AS INT) + 1]
             AS sample_rate
  FROM documents
),
s AS (
  SELECT d.doc_id, d.n, d.sample_rate,
         ((7 * i + d.doc_id) % 1000) - 500 AS v
  FROM dims d, UNNEST(range(d.n)) AS u(i)
)
SELECT doc_id,
       sample_rate::BIGINT AS sample_rate,
       n::BIGINT AS n_samples,
       round(sqrt(avg(v * v)), 6) AS rms,
       max(abs(v))::BIGINT AS peak
FROM s GROUP BY doc_id, n, sample_rate
"""


def _decode_one(data: bytes, kind: str) -> dict:
    """Route one media payload: image -> REAL header parse; audio/video ->
    md5 stub (documented integration point)."""
    if kind == "image":
        parsed = parse_image_dims(data)
        fmt, w, h = parsed if parsed else ("unknown", 0, 0)
        return {
            "kind": kind,
            "detail": fmt,
            "n_bytes": len(data),
            "width": w,
            "height": h,
            "n_frames": 1,
            "n_sampled": 1,
        }
    meta = decode_stub(data, kind)
    meta["detail"] = ""
    return meta


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [
            _decode_one(bytes(b), k)
            for b, k in zip(pdf["media"].values, pdf["kind"].values)
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "kind": [m["kind"] for m in metas],
                "detail": [m["detail"] for m in metas],
                "n_bytes": [m["n_bytes"] for m in metas],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "n_frames": [m["n_frames"] for m in metas],
                "n_sampled": [m["n_sampled"] for m in metas],
            }
        )


# image-kind fixture dims (formulas mirrored in the DuckDB oracle)
def _img_fixture(doc_id: int) -> bytes:
    fmt = IMG_FORMATS[(doc_id // 3) % 3]
    return make_image_bytes(fmt, 1 + doc_id % 1919, 1 + (doc_id * 3) % 1079)


def media_metadata(spark, sf_dir: str):
    """documents -> media bytes routed to a kind by doc_id % 3 ->
    mapInPandas decode -> typed metadata.  Image rows carry GENUINE
    PNG/GIF/JPEG files (signature + header) built from doc_id formulas,
    and the decoder reads the dimensions out of the actual bytes — the
    oracle checks the real header parse, not a stub.  Audio/video rows
    remain utf-8 text + md5-stub metadata (no codecs in this image)."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def img_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series([_img_fixture(int(i)) for i in doc_id])

    media = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, img_udf("doc_id"))
        .otherwise(F.encode("text", "UTF-8"))
        .alias("media"),
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("kind"),
    )
    out = media.mapInPandas(
        _decode_batch,
        schema=(
            "doc_id long, kind string, detail string, n_bytes long, width long, "
            "height long, n_frames long, n_sampled long"
        ),
    )
    return out


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1->N expansion: every 2nd frame index of each video, with a
    deterministic per-frame content hash standing in for the decoded frame
    (the UDTF-shaped mapInPandas pattern: output rows != input rows)."""
    for pdf in batches:
        ids, idxs, hashes = [], [], []
        for doc_id, media in zip(pdf["doc_id"].values, pdf["media"].values):
            data = bytes(media)
            h = int(hashlib.md5(data).hexdigest()[:8], 16)
            n_frames = 1 + h % 240
            text = data.decode("utf-8")
            for idx in range(0, n_frames, 2):
                ids.append(doc_id)
                idxs.append(idx)
                hashes.append(
                    hashlib.md5(f"{text}:{idx}".encode()).hexdigest()[:8]
                )
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes}
        )


def media_frame_sample(spark, sf_dir: str):
    """Video-routed documents -> sampled frame rows (every 2nd frame).

    Scale notes: the expansion happens executor-side inside Arrow batches
    (no explode of a materialized frame array through the JVM — frames
    never exist as a column); output is ~120 small rows per video.  The
    real frame decoder plugs into ``real_decode``; the hash is its
    deterministic stand-in."""
    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    videos = d.filter(F.col("doc_id") % 3 == 2).select(
        "doc_id", F.encode("text", "UTF-8").alias("media")
    )
    return videos.mapInPandas(
        _frame_sample_batch, schema="doc_id long, frame_idx long, frame_hash string"
    )


MEDIA_FRAME_SAMPLE_ORACLE = """
WITH t AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h
  FROM documents WHERE doc_id % 3 = 2
), f AS (SELECT doc_id, text, 1 + h % 240 AS n_frames FROM t)
SELECT doc_id, idx::BIGINT AS frame_idx,
       substr(md5(text || ':' || idx), 1, 8) AS frame_hash
FROM f, UNNEST(range(0, n_frames, 2)) AS u(idx)
"""


MEDIA_METADATA_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h,
         octet_length(encode(text)) AS text_bytes,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         (['png', 'gif', 'jpeg'])[CAST((doc_id // 3) % 3 AS INT) + 1] AS fmt
  FROM documents
)
SELECT doc_id,
       kind,
       (CASE WHEN kind = 'image' THEN fmt ELSE '' END) AS detail,
       (CASE WHEN kind = 'image' THEN
              (CASE fmt WHEN 'png' THEN {IMG_N_BYTES['png']}
                        WHEN 'gif' THEN {IMG_N_BYTES['gif']}
                        ELSE {IMG_N_BYTES['jpeg']} END)
             ELSE text_bytes END)::BIGINT AS n_bytes,
       (CASE WHEN kind = 'image' THEN 1 + doc_id % 1919
             WHEN kind = 'video' THEN h % 1920 ELSE 0 END)::BIGINT AS width,
       (CASE WHEN kind = 'image' THEN 1 + (doc_id * 3) % 1079
             WHEN kind = 'video' THEN (h // 7) % 1080 ELSE 0 END)::BIGINT AS height,
       (CASE kind WHEN 'image' THEN 1
                  WHEN 'audio' THEN h % 48000
                  ELSE 1 + h % 240 END)::BIGINT AS n_frames,
       (CASE WHEN kind = 'image' THEN 1
             ELSE ((CASE kind WHEN 'audio' THEN h % 48000
                              ELSE 1 + h % 240 END) + 1) // 2 END)::BIGINT AS n_sampled
FROM t
"""
