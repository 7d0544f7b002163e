"""AIFF (EA IFF 85 / Apple) and Sun AU — the audio-container tail, in
pure stdlib struct + numpy.

Round 2 gave audio a real WAV path (stdlib ``wave`` RIFF parse, PCM
sample features — ``multimodal.media_audio_features``); this module
completes the decodable-without-codec-libraries audio tail the way
``operators/{png,bmp,tiff}.py`` completed images:

- **AIFF**: FORM/AIFF chunk walk, COMM with the 80-bit IEEE-754
  extended-precision sample rate (the format's one genuinely tricky
  field — sign/15-bit-exponent/explicit-leading-1 64-bit mantissa,
  decoded exactly for integer rates), SSND big-endian 16-bit PCM.
  The big-endian counterpart to RIFF WAV, exactly as TIFF-MM was to
  BMP-LE.
- **AU** (Sun/NeXT ``.snd``): header walk + three encodings — 3
  (16-bit linear PCM big-endian), 1 (**G.711 mu-law**, expanded
  with the standard segment arithmetic: ``u' = ~u``,
  ``t = ((m·8 + 132) << e) − 132``, sign from bit 7), and — the
  round-5 close-out — 27 (**G.711 A-law**: ``a' = a XOR 0x55``,
  segment/mantissa expansion onto the 13-bit lattice, sign convention
  OPPOSITE to mu-law's).  The mu-law table is pinned by its anchor
  values (0x00 → −32124, 0xFF → 0) and by the exact encoder/decoder
  inversion on all 255 non-degenerate codes (the two codes that
  decode to 0 collapse to 0xFF on re-encode, asserted explicitly);
  the A-law table by its ITU anchors (0x55 → −8, 0xD5 → +8,
  0x2A/0xAA → ∓32256) and exact inversion on ALL 256 codes (A-law
  has no degenerate pair — zero is not on its lattice).

PCM and both companding laws are losslessly re-expandable, so the
standard is exact: decode must reproduce the sample formulas
bit-for-bit, and the DuckDB oracle recomputes the decoded-sample
statistics arithmetically — including both G.711 expansions, written
out in integer SQL.

Supported envelope (pinned fail-soft): AIFF mono 16-bit (AIFC
compressed variants return None), AU encodings 1, 3, and 27 mono
(float, ADPCM, 24-bit return None).

Reference analog: none — the reference pipeline is document-only; this
is part of the beyond-reference multimodal suite.

100 TB shape: identical to the other media operators — synthesis and
decode run executor-side inside Arrow batches via mapInPandas; no
sample data ever crosses an exchange or reaches the driver.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

# mirrors multimodal.WAV_RATES (pinned equal in TestAudioExtCodec) —
# importing it would cycle: multimodal's module-level oracle assembly
# imports this module's ORACLE constant
AUDIO_RATES = [8000, 16000, 44100]


# ------------------------------------------------- 80-bit extended float
def _float80_encode(value: int) -> bytes:
    """Integer -> IEEE-754 extended (1 sign, 15 exp bias 16383, 64-bit
    mantissa with explicit leading 1) — the AIFF COMM rate field."""
    if value == 0:
        return b"\x00" * 10
    e = value.bit_length() - 1
    mant = value << (63 - e)  # leading 1 lands in bit 63
    return struct.pack(">HQ", 16383 + e, mant)


def _float80_decode(b: bytes) -> int | None:
    if len(b) != 10:
        return None
    se, mant = struct.unpack(">HQ", b)
    if se & 0x8000 or (se == 0 and mant == 0):
        return 0 if se == 0 and mant == 0 else None  # negative rate
    e = (se & 0x7FFF) - 16383
    if not 0 <= e <= 62:
        return None
    # exact for integer rates: mantissa holds value << (63 - e)
    shift = 63 - e
    if mant & ((1 << shift) - 1):
        return None  # non-integer rate — outside the fixture envelope
    return mant >> shift


# ----------------------------------------------------------------- AIFF
def encode_aiff(samples: np.ndarray, rate: int) -> bytes:
    """Mono 16-bit big-endian PCM AIFF (FORM/AIFF + COMM + SSND)."""
    pcm = samples.astype(">i2").tobytes()
    comm = struct.pack(">hIh", 1, len(samples), 16) + _float80_encode(rate)
    ssnd = struct.pack(">II", 0, 0) + pcm
    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return cid + struct.pack(">I", len(payload)) + payload + pad
    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(data: bytes):
    """AIFF -> (rate, int16 array) or None.  Never raises."""
    try:
        if len(data) < 12 or data[:4] != b"FORM" or data[8:12] != b"AIFF":
            return None
        pos = 12
        end = min(len(data), 8 + struct.unpack(">I", data[4:8])[0])
        rate = n_frames = None
        pcm = None
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (ln,) = struct.unpack(">I", data[pos + 4 : pos + 8])
            payload = data[pos + 8 : pos + 8 + ln]
            if len(payload) != ln:
                return None
            if cid == b"COMM":
                if ln < 18:
                    return None
                ch, n_frames, bits = struct.unpack(">hIh", payload[:8])
                if ch != 1 or bits != 16:
                    return None
                rate = _float80_decode(payload[8:18])
                if not rate:
                    return None
            elif cid == b"SSND":
                if ln < 8:
                    return None
                off, _block = struct.unpack(">II", payload[:8])
                pcm = payload[8 + off :]
            pos += 8 + ln + (ln % 2)  # chunks are word-aligned
        if rate is None or pcm is None or n_frames is None:
            return None
        if len(pcm) < 2 * n_frames:
            return None
        x = np.frombuffer(pcm[: 2 * n_frames], dtype=">i2").astype(np.int16)
        return rate, x
    except Exception:
        return None


# ------------------------------------------------------------- G.711 mu-law
def ulaw_decode_byte(u: int) -> int:
    """Standard G.711 expansion: one transmitted (bit-inverted) byte ->
    16-bit linear sample.  Anchors: 0x00 -> -32124, 0xFF -> 0."""
    u = ~u & 0xFF
    e = (u >> 4) & 0x07
    m = u & 0x0F
    t = ((m << 3) + 0x84) << e
    t -= 0x84
    return -t if u & 0x80 else t


_ULAW_LUT = np.array([ulaw_decode_byte(u) for u in range(256)], np.int16)


def ulaw_decode(data: bytes) -> np.ndarray:
    return _ULAW_LUT[np.frombuffer(data, np.uint8)]


def ulaw_encode_sample(x: int) -> int:
    """Standard G.711 compression — the exact inverse of
    ``ulaw_decode_byte`` on its output lattice."""
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    if x > 32635:
        x = 32635
    x += 0x84
    e = 7
    mask = 0x4000
    while e > 0 and not (x & mask):
        e -= 1
        mask >>= 1
    m = (x >> (e + 3)) & 0x0F
    return ~(sign | (e << 4) | m) & 0xFF


# -------------------------------------------------------------- G.711 A-law
def alaw_decode_byte(a: int) -> int:
    """Standard G.711 A-law expansion: one transmitted byte (even bits
    inverted by the 0x55 mask) -> 13-bit-lattice linear sample.
    Anchors: 0x55 -> -8, 0xD5 -> +8, 0x2A -> -32256, 0xAA -> +32256.
    Note the sign convention is the OPPOSITE of mu-law's: a set MSB
    (after the mask) marks a POSITIVE sample."""
    a ^= 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


_ALAW_LUT = np.array([alaw_decode_byte(a) for a in range(256)], np.int16)


def alaw_decode(data: bytes) -> np.ndarray:
    return _ALAW_LUT[np.frombuffer(data, np.uint8)]


def alaw_encode_sample(x: int) -> int:
    """Standard G.711 A-law compression — the exact inverse of
    ``alaw_decode_byte`` on its output lattice (pinned over all 256
    codes in pytest)."""
    sign = 0x80 if x >= 0 else 0
    mag = x if x >= 0 else -x
    if mag > 0x7FFF:
        mag = 0x7FFF
    if mag < 256:
        seg, m = 0, mag >> 4
    else:
        seg = 1
        while mag >= (256 << seg) and seg < 7:
            seg += 1
        m = (mag >> (seg + 3)) & 0x0F
    return (sign | (seg << 4) | m) ^ 0x55


# -------------------------------------------------------------------- AU
def encode_au(payload: bytes, rate: int, encoding: int) -> bytes:
    """Sun AU: .snd magic, 24-byte header, big-endian payload."""
    return (
        struct.pack(">4sIIIII", b".snd", 24, len(payload), encoding, rate, 1)
        + payload
    )


def decode_au(data: bytes):
    """AU -> (rate, int16 array) or None.  Encodings: 3 = 16-bit PCM
    big-endian, 1 = G.711 mu-law, 27 = G.711 A-law.  Never raises."""
    try:
        if len(data) < 24 or data[:4] != b".snd":
            return None
        _, off, size, enc, rate, ch = struct.unpack(">4sIIIII", data[:24])
        if off < 24 or ch != 1 or enc not in (1, 3, 27) or rate == 0:
            return None
        if size == 0xFFFFFFFF:  # "unknown length" sentinel
            payload = data[off:]
        else:
            payload = data[off : off + size]
            if len(payload) != size:
                return None
        if enc == 3:
            x = np.frombuffer(
                payload[: 2 * (len(payload) // 2)], dtype=">i2"
            ).astype(np.int16)
        elif enc == 1:
            x = ulaw_decode(payload)
        else:
            x = alaw_decode(payload)
        return rate, x
    except Exception:
        return None


# ------------------------------------------------------- fixture + operator
# family = doc_id % 4: aiff PCM / au PCM / au mu-law / au A-law.  PCM
# families use the WAV sample formula ((7i + d) % 1000) - 500 so the
# AIFF/AU decode must agree bit-for-bit with the independently-gated
# WAV path; the mu-law family stores code bytes (11i + d) % 256 and the
# A-law family (13i + d) % 256, whose expansions the oracle recomputes
# with the G.711 arithmetic in integer SQL (the two companding laws
# have OPPOSITE sign conventions, so a mixed-up branch cannot pass).
# Rates stay indexed by doc_id % 3 (the WAV rate formula).
AUDIO_EXT_FMTS = ["aiff", "au_pcm", "au_ulaw", "au_alaw"]


def make_audio_ext(doc_id: int) -> bytes:
    n = 64 + doc_id % 64
    rate = AUDIO_RATES[doc_id % 3]
    fam = doc_id % 4
    if fam < 2:
        x = np.array(
            [((7 * i + doc_id) % 1000) - 500 for i in range(n)], np.int16
        )
        if fam == 0:
            return encode_aiff(x, rate)
        return encode_au(x.astype(">i2").tobytes(), rate, 3)
    if fam == 2:
        codes = bytes((11 * i + doc_id) % 256 for i in range(n))
        return encode_au(codes, rate, 1)
    codes = bytes((13 * i + doc_id) % 256 for i in range(n))
    return encode_au(codes, rate, 27)


def _audio_ext_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ("doc_id", "fmt", "sample_rate", "n_samples", "rms", "peak")
    for pdf in batches:
        rows = {k: [] for k in cols}
        for doc_id, media in zip(pdf["doc_id"].values, pdf["media"].values):
            fam = int(doc_id) % 4
            dec = (decode_aiff if fam == 0 else decode_au)(bytes(media))
            rows["doc_id"].append(doc_id)
            rows["fmt"].append(AUDIO_EXT_FMTS[fam])
            if dec is None or len(dec[1]) == 0:
                rows["sample_rate"].append(0)
                rows["n_samples"].append(0)
                rows["rms"].append(0.0)
                rows["peak"].append(0)
                continue
            rate, x = dec
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(len(x))
            rows["rms"].append(
                round(float(np.sqrt((x.astype(np.float64) ** 2).mean())), 6)
            )
            rows["peak"].append(int(np.abs(x.astype(np.int64)).max()))
        yield pd.DataFrame(rows)


def media_audio_ext(spark, sf_dir: str):
    """AIFF / AU audio path: genuine containers per doc -> mapInPandas
    runs the full decode (IFF chunk walk + 80-bit-float rate, AU header
    + G.711 mu-law expansion) on the actual bytes and emits the same
    signal features as the WAV path.  Driver-gated as
    ``media_features`` kind='audio_ext' (slice-pinned)."""
    from pyspark.sql import types as T

    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(T.BinaryType())
    def audio_udf(doc_id: pd.Series) -> pd.Series:
        return pd.Series([make_audio_ext(int(i)) for i in doc_id])

    media = d.select("doc_id", audio_udf("doc_id").alias("media"))
    return media.mapInPandas(
        _audio_ext_batch,
        schema=(
            "doc_id long, fmt string, sample_rate long, n_samples long, "
            "rms double, peak long"
        ),
    )


# mu-law expansion in integer SQL: u' = 255 - u (bit inversion),
# e = (u' // 16) % 8, m = u' % 16, t = (m*8 + 132) * 2^e - 132,
# sign negative when u' >= 128 — exactly ulaw_decode_byte.
MEDIA_AUDIO_EXT_ORACLE = f"""
WITH dims AS (
  SELECT doc_id,
         CAST(doc_id % 4 AS INT) AS fam,
         64 + doc_id % 64 AS n,
         ([{", ".join(str(r) for r in AUDIO_RATES)}])[CAST(doc_id % 3 AS INT) + 1]
             AS sample_rate
  FROM documents
),
pcm AS (
  SELECT d.doc_id, d.fam, d.n, d.sample_rate,
         ((7 * i + d.doc_id) % 1000) - 500 AS v
  FROM dims d, UNNEST(range(d.n)) AS u(i)
  WHERE d.fam < 2
),
ulaw AS (
  SELECT doc_id, fam, n, sample_rate,
         CASE WHEN uinv >= 128 THEN -t ELSE t END AS v
  FROM (
    SELECT d.doc_id, d.fam, d.n, d.sample_rate,
           255 - ((11 * i + d.doc_id) % 256) AS uinv
    FROM dims d, UNNEST(range(d.n)) AS u(i)
    WHERE d.fam = 2
  ), LATERAL (
    SELECT ((uinv % 16) * 8 + 132) * (1 << ((uinv // 16) % 8)) - 132 AS t
  )
),
-- A-law: a' = code XOR 85, m = a' % 16, seg = (a' // 16) % 8,
-- t = m*16+8 (seg 0) / m*16+264 (seg 1) / (m*16+264) << (seg-1);
-- sign POSITIVE when a' >= 128 (the opposite of mu-law) — exactly
-- alaw_decode_byte.
alaw AS (
  SELECT doc_id, fam, n, sample_rate,
         CASE WHEN ainv >= 128 THEN t ELSE -t END AS v
  FROM (
    SELECT d.doc_id, d.fam, d.n, d.sample_rate,
           xor((13 * i + d.doc_id) % 256, 85) AS ainv
    FROM dims d, UNNEST(range(d.n)) AS u(i)
    WHERE d.fam = 3
  ), LATERAL (
    SELECT CASE (ainv // 16) % 8
               WHEN 0 THEN (ainv % 16) * 16 + 8
               WHEN 1 THEN (ainv % 16) * 16 + 264
               ELSE ((ainv % 16) * 16 + 264)
                    * (1 << (((ainv // 16) % 8) - 1))
           END AS t
  )
),
s AS (
  SELECT * FROM pcm UNION ALL SELECT * FROM ulaw UNION ALL SELECT * FROM alaw
)
SELECT doc_id,
       (['aiff', 'au_pcm', 'au_ulaw', 'au_alaw'])[fam + 1] AS fmt,
       sample_rate::BIGINT AS sample_rate,
       n::BIGINT AS n_samples,
       round(sqrt(avg(CAST(v AS DOUBLE) * v)), 6) AS rms,
       max(abs(v))::BIGINT AS peak
FROM s GROUP BY doc_id, fam, n, sample_rate
"""
