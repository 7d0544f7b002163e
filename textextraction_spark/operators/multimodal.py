"""Multimodal binary-column plumbing (task brief §multimodal).

Treats media as opaque ``binary`` columns with typed metadata.  The
*plumbing* — schema, Arrow batch shape, ``mapInPandas`` signature,
deterministic routing by media kind — is real and tested; the actual
codec work is STUBBED (this image has no image/audio libraries):

- ``decode_stub``   derives deterministic fake dimensions from the bytes'
  md5 (stands in for a pillow/ffmpeg decode);
- ``real_decode``   raises NotImplementedError — the marked integration
  point for a real decoder.

Because the fake metadata is md5-derived, the DuckDB oracle can recompute
it from ``md5(text)``, giving the full value-hash gate over the plumbing.

Scale notes: media bytes never leave the executor; the UDF emits only
small metadata rows.  At 100 TB the same cap on Arrow batch bytes applies
as for html (pipeline config ``arrow_max_records``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]


def real_decode(data: bytes, kind: str):
    """The real decoder integration point — requires pillow/librosa/ffmpeg,
    none of which exist in this image."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this image; "
        "wire pillow/av here in production"
    )


def decode_stub(data: bytes, kind: str) -> dict:
    """Deterministic fake decode: md5-derived metadata (see module doc)."""
    h = int(hashlib.md5(data).hexdigest()[:8], 16)
    meta = {"n_bytes": len(data), "kind": kind}
    if kind == "image":
        meta.update(width=h % 1920, height=(h // 7) % 1080, n_frames=1)
    elif kind == "audio":
        meta.update(width=0, height=0, n_frames=h % 48000)
    else:  # video
        meta.update(width=h % 1920, height=(h // 7) % 1080, n_frames=1 + h % 240)
    # frame-sample every 2nd frame
    meta["n_sampled"] = (meta["n_frames"] + 1) // 2
    return meta


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [
            decode_stub(bytes(b), k)
            for b, k in zip(pdf["media"].values, pdf["kind"].values)
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "kind": [m["kind"] for m in metas],
                "n_bytes": [m["n_bytes"] for m in metas],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "n_frames": [m["n_frames"] for m in metas],
                "n_sampled": [m["n_sampled"] for m in metas],
            }
        )


def media_metadata(spark, sf_dir: str):
    """documents -> synthetic media bytes (utf-8 of text, routed to a kind
    by doc_id % 3) -> mapInPandas decode -> typed metadata."""
    from textextraction_spark.job.packaging import ensure_shipped

    ensure_shipped(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("kind"),
    )
    out = media.mapInPandas(
        _decode_batch,
        schema=(
            "doc_id long, kind string, n_bytes long, width long, height long, "
            "n_frames long, n_sampled long"
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


MEDIA_METADATA_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h,
         octet_length(encode(text)) AS n_bytes,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind
  FROM documents
)
SELECT doc_id,
       kind,
       n_bytes::BIGINT AS n_bytes,
       (CASE WHEN kind IN ('image', 'video') THEN h % 1920 ELSE 0 END)::BIGINT AS width,
       (CASE WHEN kind IN ('image', 'video') THEN (h // 7) % 1080 ELSE 0 END)::BIGINT AS height,
       (CASE kind WHEN 'image' THEN 1
                  WHEN 'audio' THEN h % 48000
                  ELSE 1 + h % 240 END)::BIGINT AS n_frames,
       ((CASE kind WHEN 'image' THEN 1
                   WHEN 'audio' THEN h % 48000
                   ELSE 1 + h % 240 END + 1) // 2)::BIGINT AS n_sampled
FROM t
"""
