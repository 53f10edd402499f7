"""Multimodal-column operators: opaque ``binary`` payloads with typed
metadata, JSON prop extraction, and a Pandas-UDF decode/feature
pipeline over ``mapInPandas``.

The decode step is REAL byte decoding (round 3; the stub is gone): the
synthetic media corpus synthesizes each payload as a valid 24-bit BMP —
a 54-byte BITMAPFILEHEADER+BITMAPINFOHEADER built IN-PLAN (little-endian
fields assembled with hex/unhex expressions) whose width/height are the
md5-derived geometry the oracles state, followed by the document's utf-8
bytes as the pixel payload. ``decode_image_real`` is a pure-Python BMP
header parser (magic check, LE field extraction, pixel-slice hash), so
the ``mapInPandas`` pipeline exercises true byte decoding end to end
while every oracle stays expressible over ``documents``. Swapping in
PIL/ffmpeg for richer codecs still changes exactly one function.
(The container ships no image/audio codec libraries, which is why the
fixture format is self-describing BMP rather than JPEG.)

100 TB scale design: payloads stay in parquet binary columns and are
only materialized inside the Arrow batches of the decode stage —
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory
(set in the engine confs); metadata-only queries never touch the blob
column thanks to parquet column pruning. Decode is embarrassingly
parallel; frame-sampling fans out rows with ``explode`` BEFORE decode
so a long video never serializes through one task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..queries import register
from ..sources.registry import register_sources
from .util import ensure_min_partitions

FRAME_STRIDE = 7  # sample every 7th synthetic frame


BMP_PIXEL_OFFSET = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def _le32hex(c) -> "F.Column":
    """8-hex-char little-endian encoding of a non-negative int column —
    the byte order BMP header fields use."""
    h = F.lpad(F.hex(c.cast("bigint")), 8, "0")
    return F.lower(
        F.concat(
            F.substring(h, 7, 2),
            F.substring(h, 5, 2),
            F.substring(h, 3, 2),
            F.substring(h, 1, 2),
        )
    )


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic media table: binary payload + typed metadata struct.

    media_id / media_blob (binary) / meta struct<kind, n_bytes, lang> —
    the schema shape a real image/audio lake table would carry.

    ``media_blob`` is a REAL (if minimal) 24-bit BMP: a 54-byte header
    whose width/height are the md5-derived geometry the decode oracles
    state, then the document's utf-8 bytes as the pixel payload. The
    header assembles in-plan from hex text (one ``unhex`` at the end),
    so payload synthesis is codegen'd projection work — no UDF.
    ``meta.n_bytes`` counts the PIXEL payload (the content), matching
    the oracles' ``strlen(text)``.
    """
    d = register_sources(spark, sf_dir, tables=("documents",))["documents"]
    md5t = F.md5(F.encode("text", "UTF-8"))
    width = (F.conv(F.substring(md5t, 1, 4), 16, 10).cast("bigint") % 1024).cast("int")
    height = (F.conv(F.substring(md5t, 5, 4), 16, 10).cast("bigint") % 1024).cast("int")
    pixels = F.encode("text", "UTF-8")
    n_pixel_bytes = F.octet_length(pixels)
    header_hex = F.concat(
        F.lit("424d"),                                  # 'BM'
        _le32hex(n_pixel_bytes + F.lit(BMP_PIXEL_OFFSET)),  # file size
        F.lit("00000000"),                              # reserved
        _le32hex(F.lit(BMP_PIXEL_OFFSET)),              # pixel-data offset
        _le32hex(F.lit(40)),                            # info-header size
        _le32hex(width),
        _le32hex(height),
        F.lit("0100"), F.lit("1800"),                   # planes=1, bpp=24
        _le32hex(F.lit(0)),                             # compression
        _le32hex(n_pixel_bytes),                        # image size
        F.lit("00" * 16),                               # resolution/colors
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.concat(header_hex, F.hex(pixels))).alias("media_blob"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("kind"),
            F.col("n_chars").alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_image_real(blob: bytes) -> tuple[int, int, str, int]:
    """Pure-Python BMP decode: validate the magic, read width/height
    from the little-endian header fields, hash the pixel slice.
    Returns (width, height, phash, n_pixel_bytes). Malformed payloads
    fail loudly — a corpus row that is not a BMP is a data bug, not a
    value to guess at."""
    if len(blob) < BMP_PIXEL_OFFSET or bytes(blob[:2]) != b"BM":
        raise ValueError(
            f"not a BMP payload (len={len(blob)}, magic={bytes(blob[:2])!r})"
        )
    offset = int.from_bytes(blob[10:14], "little")
    width = int.from_bytes(blob[18:22], "little", signed=True)
    height = int.from_bytes(blob[22:26], "little", signed=True)
    pixels = bytes(blob[offset:])
    phash = hashlib.md5(pixels).hexdigest()[:16]
    return width, height, phash, len(pixels)


# -- metadata-only query (never touches the blob) --------------------------


@register(
    "mm_media_stats",
    """
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           lang,
           count(*) AS n_media,
           -- CAST: DuckDB sum(int) -> HUGEINT -> pandas float64 (driver
           -- dtype hash-fail vs Spark int64)
           CAST(sum(n_chars) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1, 2
    """,
)
def mm_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata aggregation over the media table. The blob column is
    pruned out of the parquet scan (metadata-only queries stay cheap
    however large the payloads are)."""
    m = _media(spark, sf_dir)
    return m.groupBy(
        F.col("meta.kind").alias("kind"), F.col("meta.lang").alias("lang")
    ).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
    )


# -- Pandas-UDF decode / feature-extract over mapInPandas ------------------

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("phash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in, decoded-feature batch out.
    Each row's BMP bytes are actually parsed (``decode_image_real``)."""
    for pdf in batches:
        decoded = [decode_image_real(b) for b in pdf["media_blob"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "phash": [d[2] for d in decoded],
                "n_bytes": [d[3] for d in decoded],
            }
        )


@register(
    "mm_decode_features",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           ('0x' || substr(md5(text), 1, 4))::INT % 1024 AS width,
           ('0x' || substr(md5(text), 5, 4))::INT % 1024 AS height,
           substr(md5(text), 1, 16) AS phash,
           strlen(text) AS n_bytes
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via a Pandas-UDF ``mapInPandas``
    pipeline: binary payload -> (width, height, perceptual hash).

    The decode is REAL byte decoding (round 3): each payload is a valid
    BMP synthesized in-plan, and the worker parses its header fields
    and hashes its pixel slice. The oracle states the same values from
    ``documents`` because the header was built from them — the decoder
    never sees that derivation, only bytes.
    """
    m = ensure_min_partitions(
        _media(spark, sf_dir).select(
            "media_id", F.col("meta.kind").alias("kind"), "media_blob"
        )
    )
    return m.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


# -- frame sampling (explode-before-decode) --------------------------------


@register(
    "mm_frame_sample",
    f"""
    WITH frames AS (
      -- n_chars, NOT strlen: meta.n_bytes aliases the n_chars column
      -- (see _media), so both engines count codepoints here
      SELECT doc_id AS media_id, unnest(generate_series(0, n_chars - 1, {FRAME_STRIDE})) AS frame_no
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT media_id, count(*) AS n_frames, max(frame_no) AS last_frame
    FROM frames GROUP BY media_id
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for the 'video/audio' rows: one output row per
    sampled frame index, generated with ``sequence`` + ``explode``
    BEFORE any decode so downstream per-frame work parallelizes across
    tasks instead of serializing inside one row."""
    # n_bytes >= 1: Spark's sequence(0, -1, stride) is an error, not an
    # empty range (round-8 hypothesis find: empty-text docs synthesize
    # 0-byte payloads); DuckDB's generate_series is empty there, so a
    # 0-byte medium contributing no frames — and no group row — is the
    # agreed semantics.
    m = (
        _media(spark, sf_dir)
        .filter(F.col("meta.kind") == "audio")
        .filter(F.col("meta.n_bytes") >= 1)
    )
    frames = m.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_bytes") - 1, F.lit(FRAME_STRIDE)
            )
        ).alias("frame_no"),
    )
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_no").alias("last_frame"),
    )


# -- JSON prop extraction (events.props) -----------------------------------


@register(
    "mm_props_extract",
    """
    SELECT event_type,
           count(*) AS n_events,
           -- outer CAST: DuckDB sum(BIGINT) -> HUGEINT -> pandas float64
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def mm_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured ``events.props`` JSON
    column via ``from_json`` (schema-on-read for sidecar metadata)."""
    e = register_sources(spark, sf_dir, tables=("events",))["events"]
    parsed = e.select(
        "event_type",
        F.from_json("props", "k BIGINT").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("p.k").alias("sum_k"),
        F.round(F.avg("p.k"), 4).alias("avg_k"),
    )


# -- Pandas-UDF resize (thumbnailing) over mapInPandas ---------------------

THUMB_BOX = 128  # bounding box for thumbnails (longest side)


def resize_image_real(blob: bytes, box: int) -> bytes:
    """Fit a BMP payload into a ``box``-px bounding box (aspect
    preserved, never upscaled) and emit a REAL BMP thumbnail: the
    header re-encodes the fitted geometry and the pixel payload is a
    1-D nearest-neighbor subsample of the source pixel bytes, scaled by
    the same area ratio a 2-D resample would apply. Pure Python, round-
    trippable through :func:`decode_image_real`."""
    w, h, _phash, _n = decode_image_real(blob)
    mx = max(w, h)
    if mx <= box or mx == 0:
        ow, oh = w, h
    else:
        ow = w * box // mx
        oh = h * box // mx
    src = bytes(blob[BMP_PIXEL_OFFSET:])
    in_px, out_px = max(1, w * h), max(1, ow * oh)
    n_out = max(1, len(src) * out_px // in_px) if src else 0
    step = max(1, len(src) // n_out) if n_out else 1
    pixels = src[::step][:n_out]
    header = (
        b"BM"
        + (BMP_PIXEL_OFFSET + len(pixels)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + BMP_PIXEL_OFFSET.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + ow.to_bytes(4, "little", signed=True)
        + oh.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pixels


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("in_w", T.IntegerType()),
        T.StructField("in_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("thumb_phash", T.StringType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: REAL decode -> resize -> re-decode. The input
    BMP is parsed, ``resize_image_real`` emits actual thumbnail bytes,
    and the reported output geometry is read back from the THUMBNAIL's
    header — so the round trip (encode in-plan, decode, re-encode,
    decode) is what the oracle value-checks, not a parallel arithmetic
    path."""
    for pdf in batches:
        rows = []
        for media_id, blob in zip(pdf["media_id"], pdf["media_blob"]):
            w, h, phash, _n = decode_image_real(blob)
            thumb = resize_image_real(blob, THUMB_BOX)
            ow, oh, _tph, _tn = decode_image_real(thumb)
            rows.append((media_id, w, h, ow, oh, phash))
        yield pd.DataFrame(
            rows, columns=["media_id", "in_w", "in_h", "out_w", "out_h", "thumb_phash"]
        )


@register(
    "mm_resize_thumbs",
    """
    WITH geom AS (
      SELECT doc_id AS media_id,
             CAST(('0x' || substr(md5(text), 1, 4))::BIGINT % 1024 AS INT) AS in_w,
             CAST(('0x' || substr(md5(text), 5, 4))::BIGINT % 1024 AS INT) AS in_h,
             substr(md5(text), 1, 16) AS thumb_phash
      FROM documents
    )
    SELECT media_id, in_w, in_h,
           CAST(CASE WHEN greatest(in_w, in_h) <= 128 THEN in_w
                ELSE (in_w * 128) // greatest(in_w, in_h) END AS INT) AS out_w,
           CAST(CASE WHEN greatest(in_w, in_h) <= 128 THEN in_h
                ELSE (in_h * 128) // greatest(in_w, in_h) END AS INT) AS out_h,
           thumb_phash
    FROM geom
    """,
)
def mm_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail resize stage: every payload fit into a 128px bounding
    box (aspect preserved, never upscaled) via ``mapInPandas``.

    Same plumbing contract as the decode stage: Arrow batches of binary
    payloads in, fixed-schema features out, codec stubbed behind
    ``resize_image_real``. The oracle reproduces the md5-derived
    geometry and the integer floor-division fit, so the whole
    stage — batching, schema, arithmetic — is value-checked.

    Scale: embarrassingly parallel; ``ensure_min_partitions`` spreads
    the single-file test corpus, a no-op on real multi-split inputs.
    Thumbnail bytes would add ~box^2 x 3 per row to the Arrow batch —
    still bounded by maxRecordsPerBatch.
    """
    m = ensure_min_partitions(_media(spark, sf_dir).select("media_id", "media_blob"))
    return m.mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


@register(
    "mm_payload_dedup",
    """
    SELECT md5(text) AS payload_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_media_id,
           min(CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END) AS kind
    FROM documents
    GROUP BY md5(text)
    """,
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media payload dedup: group binary blobs by content hash, keep
    the lowest media_id as canonical — byte-identical re-uploads (the
    dominant duplication mode in scraped media corpora) collapse
    before any decode spend.

    In production the hash column is written at INGEST time so dedup
    never re-reads payloads; here md5 computes over the binary column
    in-plan to exercise that path. Perceptual (near-dup) hashing slots
    in as a second column from the decode stage — the grouping shape
    is identical, which is the point: pHash dedup is THIS query with a
    different key (the decode stub is the honest boundary in this
    container; see module docstring).

    Scale: one shuffle of (16-byte hash, id, kind) — payload bytes
    never move; the blob column prunes out of the scan after the hash
    projection. The hash covers the PIXEL slice (the content): two
    encodes of the same image differ only in header bookkeeping, and
    hashing past the self-described pixel offset is exactly what an
    ingest-time content hash does.
    """
    m = _media(spark, sf_dir).withColumn(
        "media_blob", F.expr(f"substring(media_blob, {BMP_PIXEL_OFFSET + 1})")
    )
    # No HAVING: the full per-payload table (n_copies marks the dup
    # groups) feeds both the collapse join and ingest metrics; the
    # synthetic corpus has no byte-identical re-uploads, so a >= 2
    # filter would pin an empty result — the unfiltered relation keeps
    # every value under the oracle.
    return (
        m.groupBy(F.md5("media_blob").alias("payload_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("canonical_media_id"),
            F.min("meta.kind").alias("kind"),
        )
    )
