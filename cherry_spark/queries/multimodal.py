"""Multimodal-column queries: exercise the binary+meta media schema and
the Arrow-batched decode plumbing against the driver's correctness gate.

The container has no image/audio codecs, so payloads are synthesized
(UTF-8 bytes of ``documents.text``) and the decode step is the
deterministic fake from ext/multimodal.py — but everything Spark-side
is the real 100 TB path: a binary payload column, a typed meta struct,
``mapInPandas`` over an iterator of Arrow batches, and explode fan-out
for frame sampling. Both queries have exact DuckDB oracles because the
fake decode is pure byte math (sha256 + big-endian header words) that
SQL can replay; outputs are integers only, so the hash compare is
immune to float representation drift.

Reference parity: the reference treats media as opaque bytes next to
typed metadata too (Arrow binary columns); cherry has no media decode
kernels, so these queries are part of the training-pipeline extension
surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.ext.multimodal import decode_image_features, frame_sample_plan
from cherry_spark.sources.tables import load_table

_N_FEATURE_BYTES = 8


def _synth_media(docs, kind: str):
    """documents -> MEDIA_SCHEMA-shaped rows (payload = UTF-8 text bytes)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(f"{kind}/fake").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


@query(
    "media_decode_features",
    oracle=f"""
    WITH h AS (
        SELECT doc_id AS media_id,
               hex(encode(text)) AS ph,          -- payload hex (UTF-8 bytes)
               sha256(text) AS dh,               -- digest hex of those bytes
               octet_length(encode(text)) AS nb
        FROM documents
    )
    SELECT media_id,
           CASE WHEN nb >= 8
                THEN CAST(('0x' || substr(ph, 1, 8))::BIGINT % 4096 AS INT)
                ELSE 0 END AS width,
           CASE WHEN nb >= 8
                THEN CAST(('0x' || substr(ph, 9, 8))::BIGINT % 4096 AS INT)
                ELSE 0 END AS height,
           3 AS channels,
           {", ".join(
               f"CAST(('0x' || substr(dh, {2 * i + 1}, 2))::INT AS INT) AS d{i}"
               for i in range(_N_FEATURE_BYTES)
           )}
    FROM h
    """,
    doc="Image-feature extraction over a binary media column via the "
    "real mapInPandas iterator-of-Arrow-batches path (bounded memory "
    "per batch regardless of partition size — the shape 100 MB+ "
    "payloads need). The fake codec derives (width, height) from the "
    "first 8 payload bytes and an 8-byte sha256 feature; the driver "
    "projection recovers the exact digest bytes as ints "
    "(round(feature*255)), so Spark and DuckDB compare bit-for-bit "
    "with no float tolerance.",
)
def media_decode_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = _synth_media(docs, "image")
    feats = decode_image_features(media, feature_dim=_N_FEATURE_BYTES, codec="fake")
    # feature[i] is digest_byte/255.0 as float32; *255 + round recovers
    # the byte exactly (float32 relative error ~1e-7 << 1/510).
    return feats.select(
        "media_id",
        "width",
        "height",
        "channels",
        *[
            F.round(F.element_at("feature", i + 1) * 255, 0)
            .cast("int")
            .alias(f"d{i}")
            for i in range(_N_FEATURE_BYTES)
        ],
    )


@query(
    "media_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(generate_series(
               0,
               greatest(CAST(floor(octet_length(encode(text)) / 32.0) AS INT) - 1, 0),
               3
           )) AS INT) AS frame_index
    FROM documents
    """,
    doc="Video frame-sampling plan: every 3rd frame index of each clip "
    "(frame count modeled as n_bytes/32) via native sequence+explode "
    "fan-out — one output row per frame to decode, fully distributed, "
    "no driver loop. Spark's sequence(0, stop, step) is inclusive of "
    "stop, matching DuckDB generate_series; the frame count uses an "
    "explicit floor because DuckDB CAST(double AS INT) rounds while "
    "Spark truncates.",
)
def media_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = _synth_media(docs, "video")
    return frame_sample_plan(media, every_nth=3, frame_bytes=32)


_AHASH_DIM = 16


def _ahash_oracle() -> str:
    bytes_sql = [
        f"('0x' || substr(dh, {2 * i + 1}, 2))::BIGINT" for i in range(_AHASH_DIM)
    ]
    total = " + ".join(bytes_sql)
    bits = " + ".join(
        f"CASE WHEN {b} * {_AHASH_DIM} > tot THEN {1 << i} ELSE 0 END"
        for i, b in enumerate(bytes_sql)
    )
    return f"""
    WITH h AS (
        SELECT doc_id AS media_id, sha256(text) AS dh FROM documents
    ),
    ph AS (
        SELECT media_id, dh, ({total}) AS tot FROM h
    ),
    hashed AS (
        SELECT media_id, CAST({bits} AS BIGINT) AS ahash FROM ph
    )
    SELECT ahash,
           CAST(count(*) AS BIGINT) AS n_items,
           min(media_id) AS first_media_id
    FROM hashed GROUP BY ahash HAVING count(*) > 1
    """


@query(
    "media_phash_dedup",
    oracle=_ahash_oracle(),
    doc="Perceptual-hash image dedup: average-hash (bit i = thumbnail "
    "byte above the per-image mean, integer-only arithmetic) over the "
    "decoded feature row, then ONE hash aggregation for duplicate "
    "buckets — the image-dedup candidate stage (verify inside buckets "
    "at scale, never all-pairs). Certified on the fake-codec path "
    "(sha256-derived bytes, same expression); on PIL executors the "
    "feature row is a real grayscale thumbnail and this is the classic "
    "aHash (ext/multimodal.py:image_ahash).",
)
def media_phash_dedup(spark, sf_dir):
    from cherry_spark.ext.multimodal import ahash_dup_groups

    # parallelize measured a LOSS here even with the heavy native hash
    # map (1.20 -> 1.71 s median at sf0.1): the map feeds a map-side
    # partial agg, so the extra exchange outweighs the single-core scan
    # (the repetition_stats lesson)
    docs = load_table(spark, sf_dir, "documents")
    media = _synth_media(docs, "image")
    feats = decode_image_features(media, feature_dim=_AHASH_DIM, codec="fake")
    return ahash_dup_groups(feats, feature_dim=_AHASH_DIM)
