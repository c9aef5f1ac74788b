"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

Real in this module (and tested): the schema convention, the
mapInPandas batch shape (iterator of pandas frames — constant memory
per batch regardless of partition size), partition-count control for
decode fan-out, and deterministic header parsing. Pixel decoding is
probed: executors with PIL run the real decode; otherwise (this
container has no image/audio libraries) the fake codec derives
deterministic features from the payload bytes instead — same schema,
same batching, same scale behavior. Oracle-gated queries pin
``codec="fake"`` so differential checks stay bit-exact everywhere.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _probe_codecs() -> bool:
    """True = use the deterministic fake codec.

    Probed, not hardcoded: the real pixel path activates automatically
    on a cluster whose executors have PIL installed (the module is
    re-imported — and thus re-probed — on each executor). Set
    ``CHERRY_FAKE_CODECS=1`` to pin the deterministic fake even where
    PIL exists (the fake is the oracle path for differential gates),
    or ``=0`` to force the real path and fail loudly if PIL is absent.
    """
    forced = os.environ.get("CHERRY_FAKE_CODECS")
    if forced is not None:
        return forced.strip().lower() not in ("0", "false", "")
    try:
        import PIL.Image  # noqa: F401

        return False
    except ImportError:
        return True


CHERRY_FAKE_CODECS = _probe_codecs()

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def read_binary_files(spark, path: str, pattern: str = "*") -> DataFrame:
    """Ingest raw media files as (path, modificationTime, length, content)
    — Spark's binaryFile source; at scale, partitioned by directory
    layout the same way parquet tables are."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )


def _fake_image_decode(payload: bytes, dim: int = 8) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for pixel decoding: header-derived shape +
    sha256-derived feature vector. Replace with PIL/torchvision on a
    cluster with codecs installed."""
    if len(payload) >= 8:
        width = int.from_bytes(payload[0:4], "big") % 4096
        height = int.from_bytes(payload[4:8], "big") % 4096
    else:
        width = height = 0
    digest = hashlib.sha256(payload).digest()
    feature = [b / 255.0 for b in digest[:dim]]
    return width, height, 3, feature


def _fake_features_native(df: DataFrame, feature_dim: int) -> DataFrame:
    """The fake codec compiled to native Spark expressions — the
    ``codec="fake"`` lane is pure byte math (header words + sha256
    digest bytes), so it needs no Python worker at all (r15, guide §4:
    the mapInPandas form paid an ArrowEvalPython boundary plus a
    per-row Python hashlib call for work sha2/substring/conv express
    inside whole-stage codegen).  Bit-identical to the pandas lane:
    same big-endian header words mod 4096, same sha256 hex bytes, and
    ``b / 255.0`` is one exact double division + float cast in both.
    """
    payload = F.col("payload")
    dh = F.sha2(payload, 256)  # 64-char lowercase hex of sha256(payload)

    def word(pos: int) -> "F.Column":
        # big-endian u32 from payload bytes [pos, pos+4)
        return F.conv(F.hex(F.substring(payload, pos, 4)), 16, 10).cast("long")

    has_hdr = F.octet_length(payload) >= 8
    width = F.when(has_hdr, word(1) % 4096).otherwise(F.lit(0)).cast("int")
    height = F.when(has_hdr, word(5) % 4096).otherwise(F.lit(0)).cast("int")
    feature = F.array(
        *[
            (
                F.conv(F.substring(dh, 2 * i + 1, 2), 16, 10).cast("int")
                / F.lit(255.0)
            ).cast("float")
            for i in range(min(feature_dim, 32))  # digest[:dim], ≤32 bytes
        ]
    )
    ok = payload.isNotNull()
    return df.select(
        F.col("media_id"),
        F.when(ok, width).alias("width"),
        F.when(ok, height).alias("height"),
        F.when(ok, F.lit(3).cast("int")).alias("channels"),
        F.when(ok, feature).alias("feature"),
    )


def decode_image_features(
    df: DataFrame, feature_dim: int = 8, codec: str = "auto"
) -> DataFrame:
    """media rows -> image features.

    ``codec="fake"`` compiles to native expressions (no Python worker —
    see ``_fake_features_native``).  "auto"/"real" run mapInPandas: the
    UDF consumes an iterator of Arrow-backed pandas batches, so memory
    is bounded by spark.sql.execution.arrow.maxRecordsPerBatch, not by
    partition size — the correct shape for 100 MB+ payload columns and
    the only shape a real PIL decode can take.

    ``codec``: "auto" uses the executor-side probe (real PIL decode
    when available), "fake"/"real" pin a path — oracle-gated queries
    pin "fake" so the differential hash is environment-independent.
    """
    if codec not in ("auto", "fake", "real"):
        raise ValueError(f"codec must be auto|fake|real, got {codec!r}")
    if codec == "fake":
        return _fake_features_native(df, feature_dim)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib  # re-import: runs on executors

        # "auto" probes on the EXECUTOR (this function body runs there):
        # a closure-captured driver-side probe would ship fake=False to
        # an executor without PIL and abort the job on import. "real"
        # still fails loudly if PIL is absent — that pin is a promise.
        fake = _probe_codecs() if codec == "auto" else (codec == "fake")

        def one(payload):
            if payload is None:
                return (None, None, None, None)
            b = bytes(payload)
            if not fake:
                # Real path (executors with PIL): decode, record true
                # dims, grayscale-thumbnail row as the feature vector.
                # Corrupt payloads yield a null row, not a failed job.
                import io

                from PIL import Image

                try:
                    img = Image.open(io.BytesIO(b))
                    w, h = img.size
                    channels = len(img.getbands())
                    row = img.convert("L").resize((feature_dim, 1)).tobytes()
                    return (w, h, channels, [x / 255.0 for x in row])
                except Exception:
                    return (None, None, None, None)
            w = int.from_bytes(b[0:4], "big") % 4096 if len(b) >= 8 else 0
            h = int.from_bytes(b[4:8], "big") % 4096 if len(b) >= 8 else 0
            digest = _hashlib.sha256(b).digest()
            return (w, h, 3, [x / 255.0 for x in digest[:feature_dim]])

        for pdf in batches:
            decoded = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "feature": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_nth: int = 10, frame_bytes: int = 1024
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (the decode of each frame is the stubbed step). Demonstrates
    the explode-based fan-out that keeps frame extraction distributed.

    ``frame_bytes`` models the per-frame payload size (``n_bytes /
    frame_bytes`` frames per clip); int cast after ``/`` truncates, so
    a DuckDB twin must use floor() explicitly (DuckDB rounds on cast).
    """
    n_frames = (
        F.coalesce(F.col("meta.n_bytes"), F.lit(0)) / F.lit(frame_bytes)
    ).cast("int")
    frame_ids = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_nth)
    )
    return df.filter(F.col("kind") == "video").select(
        "media_id", F.explode(frame_ids).alias("frame_index")
    )


def image_ahash(
    feats: DataFrame, feature_dim: int = 16, out_col: str = "ahash"
) -> DataFrame:
    """Average-hash (aHash) from decoded image features: bit i is set
    iff feature byte i is above the per-image mean — on the real PIL
    codec the feature row IS a grayscale thumbnail, so this is the
    classic perceptual aHash; on the fake codec it hashes the
    sha256-derived bytes with the identical expression (the certified
    path). Integer-only: byte·dim > Σbytes avoids a float mean, so
    both engines compare exactly.

    Input: ``decode_image_features`` output. Appends ``out_col``
    (BIGINT, low ``feature_dim`` bits).

    The byte array is bound as a lambda VARIABLE (the
    transform-over-array(expr) escape, CLAUDE.md): the fold references
    each byte 1 + 2·dim times, and with the feature array now built by
    native expressions (r15) CollapseProject would otherwise inline
    the whole construction into every reference. The fold body is the
    same literal chain as before — byte order, when/otherwise null
    semantics (null feature → ahash 0), and OOB element_at behavior
    are unchanged, so results are bit-identical."""
    bytes_arr = F.transform(
        F.col("feature"),
        lambda x: F.round(x.cast("double") * 255, 0).cast("long"),
    )

    def _fold(ba):
        bs = [F.element_at(ba, i + 1) for i in range(feature_dim)]
        total = bs[0]
        for b in bs[1:]:
            total = total + b
        phash = F.lit(0).cast("long")
        for i, b in enumerate(bs):
            phash = phash + F.when(
                b * feature_dim > total, F.lit(1 << i)
            ).otherwise(F.lit(0)).cast("long")
        return phash

    return feats.withColumn(
        out_col, F.element_at(F.transform(F.array(bytes_arr), _fold), 1)
    )


def ahash_dup_groups(
    feats: DataFrame, feature_dim: int = 16, id_col: str = "media_id"
) -> DataFrame:
    """(ahash, n_items, first_media_id) for hash buckets holding more
    than one image — the candidate groups an image-dedup stage
    verifies (at scale: equi-join on the hash, exact/CNN verify within
    the bucket; never all-pairs). One hash aggregation."""
    return (
        image_ahash(feats, feature_dim)
        .groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min(id_col).alias("first_media_id"),
        )
        .filter(F.col("n_items") > 1)
    )
