"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schemas, partition-friendly batch iteration,
Arrow transfer shape, UDF signatures — is real and tested.  The actual
media decoding is STUBBED (this container ships no image/audio codecs):
``decoder="fake"`` produces deterministic synthetic features derived
from the bytes, and ``decoder="real"`` raises NotImplementedError at
the exact seam where PIL/ffmpeg would plug in.  Swapping the stub for a
real codec changes no Spark plumbing.

Scale notes: media blobs make rows wide — the mapInPandas iterator
processes one Arrow batch at a time and never materializes a partition,
so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch × max_blob_size``.
Production tables should cap blob size at write time and store larger
media out-of-row (paths + byte ranges) — the metadata struct below has
a ``uri`` field for exactly that.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("format", T.StringType(), True),  # png | wav | mp4 | ...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("uri", T.StringType(), True),  # out-of-row storage pointer
    ]
)

MEDIA_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("blob_sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
    ]
)


def _fake_decode_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode → feature-extract: expands the
    blob digest into a unit-norm float vector.  Same bytes → same
    features, everywhere."""
    digest = hashlib.sha256(blob).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    decoder: str = "fake",
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """blob → (media_id, n_bytes, blob_sha256, feature[dim]).

    ``decoder="real"`` is the seam for PIL/torchaudio/ffmpeg — it
    raises NotImplementedError here because the codecs are not in this
    container (task brief: stub the decode, keep the plumbing real).
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def gen(batches):
        for pdf in batches:
            ids, nbytes, shas, feats = [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else b""
                if decoder == "real":
                    raise NotImplementedError(
                        "real media decoding requires PIL/ffmpeg — not in this image"
                    )
                ids.append(mid)
                nbytes.append(len(blob))
                shas.append(hashlib.sha256(blob).hexdigest())
                feats.append(_fake_decode_features(blob, dim))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": nbytes,
                    "blob_sha256": shas,
                    "feature": feats,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(gen, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized_sha256", T.StringType(), False),
        T.StructField("n_bytes_in", T.LongType(), False),
    ]
)


def resize_media(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    decoder: str = "fake",
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """blob → resized-image record (media_id, width, height,
    resized_sha256, n_bytes_in).

    Arrow-batched like extract_features; ``decoder="real"`` is the
    PIL/ffmpeg seam (NotImplementedError in this container, per the
    task brief).  The fake decode emits sha256(blob || "|WxH") — a
    deterministic stand-in any engine can recompute, which keeps the
    batch shape, schema, and partitioning behavior real and testable.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    suffix = f"|{width}x{height}".encode()

    def gen(batches):
        for pdf in batches:
            ids, shas, nbytes = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                if decoder == "real":
                    raise NotImplementedError(
                        "real image resizing requires PIL/ffmpeg — not in this image"
                    )
                blob = bytes(blob) if blob is not None else b""
                ids.append(mid)
                nbytes.append(len(blob))
                shas.append(hashlib.sha256(blob + suffix).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "resized_sha256": shas,
                    "n_bytes_in": nbytes,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(gen, RESIZE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_idx, ts_ms) rows via
    a JVM-side sequence explode over the metadata duration — the decode
    of each planned frame is the stubbed seam above.  Keeping the plan
    relational means Catalyst can prune/filter frames before any decode
    work is scheduled."""
    # Spark's sequence(0, -1, step) is a runtime error, not an empty
    # array (CLAUDE.md trap) — videos with NULL/0 duration plan zero
    # frames instead of crashing the job.
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    ts = F.when(
        dur >= 1, F.sequence(F.lit(0), dur - 1, F.lit(every_ms))
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.filter(F.col("meta.kind") == "video")
        .select(F.col(id_col), F.posexplode(ts).alias("frame_idx", "ts_ms"))
    )


def synthetic_media_table(spark, n_rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benches: blobs are
    seeded byte strings, metadata alternates kinds."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        blob = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                bytearray(blob),
                (
                    kind,
                    {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                    64 if kind == "image" else None,
                    64 if kind == "image" else None,
                    16000 if kind == "audio" else None,
                    5000 if kind == "video" else None,
                    f"s3://media/{kind}/{i}",
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_TABLE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL decode for stdlib-decodable formats (BMP / PCM WAV / PNG) — see
# pipeline/media_codecs.py.  JPEG/MP4 remain stubbed above: those need
# codec libraries this container lacks.
# ---------------------------------------------------------------------------

DECODABLE_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("true_ok", T.BooleanType(), False),
        T.StructField("true_format", T.StringType(), True),
        T.StructField("true_width", T.IntegerType(), True),
        T.StructField("true_height", T.IntegerType(), True),
        T.StructField("true_sample_rate", T.IntegerType(), True),
        T.StructField("true_n_samples", T.LongType(), True),
        T.StructField("true_sha", T.StringType(), True),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def synthetic_decodable_media(spark, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic table of REAL media blobs: ids cycle 24-bit BMP /
    16-bit PCM WAV / 8-bit truecolor PNG (mid % 3), every 17th id
    truncated (corrupt).  Ground-truth columns come from the arrays the
    encoder consumed — NOT from decoding — so comparing the decoder's
    output against them is a true encode→bytes→decode differential.
    The PNG encoder cycles all five scanline filter types, so the
    decode path exercises the full unfilter set."""
    import numpy as np

    from medea_spark.pipeline.media_codecs import (
        encode_bmp,
        encode_png,
        encode_wav,
        pcm_sha256,
        pixel_sha256,
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                h = int(hashlib.md5(f"{seed}:media:{mid}".encode()).hexdigest(), 16)
                if mid % 3 != 1:
                    w = 3 + h % 14
                    hh = 2 + (h >> 8) % 12
                    if mid % 3 == 2:
                        hh = max(hh, 6)  # ≥6 rows → every PNG filter type used
                    y, x = np.mgrid[0:hh, 0:w]
                    px = np.stack(
                        [(x * 7 + y * 13 + mid + c * 29) % 256 for c in range(3)],
                        axis=2,
                    ).astype(np.uint8)
                    if mid % 3 == 0:
                        blob = encode_bmp(px)
                        truth = ("bmp", w, hh, None, None, pixel_sha256(px))
                    else:
                        blob = encode_png(px)
                        truth = ("png", w, hh, None, None, pixel_sha256(px))
                else:
                    ch = 1 + (h >> 4) % 2
                    rate = (8000, 16000, 22050)[h % 3]
                    n = 50 + (h >> 12) % 200
                    i, c = np.mgrid[0:n, 0:ch]
                    samples = (((i * 31 + c * 17 + mid * 7) % 65536) - 32768).astype(
                        np.int16
                    )
                    blob = encode_wav(samples, rate)
                    truth = ("wav", None, None, rate, n, pcm_sha256(samples))
                if mid % 17 == 0:
                    rows.append(
                        (mid, blob[:10], False, None, None, None, None, None, None)
                    )
                else:
                    fmt, w_, h_, r_, n_, sha = truth
                    rows.append((mid, blob, True, fmt, w_, h_, r_, n_, sha))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in DECODABLE_MEDIA_SCHEMA.fields],
            )

    return spark.range(n_rows).mapInPandas(gen, DECODABLE_MEDIA_SCHEMA)


def decode_media(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL decode of BMP/WAV/PNG blobs inside Arrow batches: parses the
    actual bytes (magic sniffing → header walk → inflate/unfilter →
    payload reconstruction) and emits dimensions / sample counts /
    canonical content hashes.  Malformed blobs become (decode_ok=false,
    error) rows — one bad blob never kills the job."""
    from medea_spark.pipeline.media_codecs import (
        PNG_SIGNATURE,
        MediaDecodeError,
        decode_bmp,
        decode_png,
        decode_wav,
        pcm_sha256,
        pixel_sha256,
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                mid = int(mid)
                blob = bytes(blob) if blob is not None else b""
                try:
                    if blob[:2] == b"BM":
                        px = decode_bmp(blob)
                        rows.append(
                            (mid, True, "bmp", px.shape[1], px.shape[0], None, None,
                             pixel_sha256(px), None)
                        )
                    elif blob[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
                        px = decode_png(blob)
                        rows.append(
                            (mid, True, "png", px.shape[1], px.shape[0], None, None,
                             pixel_sha256(px), None)
                        )
                    elif blob[:4] == b"RIFF":
                        samples, rate = decode_wav(blob)
                        rows.append(
                            (mid, True, "wav", None, None, rate, samples.shape[0],
                             pcm_sha256(samples), None)
                        )
                    else:
                        raise MediaDecodeError("unknown container (no BM/RIFF magic)")
                except MediaDecodeError as exc:
                    rows.append(
                        (mid, False, None, None, None, None, None, None, str(exc))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(gen, DECODE_SCHEMA)
