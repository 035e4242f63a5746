"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here is REAL and tested — schemas, batch
iteration, partitioning, UDF signatures. The actual media decode is
STUBBED (this container has no image/audio libraries): ``decode_stub=True``
swaps in a deterministic fake decoder so the pipeline shape is exercised
end-to-end; with ``decode_stub=False`` the decode functions raise
``NotImplementedError`` at the exact seam where PIL/ffmpeg/torchaudio
would plug in.

Design for 100 TB of media:
- Binary payloads never leave the executor: ``mapInPandas`` streams Arrow
  record batches, so a 10 MB image is one cell in one batch, not a row
  copied through the driver.
- ``spark.sql.files.maxPartitionBytes`` (not row count) governs task
  sizing — media tables have huge rows, so fewer rows per task is
  automatic.
- Feature extraction emits SMALL fixed-width columns (dims, hash,
  features); downstream joins/dedup operate on those, never re-reading
  the blob — write features to their own table/column family so the scan
  for analytics prunes the blob column entirely (columnar projection).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decode: pseudo-dimensions
    and an 8-dim feature vector derived from the payload sha."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feature = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, feature


def extract_image_features(
    media: DataFrame, decode_stub: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Decode + featurize image payloads via Arrow-batched mapInPandas.

    Real deployment: replace the ``decode_stub`` branch with
    PIL.Image.open(BytesIO(payload)) / a vision encoder. The surrounding
    plumbing (schema, batching, null handling) is production-shaped.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else None),
                "sha256": pdf["payload"].map(
                    lambda p: hashlib.sha256(p).hexdigest() if p is not None else None
                ),
            }
            if decode_stub:
                decoded = pdf["payload"].map(
                    lambda p: _fake_decode(p) if p is not None else (None, None, None)
                )
                out["width"] = decoded.map(lambda d: d[0])
                out["height"] = decoded.map(lambda d: d[1])
                out["feature"] = decoded.map(lambda d: d[2])
            else:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision — plug in here"
                )
            yield pd.DataFrame(out)

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(process, schema=IMAGE_FEATURES_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Blob metadata without any decode — pure JVM column ops (byte length,
    magic-prefix hex, content hash). This is the cheap first pass that runs
    at scan speed over 100 TB; only rows passing filters reach the decoder."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.octet_length("payload").alias("n_bytes"),
        F.hex(F.substring("payload", 1, 4)).alias("magic_hex"),
        F.sha2("payload", 256).alias("sha256"),
    )


def sample_video_frames(
    media: DataFrame, every_nth: int = 30, decode_stub: bool = True
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_idx, frame_sha) rows. Stubbed decode derives a deterministic
    pseudo frame count/digest from the payload; a real build replaces the
    stub with ffmpeg/pyav iteration inside the same mapInPandas seam."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_sha", T.StringType(), True),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_sha": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                if not decode_stub:
                    raise NotImplementedError("real frame sampling requires ffmpeg/pyav")
                h = hashlib.sha256(payload).digest()
                n_frames = 60 + h[0]  # deterministic pseudo frame count
                for idx in range(0, n_frames, every_nth):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_sha"].append(
                        hashlib.sha256(payload + idx.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    vids = media.filter(F.col("kind") == "video").select("media_id", "payload")
    return vids.mapInPandas(process, schema=schema)
