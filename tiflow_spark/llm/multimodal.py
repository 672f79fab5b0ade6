"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a metadata struct
(mime, width/height/duration, source). Decode / feature-extract / resize /
frame-sample run as Arrow-batched stages over mapInPandas — the Spark-side
contract (schema, batch shape, partitioning) is real and tested; the actual
media decode is STUBBED (this container has no codec libs) behind
`decoder=` hooks that default to a deterministic fake.

At 100 TB: binary payloads dominate partition size, so stages here set
`maxRecordsPerBatch` thinking — callers should repartition by size (bytes),
not row count, before heavy decode (see `repartition_by_bytes`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents: payload = utf8 bytes of
    the text (stands in for an encoded image), meta derived from doc fields."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def repartition_by_bytes(media: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Size-aware repartition: media rows are wildly variable in size, so
    partition count derives from total payload bytes, not row count."""
    total = media.agg(F.sum(F.col("meta.n_bytes"))).collect()[0][0] or 1
    n_parts = max(1, int(total // target_bytes) + 1)
    return media.repartition(n_parts, "media_id")


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic decode stub. Real impl: PIL/ffmpeg — not in container.

    'Decodes' the payload (utf-8) and derives pixels = payload bytes,
    checksum = codepoint sum mod 997 — both reproducible in plain SQL so
    the driver's oracle can verify the full mapInPandas plumbing."""
    text = payload.decode("utf-8")
    return {
        "pixels": len(payload),  # stands in for decoded dimensions
        "checksum": sum(ord(c) for c in text) % 997,
    }


FEATURES_SCHEMA = "media_id long, pixels long, checksum long, feat array<float>"


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] | None = None,
    feat_dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    The decoder hook is the stub boundary: swap in a real image model.
    Batch shape: whole Arrow batches of (media_id, payload); output schema is
    fixed and narrow so downstream joins never carry the payload.
    """
    decode = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode(bytes(payload))
                feat = [float((d["checksum"] + i) % 31) for i in range(feat_dim)]
                out.append(
                    {
                        "media_id": mid,
                        "pixels": d["pixels"],
                        "checksum": d["checksum"],
                        "feat": feat,
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: plumbing real (meta rewrite), pixel work stubbed —
    payload passes through untouched (a real impl transcodes in the UDF)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: emits (media_id, frame_no, frame_payload) rows.

    Frame extraction is stubbed as byte-slicing; the explode shape (1 → many
    rows, payload split) is the real contract.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(1, -(-len(raw) // max(every_n, 1)))
                for f in range(n_frames):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": f,
                            "frame_payload": raw[f * every_n : (f + 1) * every_n],
                        }
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_no int, frame_payload binary"
    )
