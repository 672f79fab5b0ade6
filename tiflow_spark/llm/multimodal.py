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


# ----------------------------- real decode for uncompressed formats (PPM)


def encode_ppm(width: int, height: int, rgb_fn) -> bytes:
    """Build a real binary PPM (P6) image: header + raw RGB bytes.
    ``rgb_fn(x, y) -> (r, g, b)``. Used by fixtures to synthesize genuine
    image payloads without any codec library."""
    import numpy as np

    arr = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        for x in range(width):
            arr[y, x] = rgb_fn(x, y)
    return f"P6\n{width} {height}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes):
    """REAL image decode for binary PPM (P6) — no codec libs needed, pure
    numpy. Returns (H, W, 3) uint8 array or None for non-PPM payloads
    (compressed formats stay behind the documented import-try stubs)."""
    import numpy as np

    if not payload.startswith(b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace/comment separated.
    # Malformed payloads (truncated header, non-numeric tokens, pixel data
    # shorter than w*h*3) must degrade to None, not raise: one bad payload
    # in an Arrow batch would otherwise kill the whole mapInPandas task
    # while decode_images documents null-row pass-through.
    try:
        parts: list[int] = []
        i = 2
        while len(parts) < 3 and i < len(payload):
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment to EOL
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            parts.append(int(payload[i:j]))
            i = j
        if len(parts) < 3:
            return None
        w, h, maxval = parts
        i += 1  # single whitespace after maxval
        if maxval != 255 or w <= 0 or h <= 0:
            return None
        if len(payload) - i < w * h * 3:
            return None  # truncated pixel data
        data = np.frombuffer(
            payload, dtype=np.uint8, count=w * h * 3, offset=i
        )
        return data.reshape(h, w, 3)
    except (ValueError, OverflowError):
        return None


def decode_images(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of PPM payloads: dimensions from the
    pixel data (not trusted metadata) + per-channel means. Non-PPM rows
    pass through with nulls — the mixed-format reality of a crawl."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dec_width", T.IntegerType()),
            T.StructField("dec_height", T.IntegerType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                arr = decode_ppm(bytes(payload))
                if arr is None:
                    rows.append((mid, None, None, None, None, None))
                else:
                    m = arr.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (mid, arr.shape[1], arr.shape[0],
                         round(float(m[0]), 6), round(float(m[1]), 6),
                         round(float(m[2]), 6))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "dec_width", "dec_height",
                         "mean_r", "mean_g", "mean_b"],
            )

    return media.select("media_id", "payload").mapInPandas(run, out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbour resize of PPM payloads (numpy index
    striding), re-encoded as PPM — the decode→transform→re-encode loop a
    vision pipeline runs, minus the compressed codecs."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("out_width", T.IntegerType()),
            T.StructField("out_height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                arr = decode_ppm(bytes(payload))
                if arr is None:
                    rows.append((mid, None, None, None))
                    continue
                h0, w0, _ = arr.shape
                ys = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                xs = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                small = arr[ys][:, xs]
                out = (
                    f"P6\n{width} {height}\n255\n".encode() + small.tobytes()
                )
                rows.append((mid, out, width, height))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "out_width", "out_height"]
            )

    return media.select("media_id", "payload").mapInPandas(run, out_schema)


def synthesize_ppm_media(docs: DataFrame) -> DataFrame:
    """Genuine binary PPM payloads synthesized per doc: a (w, h) gradient
    image with r = 30x, g = 60y, b = 128 and w = 2 + doc_id % 7,
    h = 2 + doc_id % 3 — REAL images the decode stage round-trips, with
    channel means that are exact closed forms (mean_r = 30(w−1)/2,
    mean_g = 60(h−1)/2), so a SQL oracle can check the decoder."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for did in b["doc_id"]:
                w = 2 + int(did) % 7
                h = 2 + int(did) % 3
                x = (np.arange(w, dtype=np.uint16) * 30).clip(0, 255)
                y = (np.arange(h, dtype=np.uint16) * 60).clip(0, 255)
                arr = np.zeros((h, w, 3), dtype=np.uint8)
                arr[:, :, 0] = x[None, :]
                arr[:, :, 1] = y[:, None]
                arr[:, :, 2] = 128
                rows.append(
                    (int(did), f"P6\n{w} {h}\n255\n".encode() + arr.tobytes())
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return docs.select("doc_id").mapInPandas(run, out_schema)


# ------------------------------ real decode for uncompressed audio (WAV)


def encode_wav_pcm16(sample_rate: int, samples) -> bytes:
    """Build a real mono 16-bit PCM WAV (RIFF) from an int16 iterable —
    fixture-side synthesis without any audio library."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def decode_wav(payload: bytes):
    """REAL audio decode for mono 16-bit PCM WAV — pure struct+numpy.
    Returns (sample_rate, np.int16 array) or None for anything else
    (compressed audio stays behind the documented stubs)."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    # walk RIFF chunks: fmt then data (tolerates extra chunks between).
    # Malformed chunks (short fmt body, odd/truncated data) degrade to
    # None instead of raising — a bad payload must not kill the whole
    # Arrow batch (decode_audio documents null-row pass-through).
    try:
        i, fmt, data = 12, None, None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
            body = payload[i + 8 : i + 8 + size]
            if cid == b"fmt ":
                if len(body) < 16:
                    return None
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)
        if fmt is None or data is None:
            return None
        audio_fmt, channels, rate, _br, _ba, bits = fmt
        if audio_fmt != 1 or channels != 1 or bits != 16 or rate <= 0:
            return None
        return rate, np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    except (struct.error, ValueError):
        return None


def decode_audio(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of WAV payloads: sample count, duration,
    peak amplitude — from the samples, not trusted metadata."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("peak", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                dec = decode_wav(bytes(payload))
                if dec is None:
                    rows.append((mid, None, None, None, None))
                else:
                    rate, samples = dec
                    rows.append(
                        (
                            mid,
                            rate,
                            len(samples),
                            len(samples) * 1000 // rate,
                            int(abs(samples.astype("i4")).max())
                            if len(samples)
                            else 0,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_ms",
                    "peak",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(run, out_schema)
