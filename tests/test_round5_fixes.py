"""Round-5 robustness fixes (advisor items): malformed-media degradation,
quote-aware generated-column rewrite, budget-selection discreteness guard,
replay key-stickiness enforcement."""

import pyspark.sql.functions as F
import pytest

from tiflow_spark.llm.multimodal import decode_ppm, decode_wav, encode_ppm


def test_decode_ppm_malformed_degrades_to_none():
    # truncated header (P6 + incomplete dims)
    assert decode_ppm(b"P6\n12") is None
    # non-numeric header token
    assert decode_ppm(b"P6\n4 x\n255\n" + b"\0" * 48) is None
    # truncated pixel data (claims 4x4, carries 1 row)
    assert decode_ppm(b"P6\n4 4\n255\n" + b"\0" * 12) is None
    # zero dims
    assert decode_ppm(b"P6\n0 0\n255\n") is None
    # sanity: a well-formed payload still decodes
    ok = decode_ppm(encode_ppm(3, 2, lambda x, y: (x, y, 0)))
    assert ok is not None and ok.shape == (2, 3, 3)


def test_decode_wav_malformed_degrades_to_none():
    # short fmt chunk body
    bad = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (4).to_bytes(4, "little") + b"\1\0\1\0"
        + b"data" + (4).to_bytes(4, "little") + b"\0\0\0\0"
    )
    assert decode_wav(bad) is None
    # odd-length data chunk must not raise (frombuffer multiple-of-2)
    hdr = (
        b"RIFF" + (100).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + (3).to_bytes(4, "little") + b"\1\2\3"
    )
    out = decode_wav(hdr)
    assert out is not None and len(out[1]) == 1  # truncated to whole samples


def test_generated_columns_quote_aware(spark):
    """A field name inside a string literal must survive the rewrite."""
    from tiflow_spark.operators.transforms import with_generated_columns

    env = spark.createDataFrame([(1,)], "x long").select(
        F.struct(
            F.lit(5).alias("id"), F.lit("hi").alias("note")
        ).alias("after"),
        F.lit(None).cast("struct<id:int,note:string>").alias("before"),
    )
    out = with_generated_columns(
        env, {"tagged": "concat(note, ' id: ', CAST(id AS STRING))"}
    )
    assert out.select(F.col("after.tagged")).first()[0] == "hi id: 5"


def test_budget_guard_raises_on_continuous_quality(spark):
    """Near-unique quality without banding must fail fast, not build the
    degenerate corpus-sized offsets table."""
    from py4j.protocol import Py4JJavaError

    from tiflow_spark.llm.sampling import select_within_budget

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 0.001234).alias("q"),
        F.lit(10).alias("n_tokens"),
    )
    with pytest.raises(Exception) as ei:
        select_within_budget(docs, 500, max_bands=50).collect()
    assert "quality" in str(ei.value)
    # with banding the same input works
    got = select_within_budget(
        docs, 500, quality_decimals=1, max_bands=50
    ).count()
    assert got == 50  # 500 tokens / 10 per doc
