"""Claim-check for oversized MQ messages.

Reference: pkg/sink/kafka/claimcheck/claim_check.go — messages whose
encoded value exceeds ``max-message-bytes`` are written to external
storage and replaced on the topic by a small envelope holding the
location (file name = UUID in the reference; here a deterministic
content-address so the operator is pure and testable).

External-payload format (claim_check.go:86-97 WriteMessage):

- default: the ``common.ClaimCheckMessage`` JSON — ``{"key": <base64>,
  "value": <base64>}`` (Go ``json.Marshal`` renders ``[]byte`` as std
  base64 with padding; a nil key marshals to ``null``), unmarshalled on
  the consumer by common/message.go:165.
- ``claim-check-raw-value=true`` (config.ClaimCheckRawValue): the raw
  value bytes only, no JSON wrapper — the consumer uses the file content
  directly (canal_json_decoder.go:183).

Spark shape: a single projection over the encoded stream — large values
route to a `claim_payload` side output (written separately, e.g. by the
storage sink), small ones pass through. No shuffle. Consumer-side
reassembly (`assemble_claim_check`) is one equi-join on the location;
claimed messages are by construction rare (only >threshold values), so
the payload side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _claim_payload(v, key, raw_value: bool):
    """External-storage file content for one oversized message."""
    if raw_value:
        return v
    # Go json.Marshal(ClaimCheckMessage{Key, Value}): field order key,
    # value; []byte → std base64 with padding; nil []byte → null.
    # ignoreNullFields=false keeps the null key field like Go does.
    # Spark's base64() is MIME-chunked (CRLF every 76 chars) under the
    # default chunk conf — strip the breaks so the wire is Go's
    # std-encoding regardless of session configuration. Literal replace,
    # not regexp_replace: same bytes, ~2x cheaper on multi-KB payloads.
    def b64(c):
        return F.replace(F.base64(c.cast("binary")), F.lit("\r\n"), F.lit(""))

    return F.to_json(
        F.struct(b64(key).alias("key"), b64(v).alias("value")),
        {"ignoreNullFields": "false"},
    )


def apply_claim_check(
    msgs: DataFrame,
    threshold_bytes: int,
    location_prefix: str,
    value_col: str = "value",
    key_col: str | None = "key",
    raw_value: bool = False,
) -> DataFrame:
    """Returns the MQ-bound frame: original columns, with ``value`` replaced
    by the claim-check envelope when oversized, plus:

      is_claim       — whether the value was externalized
      claim_location — storage path of the externalized payload (null inline)
      claim_payload  — the external file content (null when inline), for
                       the side write: ClaimCheckMessage JSON by default,
                       the raw value when ``raw_value`` (the reference's
                       ``claim-check-raw-value`` config)
    """
    v = F.col(value_col)
    key = (
        F.col(key_col)
        if key_col is not None and key_col in msgs.columns
        else F.lit(None).cast("string")
    )
    oversized = F.octet_length(v) > F.lit(threshold_bytes)
    # stage the md5 location once (r14): it feeds three conditional
    # branches below, where codegen CSE would not hoist it — see
    # claim_check_canal_envelope for the measured pathology
    staged = msgs.select(
        "*",
        oversized.alias("_over"),
        F.when(
            oversized,
            F.concat(
                F.lit(location_prefix.rstrip("/") + "/"), F.md5(v),
                F.lit(".json"),
            ),
        ).alias("_loc"),
    )
    over = F.col("_over")
    envelope = F.to_json(
        F.struct(F.struct(F.col("_loc").alias("location")).alias("claimCheck"))
    )
    return staged.select(
        *[c for c in msgs.columns if c != value_col],
        F.when(over, envelope).otherwise(v).alias(value_col),
        over.alias("is_claim"),
        F.when(over, F.col("_loc")).alias("claim_location"),
        F.when(over, _claim_payload(v, key, raw_value)).alias(
            "claim_payload"
        ),
    )


def assemble_claim_check(
    consumed: DataFrame,
    payload_store: DataFrame,
    value_col: str = "value",
    raw_value: bool = False,
    location_json_path: str = "$.claimCheck.location",
) -> DataFrame:
    """Consumer-side reassembly (canal_json_decoder.go:176-190,
    open_protocol_decoder.go:311): rows whose value is a claim-check
    location envelope are joined to the external payload store
    (columns ``claim_location``, ``claim_payload``) and their original
    value restored — base64-decoded out of the ClaimCheckMessage JSON,
    or the file content itself under ``claim-check-raw-value``.

    Inline rows pass through untouched; the payload side holds only the
    externalized (rare, oversized) messages so the join broadcasts.

    ``location_json_path`` selects the envelope shape: the default is the
    bare location message; canal-json's protocol envelope carries the
    location in the tidb extension (``$._tidb.claimCheckLocation``,
    canal_json_decoder.go:367).
    """
    v = F.col(value_col)
    loc = F.get_json_object(v, location_json_path)
    out = consumed.withColumn("_claim_loc", loc).join(
        F.broadcast(
            payload_store.select(
                F.col("claim_location").alias("_claim_loc"),
                F.col("claim_payload").alias("_claim_payload"),
            )
        ),
        "_claim_loc",
        "left",
    )
    if raw_value:
        restored = F.col("_claim_payload")
    else:
        parsed = F.from_json(
            F.col("_claim_payload"),
            T.StructType(
                [
                    T.StructField("key", T.StringType()),
                    T.StructField("value", T.StringType()),
                ]
            ),
        )
        restored = F.unbase64(parsed["value"]).cast("string")
    return out.withColumn(
        value_col,
        F.when(F.col("_claim_loc").isNotNull(), restored).otherwise(v),
    ).drop("_claim_loc", "_claim_payload")
