"""Claim-check for oversized MQ messages.

Reference: pkg/sink/kafka/claimcheck/claim_check.go — messages whose
encoded value exceeds ``max-message-bytes`` are written to external
storage and replaced on the topic by a small envelope holding the
location (file name = UUID in the reference; here a deterministic
content-address so the operator is pure and testable).

Spark shape: a single projection over the encoded stream — large values
route to a `claim_payload` side output (written separately, e.g. by the
storage sink), small ones pass through. No shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_claim_check(
    msgs: DataFrame,
    threshold_bytes: int,
    location_prefix: str,
    value_col: str = "value",
) -> DataFrame:
    """Returns the MQ-bound frame: original columns, with ``value`` replaced
    by the claim-check envelope when oversized, plus:

      is_claim       — whether the value was externalized
      claim_location — storage path of the externalized payload (null inline)
      claim_payload  — the original oversized value (null when inline),
                       for the side write
    """
    v = F.col(value_col)
    oversized = F.octet_length(v) > F.lit(threshold_bytes)
    location = F.concat(
        F.lit(location_prefix.rstrip("/") + "/"), F.md5(v), F.lit(".json")
    )
    envelope = F.to_json(
        F.struct(F.struct(location.alias("location")).alias("claimCheck"))
    )
    return msgs.select(
        *[c for c in msgs.columns if c != value_col],
        F.when(oversized, envelope).otherwise(v).alias(value_col),
        oversized.alias("is_claim"),
        F.when(oversized, location).alias("claim_location"),
        F.when(oversized, v).alias("claim_payload"),
    )
