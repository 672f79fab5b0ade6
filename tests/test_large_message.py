"""Large-message handle dispatch (pkg/config/large_message.go:22-29)."""

import json

import pyspark.sql.functions as F
import pytest

from tiflow_spark.codecs.large_message import apply_large_message_handle
from tiflow_spark.envelope import events_to_changes, load_table


@pytest.fixture(scope="module")
def env(spark, sf_dir):
    return events_to_changes(load_table(spark, sf_dir, "events")).limit(200)


def test_handle_key_only_cuts_images_and_stamps_extension(spark, env):
    out = apply_large_message_handle(env, "handle-key-only", 340)
    hk = out.filter("only_handle_key").first()
    m = json.loads(hk.value)
    assert m["_tidb"]["onlyHandleKey"] is True
    assert m["_tidb"]["commitTs"] == hk.commit_ts
    for img in (m["data"] or []) + (m["old"] or []):
        assert set(img) == {"id"}  # only the handle key survives
    assert sorted(m["sqlType"]) == ["id"]
    small = out.filter("NOT only_handle_key").first()
    assert "_tidb" not in json.loads(small.value)


def test_none_option_flags_rather_than_silently_truncates(spark, env):
    out = apply_large_message_handle(env, "none", 340)
    assert "too_large" in out.columns
    assert out.filter("too_large").count() > 0
    # values untouched — no silent cut
    assert out.filter(
        F.octet_length("value") <= 340
    ).filter("too_large").count() == 0


def test_claim_check_option_routes_to_claim_columns(spark, env):
    out = apply_large_message_handle(env, "claim-check", 340)
    assert {"is_claim", "claim_location", "claim_payload"} <= set(out.columns)
    assert out.filter("is_claim").count() > 0


def test_unknown_option_rejected(spark, env):
    with pytest.raises(ValueError):
        apply_large_message_handle(env, "gzip-harder", 340)
