"""Config parsing: the JSON task-spec surface compiles to the same pipeline
as programmatic TaskConfig (SubTaskConfig / ReplicaConfig parity)."""

import json

from tiflow_spark.config import from_json
from tiflow_spark.plans.parity import DEMO_CFG

DEMO_JSON = json.dumps(
    {
        "do_tables": ["shard_*.events_*"],
        "ignore_tables": ["*.events_3"],
        "event_filters": [{"tables": ["*.events_2"], "events": ["D"]}],
        "sql_patterns": ['"k": 9'],
        "expr_filters": [
            {
                "tables": ["shard_1.*"],
                "insert": "after.balance > 150",
                "delete": "before.balance < 10",
            }
        ],
        "routes": [
            {
                "schema_pattern": "shard_*",
                "table_pattern": "events_*",
                "target_schema": "target",
                "target_table": "events_all",
                "extract_schema_regexp": "shard_(\\d+)",
                "extract_table_regexp": "events_(\\d+)",
            }
        ],
        "dispatchers": [{"tables": ["*.*"], "partition": "index-value"}],
        "worker_count": 16,
    }
)


def test_json_spec_equals_programmatic_config():
    assert from_json(DEMO_JSON) == DEMO_CFG


def test_json_pipeline_matches_programmatic(spark, sf_dir):
    from tiflow_spark.operators import filters as flt
    from tiflow_spark.plans.parity import _env

    env = _env(spark, sf_dir)
    a = flt.apply_filters(env, from_json(DEMO_JSON)).count()
    b = flt.apply_filters(env, DEMO_CFG).count()
    assert a == b > 0
