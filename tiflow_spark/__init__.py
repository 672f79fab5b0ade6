"""tiflow_spark — a PySpark-native change-data / analytics engine.

A from-scratch re-expression of pingcap/tiflow's query and data-processing
capabilities (CDC pipelines, DM-style transforms, sync_diff validation) on
Apache Spark DataFrame / SQL / Structured Streaming, plus the LLM-data-pipeline
operators (dedup, similarity search, text analysis) the reference lacks.

Design notes (see SURVEY.md):
- Canonical IR is the "ChangeEvent envelope" DataFrame (envelope.py), a mirror
  of the reference's RowChangedEvent (cdc/model/sink.go:347).
- Every operator is a declarative DataFrame transformation so Catalyst can
  push filters / prune columns / pick join strategies; Python UDFs are avoided
  in hot paths.
"""

__version__ = "0.1.0"
