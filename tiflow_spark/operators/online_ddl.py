"""Online-DDL tool support — gh-ost / pt-osc ghost-table recognition.

Reference: dm/syncer/online-ddl-tools/online_ddl.go:45-346. The syncer
recognizes the shadow tables online-schema-change tools create, routes the
final RENAME back onto the real table, and drops changes to trash tables.

Table-name taxonomy (online_ddl.go ghost/pt plugin TableType):
  gh-ost:  `_{table}_gho` = shadow (real DDL applied there),
           `_{table}_ghc` = changelog, `_{table}_del` = dropped original
  pt-osc:  `_{table}_new` = shadow, `_{table}_old` = dropped original

Spark shape: pure string predicates/rewrites on the table column — a map
stage fused into whichever scan produces the envelope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SHADOW_RE = r"^_(.+)_(gho|new)$"
_TRASH_RE = r"^_(.+)_(ghc|del|old)$"


def table_class(table: Column) -> Column:
    """'real' | 'shadow' | 'trash' per online_ddl.go TableType."""
    return (
        F.when(table.rlike(_SHADOW_RE), F.lit("shadow"))
        .when(table.rlike(_TRASH_RE), F.lit("trash"))
        .otherwise(F.lit("real"))
    )


def real_table(table: Column) -> Column:
    """Shadow/trash name → the user-visible table it belongs to
    (online_ddl.go RealName)."""
    stripped = F.regexp_extract(table, r"^_(.+)_(gho|ghc|del|new|old)$", 1)
    return F.when(stripped == "", table).otherwise(stripped)


def apply_online_ddl(env: DataFrame, table_col: str = "table") -> DataFrame:
    """Drop trash-table events, fold shadow-table events onto the real
    table (the apply-on-rename semantics, conservatively eager)."""
    t = F.col(table_col)
    return (
        env.withColumn("table_class", table_class(t))
        .filter(F.col("table_class") != "trash")
        .withColumn(table_col, real_table(t))
    )
