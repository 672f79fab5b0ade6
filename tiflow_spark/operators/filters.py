"""Filter stack — every "WHERE" the reference applies to a change stream.

All filters compile the task config into ONE boolean Column so Catalyst can
merge them with neighbouring predicates and push them into the scan. This is
the Spark-native counterpart of tiflow evaluating per-event Go closures:
  - table block/allow list ..... pkg/filter/filter.go:100-246 (ShouldIgnoreTable)
  - binlog event-type filter ... pkg/binlog-filter/filter.go:27-120
  - SQL-pattern filter ......... pkg/filter/sql_event_filter.go
  - expression filter .......... pkg/filter/expr_filter.go:251-382
  - ignore-txn-start-ts ........ pkg/filter/filter.go:246-258
  - checkpoint filter .......... dm/syncer/syncer.go:2640-2648
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.config import (
    EventFilterRule,
    ExpressionFilterRule,
    TableRule,
    TaskConfig,
)


def wildcard_to_regex(pattern: str) -> str:
    """matchers DSL → anchored regex: ``*`` → ``.*``, ``?`` → ``.``."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _pattern_match(col: Column, pattern: str) -> Column:
    """One wildcard pattern → the cheapest equivalent predicate.

    Regex is the slow path; the common rule shapes (`*`, exact names,
    `prefix_*`) compile to constant/equality/startswith so the hot filter
    stays allocation-free inside codegen — the same early-filter priority
    the reference gives ShouldIgnoreTable (applied before decode)."""
    if pattern == "*":
        return F.lit(True)
    if "*" not in pattern and "?" not in pattern:
        return col == F.lit(pattern)
    if (
        pattern.endswith("*")
        and "?" not in pattern
        and "*" not in pattern[:-1]
    ):
        return col.startswith(pattern[:-1])
    return col.rlike(wildcard_to_regex(pattern))


def table_matches(rule: TableRule, case_sensitive: bool = False) -> Column:
    """Boolean Column: does (schema, table) match this rule?"""
    s_pat, t_pat = rule.schema_pattern, rule.table_pattern
    schema, table = F.col("schema"), F.col("table")
    if not case_sensitive:
        schema, table = F.lower(schema), F.lower(table)
        s_pat, t_pat = s_pat.lower(), t_pat.lower()
    return _pattern_match(schema, s_pat) & _pattern_match(table, t_pat)


def any_table_matches(
    rules: tuple[TableRule, ...], case_sensitive: bool = False
) -> Column:
    pred = F.lit(False)
    for r in rules:
        pred = pred | table_matches(r, case_sensitive)
    return pred


def table_filter_predicate(cfg: TaskConfig) -> Column:
    """keep-predicate of the block/allow list (ShouldIgnoreTable inverted):
    keep iff (no allow-list OR matches allow-list) AND NOT matches block-list."""
    keep = F.lit(True)
    if cfg.do_tables:
        keep = any_table_matches(cfg.do_tables, cfg.case_sensitive)
    if cfg.ignore_tables:
        keep = keep & ~any_table_matches(cfg.ignore_tables, cfg.case_sensitive)
    return keep


def event_filter_predicate(cfg: TaskConfig) -> Column:
    """keep-predicate of the per-table event-type skip rules."""
    keep = F.lit(True)
    for rule in cfg.event_filters:
        matched = any_table_matches(rule.tables, cfg.case_sensitive)
        hit = matched & F.col("op").isin(*rule.events)
        if rule.action == "Ignore":
            keep = keep & ~hit
        else:  # Do: only matching events pass for matching tables
            keep = keep & (~matched | F.col("op").isin(*rule.events))
    return keep


def sql_pattern_predicate(cfg: TaskConfig, text_col: str = "after.note") -> Column:
    """Skip events whose text payload matches any configured regex
    (sql-pattern rules applied to DDL/DML statements in the reference;
    here applied to the envelope's note/query column)."""
    keep = F.lit(True)
    for pat in cfg.sql_patterns:
        keep = keep & ~F.coalesce(F.col(text_col), F.lit("")).rlike(pat)
    return keep


def _expr_hit(rule: ExpressionFilterRule, case_sensitive: bool) -> Column:
    matched = any_table_matches(rule.tables, case_sensitive)
    op = F.col("op")
    hit = F.lit(False)
    if rule.insert:
        hit = hit | ((op == "I") & F.expr(rule.insert))
    if rule.update_old:
        hit = hit | ((op == "U") & F.expr(rule.update_old))
    if rule.update_new:
        hit = hit | ((op == "U") & F.expr(rule.update_new))
    if rule.delete:
        hit = hit | ((op == "D") & F.expr(rule.delete))
    return matched & hit


def expression_filter_predicate(cfg: TaskConfig) -> Column:
    """Skip DML where the configured SQL expression over row images is true.

    The reference evaluates these with TiDB's expression engine per event
    (expr_filter.go:361 skipDMLByExpression); Spark SQL evaluates the same
    expression natively inside codegen — `F.expr` on before.*/after.*.
    """
    keep = F.lit(True)
    for rule in cfg.expr_filters:
        keep = keep & ~_expr_hit(rule, cfg.case_sensitive)
    return keep


def txn_ts_predicate(cfg: TaskConfig) -> Column:
    if not cfg.ignore_txn_start_ts:
        return F.lit(True)
    return ~F.col("start_ts").isin(*cfg.ignore_txn_start_ts)


def checkpoint_predicate(cfg: TaskConfig) -> Column:
    """Drop events at-or-below the per-table checkpoint (resume semantics)."""
    if not cfg.checkpoint_ts:
        return F.lit(True)
    pred = F.lit(True)
    for tbl, ts in cfg.checkpoint_ts.items():
        pred = pred & ((F.col("table") != tbl) | (F.col("commit_ts") > ts))
    return pred


def apply_filters(env: DataFrame, cfg: TaskConfig) -> DataFrame:
    """The whole filter stack as one .filter() — order-free since all are
    pure predicates; Catalyst pushes the conjunction into the source scan."""
    return env.filter(
        table_filter_predicate(cfg)
        & event_filter_predicate(cfg)
        & sql_pattern_predicate(cfg)
        & expression_filter_predicate(cfg)
        & txn_ts_predicate(cfg)
        & checkpoint_predicate(cfg)
    )
