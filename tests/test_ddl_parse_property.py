"""Property-based DDL parser tests: for ANY generated column spec rendered
as MySQL-dialect SQL (random casing, backticks, whitespace, comma-list
ALTERs), parse_ddl must recover exactly the structure that generated it —
the parser analog of the compactor's truth-table property test.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from tiflow_spark.sources.ddl_parse import parse_ddl

IDENT = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    # exclude words the column-def grammar reserves (type-stop keywords and
    # constraint heads treat them specially, as MySQL itself would)
    lambda s: s.upper()
    not in {
        "PRIMARY", "NOT", "NULL", "DEFAULT", "UNIQUE", "AUTO_INCREMENT",
        "COMMENT", "KEY", "REFERENCES", "COLLATE", "CHARACTER", "CHARSET",
        "ON", "GENERATED", "AS", "FIRST", "AFTER", "INDEX", "CONSTRAINT",
        "FOREIGN", "CHECK", "ADD", "DROP", "MODIFY", "CHANGE", "RENAME",
        "TO", "COLUMN", "TABLE", "PARTITION",
    }
)
TYPES = st.sampled_from(
    ["BIGINT", "INT", "DOUBLE", "VARCHAR(64)", "DECIMAL(10,2)", "TEXT",
     "TINYINT", "TIMESTAMP", "ENUM('a','b,c')"]
)
DEFAULTS = st.one_of(
    st.none(),
    st.from_regex(r"[A-Za-z0-9 .,+-]{0,12}", fullmatch=True),
)


def quote(name: str, style: int) -> str:
    return f"`{name}`" if style else name


@st.composite
def column_specs(draw, min_size=1, max_size=6):
    n = draw(st.integers(min_size, max_size))
    cols = []
    seen = set()
    for _ in range(n):
        name = draw(IDENT.filter(lambda s: s.lower() not in seen))
        seen.add(name.lower())
        cols.append((name, draw(TYPES), draw(DEFAULTS)))
    return cols


def render_col(name, typ, default, q):
    s = f"{quote(name, q)} {typ}"
    if default is not None:
        s += " DEFAULT '" + default.replace("'", "''") + "'"
    return s


@given(cols=column_specs(), q=st.integers(0, 1), pk_i=st.integers(0, 99))
@settings(max_examples=150, deadline=None)
def test_create_table_roundtrip(cols, q, pk_i):
    pk = cols[pk_i % len(cols)][0]
    body = ", ".join(render_col(*c, q) for c in cols)
    sql = (
        f"CREATE TABLE t ({body}, PRIMARY KEY ({quote(pk, q)})) "
        "DEFAULT CHARSET=utf8mb4"
    )
    op = parse_ddl(sql)
    assert op is not None and op.kind == "create table"
    assert [(c.name, c.col_type) for c in op.columns] == [
        (n, t.upper()) for n, t, _ in cols
    ]
    assert [c.default for c in op.columns] == [d for _, _, d in cols]
    assert op.pk_columns == (pk,)
    assert op.charset == "utf8mb4"


@given(
    cols=column_specs(min_size=2, max_size=5),
    q=st.integers(0, 1),
    data=st.data(),
)
@settings(max_examples=150, deadline=None)
def test_multi_action_alter_roundtrip(cols, q, data):
    """Random comma-list ALTER: each action parses back to its spec, in
    order, under the 'multi schema change' kind."""
    actions, expected = [], []
    for name, typ, default in cols:
        kind = data.draw(st.sampled_from(["add", "drop", "modify"]))
        if kind == "add":
            actions.append(f"ADD COLUMN {render_col(name, typ, default, q)}")
            expected.append(("add column", name, typ.upper(), default))
        elif kind == "drop":
            actions.append(f"DROP COLUMN {quote(name, q)}")
            expected.append(("drop column", name, None, None))
        else:
            actions.append(f"MODIFY {render_col(name, typ, default, q)}")
            expected.append(("modify column", name, typ.upper(), default))
    sql = "ALTER TABLE s.t " + ", ".join(actions)
    op = parse_ddl(sql)
    assert op is not None and op.kind == "multi schema change"
    got = [
        (
            s.kind,
            s.drop_column if s.kind == "drop column" else s.columns[0].name,
            s.columns[0].col_type if s.columns else None,
            s.columns[0].default if s.columns else None,
        )
        for s in op.sub_ops
    ]
    assert got == expected
    assert op.schema == "s" and op.table == "t"


@given(ws=st.from_regex(r"[ \t\n]{1,3}", fullmatch=True))
@settings(max_examples=30, deadline=None)
def test_whitespace_insensitive(ws):
    op = parse_ddl(
        f"ALTER{ws}TABLE{ws}t{ws}ADD{ws}COLUMN{ws}x{ws}BIGINT{ws}"
        f"DEFAULT{ws}'7'"
    )
    assert op.kind == "add column"
    assert op.columns[0] == type(op.columns[0])("x", "BIGINT", "7")


# ------------------------------------------- key-metadata properties (r5)


@st.composite
def key_table_specs(draw):
    """A CREATE TABLE with random columns + random pk subset + named UKs."""
    cols = draw(column_specs(min_size=2, max_size=6))
    names = [c[0] for c in cols]
    pk = draw(st.lists(st.sampled_from(names), unique=True, max_size=3))
    n_uks = draw(st.integers(0, 2))
    uks = []
    for i in range(n_uks):
        uk_cols = draw(
            st.lists(st.sampled_from(names), unique=True, min_size=1, max_size=2)
        )
        uks.append((f"uq_{i}", uk_cols))
    return cols, pk, uks


@given(key_table_specs(), st.integers(0, 1))
@settings(max_examples=60, deadline=None)
def test_create_table_key_metadata_roundtrip(spec, style):
    cols, pk, uks = spec
    entries = [
        f"{quote(n, style)} {t}"
        + (f" DEFAULT '{d}'" if d is not None else "")
        for n, t, d in cols
    ]
    if pk:
        entries.append(
            "PRIMARY KEY (" + ", ".join(quote(c, style) for c in pk) + ")"
        )
    for uk_name, uk_cols in uks:
        entries.append(
            f"UNIQUE KEY {quote(uk_name, style)} ("
            + ", ".join(quote(c, style) for c in uk_cols)
            + ")"
        )
    sql = "CREATE TABLE t (" + ", ".join(entries) + ")"
    op = parse_ddl(sql)
    assert op is not None and op.kind == "create table"
    assert list(op.pk_columns) == pk
    assert [list(u) for u in op.unique_keys] == [list(u) for _, u in uks]
    assert list(op.unique_key_names) == [n for n, _ in uks]


@given(st.lists(st.sampled_from(["a", "b", "c", "d"]), unique=True,
                min_size=1, max_size=3),
       st.integers(0, 1))
@settings(max_examples=30, deadline=None)
def test_alter_key_actions_roundtrip(pk_cols, style):
    add = parse_ddl(
        "ALTER TABLE t ADD PRIMARY KEY ("
        + ", ".join(quote(c, style) for c in pk_cols)
        + ")"
    )
    assert add.kind == "add primary key"
    assert list(add.pk_columns) == pk_cols
    uk = parse_ddl(
        "ALTER TABLE t ADD UNIQUE KEY uq_x ("
        + ", ".join(quote(c, style) for c in pk_cols)
        + ")"
    )
    assert uk.kind == "create index"
    assert [list(u) for u in uk.unique_keys] == [pk_cols]
    assert uk.key_name == "uq_x"
    drop = parse_ddl("ALTER TABLE t DROP INDEX uq_x")
    assert (drop.kind, drop.key_name) == ("drop index", "uq_x")
