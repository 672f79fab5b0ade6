"""Property tests for round-6 logic: lossy-retype classification and
unnamed-unique-key default naming."""

from hypothesis import given, settings
from hypothesis import strategies as st

from tiflow_spark.sources.ddl_stream import is_lossy_modify

_INTS = ["TINYINT", "SMALLINT", "MEDIUMINT", "INT", "BIGINT"]
_STRINGS = [f"VARCHAR({n})" for n in (1, 2, 8, 20, 64, 255)] + [
    f"CHAR({n})" for n in (1, 8, 64)
] + ["TINYTEXT", "TEXT", "MEDIUMTEXT", "LONGTEXT"]
_ALL = _INTS + _STRINGS + ["DOUBLE", "FLOAT", "DECIMAL(12,4)", "DECIMAL(8,2)"]


@given(st.sampled_from(_ALL))
@settings(max_examples=50, deadline=None)
def test_same_type_never_lossy(t):
    assert is_lossy_modify(t, t) is None


@given(st.sampled_from(_INTS), st.sampled_from(_INTS))
@settings(max_examples=50, deadline=None)
def test_int_rank_antisymmetric(a, b):
    """Exactly one direction of a strict rank change is lossy."""
    ab, ba = is_lossy_modify(a, b), is_lossy_modify(b, a)
    if a == b:
        assert ab is None and ba is None
    else:
        assert (ab is None) != (ba is None)


@given(st.sampled_from(_STRINGS), st.sampled_from(_STRINGS))
@settings(max_examples=200, deadline=None)
def test_string_capacity_antisymmetric(a, b):
    """String-family retypes: lossy iff capacity strictly shrinks, so at
    most one direction can be lossy and equal capacities are clean both
    ways (VARCHAR(8) <-> CHAR(8))."""
    ab, ba = is_lossy_modify(a, b), is_lossy_modify(b, a)
    assert not (ab is not None and ba is not None)


@given(st.sampled_from(_INTS), st.integers(min_value=1, max_value=30))
@settings(max_examples=100, deadline=None)
def test_int_to_string_threshold(t, n):
    """int->VARCHAR(n) is lossy exactly below the type's rendered width."""
    from tiflow_spark.sources.ddl_stream import _INT_WIDTH

    verdict = is_lossy_modify(t, f"VARCHAR({n})")
    assert (verdict is not None) == (n < _INT_WIDTH[t])


@given(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=6
    )
)
@settings(max_examples=100, deadline=None)
def test_unnamed_uk_names_never_collide(first_cols):
    """Repeated unnamed unique keys on the same first column get distinct
    MySQL-style default names (col, col_2, col_3, ...)."""
    # exercise the naming logic through the registry fold without Spark:
    # replicate uk_name's contract directly
    uks: list[tuple[str, tuple[str, ...]]] = []

    def uk_name(given, cols):
        if given is not None:
            return given
        taken = {n for n, _ in uks if n}
        base = cols[0] if cols else "uk"
        if base not in taken:
            return base
        i = 2
        while f"{base}_{i}" in taken:
            i += 1
        return f"{base}_{i}"

    for c in first_cols:
        uks.append((uk_name(None, (c,)), (c,)))
    names = [n for n, _ in uks]
    assert len(names) == len(set(names))
