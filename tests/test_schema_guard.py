"""Schema-drift guard: every driver-generated table must load with the
dtypes the engine is built against.

Round 2 shipped a regression because the driver regenerated
``events.parquet`` with a new physical ts encoding (INT64 nanos →
native timestamp[us]) and nothing failed fast — 5 declared queries went
red instead of one clear test. This test pins the *post-load* contract
of ``load_table`` (after any normalization it applies), so a future
format change on disk turns into exactly one failing assertion naming
the table and column.
"""

from __future__ import annotations

import pytest

from sigmod_2024_contest_spark.sources.tables import TABLES, base_vectors, load_table

from conftest import SF_SMOKE

# Contract: table -> exact (column, spark dtype) tuples, in order.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", ("timestamp", "timestamp_ntz")),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", ("timestamp", "timestamp_ntz")),
    ],
    # events: load_table must normalize ts to TIMESTAMP (LTZ) whatever
    # the physical encoding — downstream uses unix_micros/windows.
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


@pytest.mark.parametrize("table", TABLES)
def test_table_schema_contract(spark, table):
    got = load_table(spark, SF_SMOKE, table).dtypes
    want = EXPECTED[table]
    assert len(got) == len(want), (
        f"{table}: column count drifted — got {got}, expected {want}"
    )
    for (gname, gtype), (wname, wtype) in zip(got, want):
        ok_types = wtype if isinstance(wtype, tuple) else (wtype,)
        assert gname == wname and gtype in ok_types, (
            f"{table}.{wname}: testdata schema drifted — loaded "
            f"({gname!r}, {gtype!r}), engine expects one of {ok_types} "
            f"(update sources/tables.py normalization, not just this test)"
        )


def test_base_vectors_shape(spark):
    got = base_vectors(spark, SF_SMOKE).dtypes
    assert got == [
        ("id", "bigint"),
        ("category", "int"),
        ("ts", "double"),
        ("vec", "array<float>"),
    ], f"base_vectors contract drifted: {got}"
