"""SQL surface ≡ DataFrame surface: the registered views + SQL twins
must return exactly the DataFrame queries' rows (one logical algebra)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from bmspark import sql as bmsql
from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    bmsql.register_all(spark, SF_DIR)


@pytest.mark.parametrize("key", ["agg_domain_lang_hour", "join_broadcast",
                                 "win_topk", "route_fanout"])
def test_sql_twin_equals_dataframe(spark, key):
    df = entrymod.queries()[key](spark, SF_DIR)
    sq = bmsql.run(spark, key)
    assert sorted(df.columns) == sorted(sq.columns)
    assert df.exceptAll(sq.select(*df.columns)).isEmpty()
    assert sq.select(*df.columns).exceptAll(df).isEmpty()


def test_parse_udf_reachable_from_sql(spark):
    got = spark.sql(
        "SELECT parse_full(html).title AS t FROM pages WHERE doc_id = 0"
    ).collect()
    assert got[0].t == "Doc 0"


def test_sql_view_of_parse_output(spark):
    n = bmsql.run(spark, "parse_via_sql_view").count()
    assert n == spark.table("pages").count()  # all derived pages parse ok
