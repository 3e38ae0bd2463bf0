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


def test_approx_distinct_within_hll_tolerance(spark):
    """agg_approx_distinct accuracy contract (round-2 advice): the HLL
    estimate must sit within 3·rsd of exact countDistinct per group —
    the documented tolerance that makes the rows-only driver key an
    actually-verified operator."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rsd = 0.02
    both = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    )
    assert both
    for r in both:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err <= 3 * rsd, (
            f"{r.event_type}: approx={r.approx_users} exact={r.exact_users} "
            f"rel_err={rel_err:.4f} > {3 * rsd}"
        )
