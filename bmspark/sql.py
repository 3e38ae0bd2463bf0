"""SQL surface — the same engine through ``spark.sql``.

Registers the testdata tables and the derived ``pages`` view (plus the
parse output as ``pages_parsed``) so every pipeline question is askable
in plain SQL; the DataFrame API and these views compile to identical
plans (Catalyst sees one logical algebra). tests/test_sql.py proves a
set of SQL twins row-equal to their DataFrame counterparts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bmspark import fixtures
from bmspark.functions import parse
from bmspark.sources import reader


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register: the 10 testdata tables, ``pages`` (derived), ``dim_lang``
    / ``dim_source``, and ``pages_parsed`` (vectorized parse output —
    the UDF is reachable from SQL via the view)."""
    reader.register_views(spark, sf_dir)
    pages = fixtures.pages_from_documents(spark, sf_dir)
    pages.createOrReplaceTempView("pages")
    fixtures.dim_lang(spark).createOrReplaceTempView("dim_lang")
    fixtures.dim_source(spark).createOrReplaceTempView("dim_source")
    parse.with_parsed(pages).select(
        "url", "domain", "lang", "warc_ts", "n_chars",
        "parsed.title", "parsed.text", "parsed.n_links", "parsed.n_tokens",
        "parsed.simhash", "parsed.parse_ok",
    ).createOrReplaceTempView("pages_parsed")
    # the parse UDF itself, callable from SQL
    spark.udf.register("parse_full", parse.parse_full)


#: SQL twins of flagship DataFrame queries (tests assert row equality).
SQL_QUERIES = {
    "agg_domain_lang_hour": """
        SELECT domain, lang, date_trunc('hour', warc_ts) AS hour,
               count(*) AS n_pages, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM pages GROUP BY domain, lang, date_trunc('hour', warc_ts)""",
    "join_broadcast": """
        SELECT /*+ BROADCAST(dim_lang) */ p.url, p.lang, d.lang_name, d.lang_family
        FROM pages p LEFT JOIN dim_lang d USING (lang)""",
    "win_topk": """
        SELECT domain, url, n_chars, rk FROM (
          SELECT domain, url, n_chars,
                 row_number() OVER (PARTITION BY domain
                                    ORDER BY n_chars DESC, doc_id) AS rk
          FROM pages) WHERE rk <= 3""",
    "route_fanout": """
        SELECT CASE WHEN lang = 'en' THEN 'sink_en'
                    WHEN lang IN ('fr','es') THEN 'sink_romance'
                    ELSE 'sink_other' END AS sink,
               count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM pages GROUP BY 1""",
    "parse_via_sql_view": """
        SELECT url, title, n_tokens FROM pages_parsed WHERE parse_ok""",
}


def run(spark: SparkSession, name: str) -> DataFrame:
    return spark.sql(SQL_QUERIES[name])
