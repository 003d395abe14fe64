"""Reference-surface queries (SURVEY.md §2) over the synthetic testdata.

Each query re-expresses one operator family the reference declares in its
TypeScript-assembled SQL, mapped onto the TPC-H-ish tables. File:line
citations point at the reference declaration being covered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chess_lakehouse_spark.catalog import load_table
from chess_lakehouse_spark.operators.enrich import enrich_top1_mapside
from chess_lakehouse_spark.operators.relational import (
    align_and_union,
    asof_join,
    banded_range_join,
    top_k,
    top_k_per_group,
)
from chess_lakehouse_spark.session import apply_runtime_conf

# Exact order-independent sum of a double expression: per-row decimal cast,
# exact decimal sum, lossless cast back (see suite/__init__.py contract).
def _dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def q_qc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped + conditional COUNT(*) — the reference's QC probes
    (src/read-pgn.ts:55 total+parse-error counts; src/export-to-parquet.ts:103)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("games"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).cast("long").alias("flagged"),
    )


def q_filter_null_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL predicates (src/read-pgn.ts:55 `parse_error IS NOT
    NULL`; src/find-openings.ts:68 `Opening IS NULL`). Testdata has no NULLs, so
    NULLs are derived with nullif — the predicate semantics are what's gated."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    derived = ev.withColumn("maybe_null", F.expr("nullif(event_type, 'error')"))
    return derived.where(F.col("maybe_null").isNull()).select("event_id", "user_id")


def q_export_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export stage's fixed projection: renames, literal DataSource column,
    year()/zero-padded-month derivation, COALESCE fallback, and the hygiene
    filter (src/export-to-parquet.ts:70-93: 20-col SELECT; :85 COALESCE;
    :88 literal; :89-90 year/strftime '%m'; :92-93 filter)."""
    apply_runtime_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderdate").isNotNull() & (F.year("o_orderdate") >= 1996))
        .select(
            F.col("o_orderkey").alias("OrderKey"),
            F.col("o_orderstatus").alias("Status"),
            F.coalesce(F.expr("nullif(o_orderpriority, '1-URGENT')"), F.lit("URGENT-DEFAULT")).alias(
                "Priority"
            ),
            F.round("o_totalprice", 2).alias("TotalPrice"),
            F.lit("ORDERS").alias("DataSource"),
            F.year("o_orderdate").alias("year"),
            F.date_format("o_orderdate", "MM").alias("month"),
        )
    )


def q_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with schema alignment — the CTAS-then-INSERT source loop
    (src/export-to-parquet.ts:58-100) + additive schema evolution
    (src/find-openings.ts:60): the second source lacks a column, NULL-filled."""
    apply_runtime_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    src1 = o.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.lit("src_O").alias("src"),
        F.col("o_totalprice").alias("extra"),
    )
    src2 = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.lit("src_F").alias("src"),
    )
    return align_and_union([src1, src2])


def q_enrich_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE centerpiece: correlated top-1 contains-join (argmax enrichment),
    the reference's LATERAL `CONTAINS(movetext, pgn) ORDER BY ply DESC LIMIT 1`
    (src/find-openings.ts:73-79) as a surrogate on part: for each part, the
    longest dictionary word contained in its name, tie-broken ascending
    (deterministic tie-break per SURVEY.md §2.3 ⚠). Map-side: zero shuffle of
    the fact side (see operators/enrich.py)."""
    apply_runtime_conf(spark)
    part = load_table(spark, sf_dir, "part")
    dim = (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .distinct()
        .withColumn("wlen", F.length("word"))
    )
    enriched = enrich_top1_mapside(
        fact=part.select("p_partkey", "p_name"),
        dim=dim,
        predicate=lambda probe, c: probe.contains(c["word"]),
        fact_probe_col="p_name",
        rank_col="wlen",
        payload_cols=["word", "wlen"],
        tiebreak_cols=["word"],
        out_prefix="best_",
    )
    # Inner-lateral semantics: rows with no match are dropped (ON TRUE inner).
    return enriched.where(F.col("best_word").isNotNull()).select(
        "p_partkey", "p_name", "best_word", F.col("best_wlen").alias("best_len")
    )


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation (TPC-H Q1 shape): sums/avg/count over lineitem.
    GROUP BY is absent from the reference (SURVEY.md §2.5 'comes free') —
    this gates the Spark surface for it. Partial (map-side) aggregation means
    the shuffle carries one row per (group, partition), not per input row."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               {_dsum('l_quantity')} AS sum_qty,
               {_dsum('l_extendedprice')} AS sum_base,
               {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               ROUND({_dsum('l_quantity')} / COUNT(*), 4) AS avg_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi-join over the star schema + grouped agg (join surface per
    SURVEY.md §2.3 'come free with df.join'). nation/region are broadcast
    (bounded dims); lineitem⋈orders⋈customer are shuffle joins on their keys
    and AQE picks broadcast at runtime when a side is small."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.expr(_dsum("l_extendedprice * (1 - l_discount)")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having at least one 'F' order."""
    apply_runtime_conf(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders at all."""
    apply_runtime_conf(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window — the Spark expression of the
    reference's per-row top-1 (src/find-openings.ts:77-78), generalized
    (SURVEY.md §2.6). Total order: (totalprice DESC, orderkey ASC)."""
    apply_runtime_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        group_cols=["o_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        rank_name="rk",
    )


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (top-k). Planned as TakeOrderedAndProject —
    per-partition local top-k merged on the driver, no global sort shuffle."""
    apply_runtime_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", "o_totalprice"),
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=100,
    )


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — set-op surface (SURVEY.md §2.8)."""
    apply_runtime_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersect(b)


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — set-op surface (SURVEY.md §2.8)."""
    apply_runtime_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.subtract(b)  # EXCEPT (distinct) semantics


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(_dsum("l_quantity")).alias("sum_qty"),
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: linestatus values to columns, decimal-exact sums."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.expr(_dsum("l_quantity")))
    )


def q_scalar_kitchen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (SURVEY.md §2.9): year, zero-padded month,
    split+size (string_split/array_length at src/find-openings.ts:65),
    contains (src/find-openings.ts:76), coalesce (src/export-to-parquet.ts:85),
    regexp extraction, casts."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.date_format("ts", "MM").alias("m"),
        F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("long").alias("k_val"),
        F.col("event_type").contains("ick").alias("has_ick"),
        F.size(F.split("props", " ")).alias("n_words"),
        F.upper("event_type").alias("et_upper"),
        F.substring("event_type", 1, 3).alias("et3"),
        F.coalesce(F.expr("nullif(event_type, 'view')"), F.lit("VIEWED")).alias("et_coalesced"),
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch analog of the streaming path,
    SURVEY.md §2.10/§7): hourly buckets as epoch seconds."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.unix_micros(F.date_trunc("hour", "ts")) / F.lit(1_000_000))
            .cast("long")
            .alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(_dsum("value")).alias("sum_value"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user session count with a 30-min inactivity gap —
    lag window + cumulative flag sum, all JVM-side. The 100 TB version
    shuffles once on user_id and AQE splits skewed users."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    flagged = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros(F.lag("ts").over(w)).alias("prev_us"),
    ).select(
        "user_id",
        F.when(
            F.col("prev_us").isNull() | ((F.col("ts_us") - F.col("prev_us")) > gap_us), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return flagged.groupBy("user_id").agg(F.sum("is_new").cast("long").alias("n_sessions"))


def q_merge_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE … FROM (join-update / MERGE) semantics, functionally: left-join
    the update set, COALESCE-overwrite matched rows, keep the rest
    (src/find-openings.ts:70-80 — Spark mapping per SURVEY.md §2.4: no
    in-place mutation on an immutable lake; recompute-and-overwrite)."""
    apply_runtime_conf(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    updates = (
        o.where(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .distinct()
        .withColumn("new_segment", F.lit("HAS_FINISHED"))
    )
    return c.join(updates, c.c_custkey == updates.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("new_segment", "c_mktsegment").alias("mktsegment"),
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT …) per group — distinct aggregation surface (absent in
    the reference, SURVEY.md §2.5). Plans as a two-phase aggregate: partial
    dedup before the shuffle, so the exchange carries distinct pairs only."""
    apply_runtime_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all subtotal combinations)."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(_dsum("l_quantity")).alias("sum_qty"),
    )


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's LATERAL construct *literally* (src/find-openings.ts:73-79
    `JOIN LATERAL (… ORDER BY … LIMIT 1) ON TRUE`): Spark >= 3.2 plans
    correlated lateral subqueries natively (SURVEY.md §4.2), here picking each
    part's longest name-word with a deterministic tie-break. The DataFrame
    argmax (q_enrich_argmax) is the preferred scale form; this gates the SQL
    surface itself."""
    apply_runtime_conf(spark)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p.p_partkey, o.best_word, o.wlen
        FROM part p, LATERAL (
          SELECT word AS best_word, CAST(length(word) AS INT) AS wlen
          FROM (SELECT explode(split(p.p_name, ' ')) AS word)
          ORDER BY wlen DESC, word ASC
          LIMIT 1
        ) o
        """
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (absent from the reference AND from native Spark,
    SURVEY.md §2.3): each event picks up the latest order of the same
    customer at-or-before the event time. Union + ordered window — one
    key shuffle, no range-join blowup, no per-row subquery."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        # ntz → session-tz (UTC) timestamp so it unions with events.ts
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderkey",
    )
    out = asof_join(
        ev,
        orders,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
        tiebreak_cols=["o_orderkey"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("asof_o_orderkey").alias("last_orderkey"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (absent from the reference, SURVEY.md §2.3): for
    each event, how many other events landed in the previous 10 minutes —
    executed as a banded equi-join (never the BroadcastNestedLoop Spark
    would plan for a raw time-inequality join)."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    a = ev.select("event_id", "ts")
    b = ev.select(F.col("event_id").alias("b_event_id"), F.col("ts").alias("b_ts"))
    pairs = banded_range_join(a, b, "ts", "b_ts", lower_us=-600_000_000, upper_us=0).where(
        F.col("b_event_id") != F.col("event_id")
    )
    counts = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        a.select("event_id")
        .join(counts, "event_id", "left")
        .select("event_id", F.coalesce("n", F.lit(0)).cast("long").alias("n_recent"))
    )


def q_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped join through supplier: revenue per supplier nation,
    restricted to orders where supplier and customer share the nation —
    exercises the remaining catalog table and a two-path join to the same
    broadcast dimension."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return joined.groupBy("n_name").agg(
        F.expr(_dsum("l_extendedprice * (1 - l_discount)")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: selective date filters
    pushed to both fact scans, two keyed joins, revenue rollup per order,
    top-10 by (revenue DESC, o_orderdate, orderkey) via TakeOrdered."""
    apply_runtime_conf(spark)
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1997-01-01")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # filtered customers broadcast comfortably at sf0.1, but at 100×
        # the segment is still an O(customers) table — leave the choice to
        # AQE's runtime size check instead of forcing it
        .join(c, o.o_custkey == c.c_custkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.expr(_dsum("l_extendedprice * (1 - l_discount)")).alias("revenue")
    )
    out = agg.select(
        F.col("l_orderkey").alias("orderkey"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
        F.col("o_orderpriority").alias("orderpriority"),
        "revenue",
    )
    return out.orderBy(
        F.col("revenue").desc(), F.col("orderdate_us").asc(), F.col("orderkey").asc()
    ).limit(10)


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events.props payload column (JSON
    function surface — absent from the reference, standard lake need).
    get_json_object stays JVM-side; missing paths yield NULL."""
    apply_runtime_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        (k % 10).alias("k_mod"),
    )


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — HyperLogLog distinct count and quantile
    sketch — through the DRIVER-CHECKABLE projection (the
    corpus_sketch_counts pattern, which retired this suite's last
    `no_oracle` row in r11). At 100 TB these replace exact
    COUNT(DISTINCT)/percentile when the exact form's shuffle dominates:
    sketches merge map-side, the exchange carries kilobytes.

    The sketch VALUES are implementation-specific (HLL++ register
    layout, QuantileSummaries compaction), so the gated columns are (a)
    exact row/distinct counts and (b) estimate-within-guarantee BOOLEANS
    that are deterministically TRUE unless the sketch path actually
    breaks — the oracle pins the exact counts and the TRUE literals:

    - ``approx_orders_within_10pct``: approx_count_distinct (default
      rsd 0.05, observed HLL++ error 1-2%) vs the exact distinct count,
      ±10% — 5× the configured rsd.
    - ``p50/p95_within_bounds``: approx_percentile at accuracy 10000
      guarantees rank error ≤ N/10000 = 1e-4·N after merge; the bound
      inverts the check to RANK space — the returned value v's true rank
      interval is [count(x < v) + 1, count(x <= v)], and the boolean
      asserts that interval intersects [q−0.02, q+0.02]·N (a 200×
      margin), i.e. ``100·count(< v) <= (q+2)·N`` and ``100·count(<= v)
      >= (q−2)·N`` in EXACT integer arithmetic. Counting instead of
      sorting keeps the check at two map-combined scans — no range
      shuffle, the plan a 100 TB fact table wants — and the two-sided
      strict/non-strict pair makes it tie-safe: an arbitrarily heavy tie
      mass AT v cannot flip either inequality.

    Raw approximate values (engine-private) stay out of the projection;
    their accuracy is additionally pinned in tests/test_llm_ops.py."""
    apply_runtime_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    q = F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)")
    approx = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("l_orderkey").cast("long").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey").alias("__approx_orders"),
        q.getItem(0).alias("__p50"),
        q.getItem(1).alias("__p95"),
    )
    v = F.col("l_extendedprice")
    counts = li.crossJoin(F.broadcast(approx)).agg(
        *[
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(name)
            for name, cond in [
                ("__lt50", v < F.col("__p50")),
                ("__le50", v <= F.col("__p50")),
                ("__lt95", v < F.col("__p95")),
                ("__le95", v <= F.col("__p95")),
            ]
        ]
    )

    def _within(lt: str, le: str, pct: int) -> Column:
        # true-rank interval [lt+1, le] must intersect [(pct-2)%, (pct+2)%]
        # of N — all-integer, tie-safe on both sides
        return (
            (100 * F.col(lt) <= (pct + 2) * F.col("n_rows"))
            & (100 * F.col(le) >= (pct - 2) * F.col("n_rows"))
        )

    err = F.abs(F.col("__approx_orders").cast("double") - F.col("exact_orders"))
    return approx.crossJoin(F.broadcast(counts)).select(
        "n_rows",
        "exact_orders",
        (err <= 0.1 * F.col("exact_orders")).alias("approx_orders_within_10pct"),
        _within("__lt50", "__le50", 50).alias("p50_within_bounds"),
        _within("__lt95", "__le95", 95).alias("p95_within_bounds"),
    )


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame spec (ROWS UNBOUNDED PRECEDING): per-customer running
    order total in (date, orderkey) order. The running sum accumulates
    DECIMAL (exact, so every prefix is engine-identical) and is emitted as
    DOUBLE. One shuffle on the partition key."""
    apply_runtime_conf(spark)
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the distinct, sorted set of order statuses per
    order-year (collect_set + sort_array — deterministic array output
    despite unordered aggregation). The gated projection joins the array
    into one comma-separated string: the driver's canonicalizer cannot
    hash array cells (round-1 CORRECTNESS err "unhashable numpy.ndarray"),
    and a sorted join is an equally strong equality check."""
    apply_runtime_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


QUERIES = {
    "qc_count": q_qc_count,
    "filter_null_predicate": q_filter_null_predicate,
    "export_projection": q_export_projection,
    "union_append": q_union_append,
    "enrich_argmax": q_enrich_argmax,
    "groupby_agg": q_groupby_agg,
    "join_star": q_join_star,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "window_topk": q_window_topk,
    "sort_limit": q_sort_limit,
    "intersect": q_intersect,
    "except": q_except,
    "rollup": q_rollup,
    "pivot": q_pivot,
    "scalar_kitchen": q_scalar_kitchen,
    "events_hourly": q_events_hourly,
    "sessionize": q_sessionize,
    "merge_update": q_merge_update,
    "distinct_agg": q_distinct_agg,
    "cube": q_cube,
    "lateral_topk": q_lateral_topk,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "supplier_revenue": q_supplier_revenue,
    "shipping_priority": q_shipping_priority,
    "json_extract": q_json_extract,
    "approx_stats": q_approx_stats,
    "running_sum": q_running_sum,
    "collect_set": q_collect_set,
}

ORACLES = {
    "qc_count": """
        SELECT COUNT(*) AS games,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS flagged
        FROM lineitem
    """,
    "filter_null_predicate": """
        SELECT event_id, user_id FROM events WHERE nullif(event_type, 'error') IS NULL
    """,
    "export_projection": """
        SELECT o_orderkey AS OrderKey,
               o_orderstatus AS Status,
               COALESCE(nullif(o_orderpriority, '1-URGENT'), 'URGENT-DEFAULT') AS Priority,
               ROUND(o_totalprice, 2) AS TotalPrice,
               'ORDERS' AS DataSource,
               CAST(year(o_orderdate) AS INT) AS year,
               strftime(o_orderdate, '%m') AS month
        FROM orders
        WHERE o_orderdate IS NOT NULL AND year(o_orderdate) >= 1996
    """,
    "union_append": """
        SELECT o_orderkey, o_orderstatus AS status, 'src_O' AS src, o_totalprice AS extra
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_orderkey, o_orderstatus AS status, 'src_F' AS src, CAST(NULL AS DOUBLE) AS extra
        FROM orders WHERE o_orderstatus = 'F'
    """,
    "enrich_argmax": """
        WITH words AS (
            SELECT DISTINCT unnest(string_split(p_name, ' ')) AS word FROM part
        ),
        ranked AS (SELECT word, CAST(length(word) AS INT) AS wlen FROM words)
        SELECT p.p_partkey, p.p_name, o.word AS best_word, o.wlen AS best_len
        FROM part p, LATERAL (
            SELECT r.word, r.wlen FROM ranked r
            WHERE contains(p.p_name, r.word)
            ORDER BY r.wlen DESC, r.word ASC
            LIMIT 1
        ) o
    """,
    "groupby_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base,
               CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "join_star": """
        SELECT r_name, n_name,
               CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "window_topk": """
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
            FROM orders
        ) WHERE rk <= 3
    """,
    "sort_limit": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "intersect": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "except": """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "rollup": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "pivot": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS O,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS F
        FROM lineitem GROUP BY l_returnflag
    """,
    "scalar_kitchen": """
        SELECT event_id,
               CAST(year(ts) AS INT) AS y,
               strftime(ts, '%m') AS m,
               CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val,
               contains(event_type, 'ick') AS has_ick,
               CAST(len(string_split(props, ' ')) AS INT) AS n_words,
               upper(event_type) AS et_upper,
               substring(event_type, 1, 3) AS et3,
               COALESCE(nullif(event_type, 'view'), 'VIEWED') AS et_coalesced
        FROM events
    """,
    "events_hourly": """
        SELECT CAST(epoch_us(date_trunc('hour', ts)) // 1000000 AS BIGINT) AS hour_epoch,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "merge_update": """
        SELECT c_custkey,
               COALESCE(u.new_segment, c_mktsegment) AS mktsegment
        FROM customer
        LEFT JOIN (
          SELECT DISTINCT o_custkey, 'HAS_FINISHED' AS new_segment
          FROM orders WHERE o_orderstatus = 'F'
        ) u ON c_custkey = u.o_custkey
    """,
    "distinct_agg": """
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_cust,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "cube": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "lateral_topk": """
        SELECT p.p_partkey, o.best_word, o.wlen
        FROM part p, LATERAL (
          SELECT word AS best_word, CAST(length(word) AS INT) AS wlen
          FROM (SELECT unnest(string_split(p.p_name, ' ')) AS word)
          ORDER BY wlen DESC, word ASC
          LIMIT 1
        ) o
    """,
    "collect_set": """
        SELECT CAST(year(o_orderdate) AS INT) AS year,
               array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "running_sum": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total
        FROM orders
    """,
    "json_extract": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               json_extract_string(props, '$.missing') AS missing_val,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
        FROM events
    """,
    # the checked-projection sketch gate (corpus_sketch_counts pattern):
    # exact counts are pinned by value; the within-guarantee booleans are
    # deterministically TRUE on the Spark side unless the sketch path
    # breaks, so the oracle pins the TRUE literals.
    "approx_stats": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               TRUE AS approx_orders_within_10pct,
               TRUE AS p50_within_bounds,
               TRUE AS p95_within_bounds
        FROM lineitem
    """,
    "shipping_priority": """
        SELECT orderkey, orderdate_us, orderpriority, revenue FROM (
          SELECT l_orderkey AS orderkey,
                 epoch_us(o_orderdate) AS orderdate_us,
                 o_orderpriority AS orderpriority,
                 CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND l_shipdate > TIMESTAMP '1997-01-01'
          GROUP BY 1, 2, 3
        )
        ORDER BY revenue DESC, orderdate_us ASC, orderkey ASC
        LIMIT 10
    """,
    "supplier_revenue": """
        SELECT n_name,
               CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name
    """,
    "range_join": """
        SELECT a.event_id, COUNT(b.event_id) AS n_recent
        FROM events a LEFT JOIN events b
          ON b.ts >= a.ts - INTERVAL 10 MINUTE
         AND b.ts <= a.ts
         AND b.event_id <> a.event_id
        GROUP BY a.event_id
    """,
    "asof_join": """
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               o.o_orderkey AS last_orderkey
        FROM events e
        LEFT JOIN LATERAL (
          SELECT o_orderkey FROM orders o
          WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
          LIMIT 1
        ) o ON TRUE
    """,
    "sessionize": """
        WITH x AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_us
            FROM events
        )
        SELECT user_id,
               CAST(SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM x GROUP BY user_id
    """,
}
