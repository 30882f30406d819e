package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.PathExtract

/** SURVEY.md §2.3 Q1–Q25: the declared relational query inventory.
  *
  * Conventions (§2.3 rules, enforced here and in every oracle):
  *   - every query ends in a total ORDER BY (deterministic row hash);
  *   - floating aggregates wrapped in ROUND(x, 4);
  *   - `events.ts` passed through date_trunc('second') before compare;
  *   - aggregate/computed columns aliased identically in Spark + oracle;
  *   - integer SUMs cast to BIGINT in the oracle (DuckDB widens to
  *     HUGEINT, Spark stays LongType) and window ranks cast to BIGINT in
  *     Spark (Spark rank() is IntegerType, DuckDB's is BIGINT).
  *
  * Scale notes: all joins below are either dim-table joins (Catalyst
  * auto-broadcasts under the 10 MB default with AQE) or key-partitioned
  * shuffles with map-side partial aggregation — nothing materializes on
  * the driver.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Bucketed twin tables per sf dir, written once per JVM: the
    * bucketBy write is the one-time exchange a warehouse pays at ingest
    * so that every later join on the bucket key plans shuffle-free —
    * q103 times the JOIN, not the ingest (same caching rationale as the
    * media fixture in AnalyticsQueries).
    */
  private val bucketedCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def bucketedTables(s: SparkSession, d: String): (String, String) =
    bucketedCache.computeIfAbsent(d, { dir =>
      // md5 prefix, not hashCode: collision-negligible across dirs (a
      // collision would clobber the other dir's tables with wrong-scale
      // data) and never negative
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      val ct = s"graft_bkt_customer_$tag"
      val ot = s"graft_bkt_orders_$tag"
      // a previous JVM may have left the managed location behind with
      // no catalog entry — saveAsTable then fails LOCATION_ALREADY_EXISTS
      Seq(ct, ot).foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new java.io.File(s"spark-warehouse/$tbl")
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
      }
      graft.sinks.BucketedTables.write(
        t(s, dir, "customer"), ct, "c_custkey", 8, Seq("c_custkey"))
      graft.sinks.BucketedTables.write(
        t(s, dir, "orders"), ot, "o_custkey", 8, Seq("o_custkey"))
      (ct, ot)
    })

  val queries: Map[String, Q] = Map(
    // co-located (bucketed) join: both sides bucketBy(8, custkey) at
    // write time, so the fact-dim join plans with NO exchange on either
    // side (merge hint keeps AQE from demoting to broadcast at this
    // test scale — at warehouse scale the sides wouldn't broadcast
    // anyway); the sortBy in the buckets also feeds the merge join
    // without a full sort. Plan pinned in PlanShapeSpec.
    "q103_bucketed_join" -> ((s, d) => {
      val (ct, ot) = bucketedTables(s, d)
      val c = s.table(ct); val o = s.table(ot)
      o.join(c.hint("merge"), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          // prices are cents-valued: sum EXACT decimal cents (the
          // q130 convention) — ROUND(SUM(double)) diverged from the
          // oracle at sf1 where 6M-row accumulation order moved the
          // 4th decimal (the round-12 q212 fragility class)
          sum(expr("CAST(round(o_totalprice * 100) AS DECIMAL(38,0))"))
            .cast("long").as("total_c"))
        .orderBy("c_mktsegment")
    }),

    // Q1 — scan + projection (reference R9/R10)
    "q01_scan" -> ((s, d) => t(s, d, "events")
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")),

    // Q2 — filter (pushed into the parquet scan)
    "q02_filter" -> ((s, d) => t(s, d, "events")
      .filter(col("event_type") === "purchase" && col("value") > 100)
      .select("event_id", "value")
      .orderBy("event_id")),

    // Q3 — dotted-path JSON extraction (reference R9, sql.py:145-166)
    "q03_json_path" -> ((s, d) => t(s, d, "events")
      .select(col("event_id"),
        PathExtract.fromJson(col("props"), "k").cast("bigint").as("k"))
      .orderBy("event_id")),

    // Q4 — missing path ⇒ NULL (sql.py:157-163)
    "q04_missing_path" -> ((s, d) => t(s, d, "events")
      .orderBy("event_id").limit(100)
      .select(col("event_id"),
        PathExtract.fromJson(col("props"), "nope.deeper").as("missing"))),

    // Q5 — residual nesting ⇒ JSON string (sql.py:164-166)
    "q05_residual_json" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        to_json(struct(col("lang"), col("n_chars").as("n"))).as("j"))
      .orderBy("doc_id")),

    // Q3b — the same dotted-path extraction through Spark 4 VariantType
    // (parse once, typed access - the scale path for repeated access to
    // schema-less JSON; oracle identical to q03)
    "q03_variant" -> ((s, d) => t(s, d, "events")
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .orderBy("event_id")),

    // Q6 — sink-side CAST (reference R13, docs/usage.rst:40-41)
    "q06_cast_ts" -> ((s, d) => t(s, d, "events")
      .select(col("event_id"),
        date_trunc("second", col("ts")).cast("string").as("ts_s"))
      .orderBy("event_id")),

    // Q8 — inner equi-join (dim side auto-broadcast)
    "q08_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"), col("n_name"),
          round(col("c_acctbal"), 4).as("bal"))
        .orderBy("c_custkey")
    }),

    // Q9 — multi-way join + agg
    "q09_multijoin" -> ((s, d) => {
      val r = t(s, d, "region"); val n = t(s, d, "nation")
      val cu = t(s, d, "customer")
      r.join(n, r("r_regionkey") === n("n_regionkey"))
        .join(cu, cu("c_nationkey") === n("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("c"))
        .orderBy("r_name", "n_name")
    }),

    // Q10 — left outer join
    "q10_left_join" -> ((s, d) => {
      val n = t(s, d, "nation"); val su = t(s, d, "supplier")
      n.join(su, su("s_nationkey") === n("n_nationkey"), "left")
        .groupBy(col("n_nationkey"))
        .agg(count(col("s_suppkey")).as("nsup"))
        .orderBy("n_nationkey")
    }),

    // Q11 — semi / anti join
    "q11_semi" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
        .select("o_custkey").distinct()
        .orderBy("o_custkey")
    }),
    "q11_anti" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
        .select("o_custkey").distinct()
        .orderBy("o_custkey")
    }),

    // Q12 — range/theta join (equi key + residual range predicate)
    "q12_range_join" -> ((s, d) => {
      val p = t(s, d, "part"); val l = t(s, d, "lineitem")
      p.join(l, l("l_partkey") === p("p_partkey") &&
          l("l_quantity") > p("p_size").cast("double"))
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("c"))
        .orderBy("p_partkey")
    }),

    // Q13 — hash aggregation (TPC-H Q1 shape; partial agg map-side)
    "q13_agg" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")),

    // Q14 — exact distinct (approx_count_distinct certified in tests)
    "q14_distinct" -> ((s, d) => t(s, d, "events")
      .agg(countDistinct(col("user_id")).as("du"))),

    // Q50 — exact percentiles per group (linear interpolation; Spark
    // percentile == DuckDB quantile_cont). approx_percentile is the
    // engine-only scale path, certified within 5% in SketchSpec
    "q50_percentiles" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        // array form: one value buffer serves both price percentiles
        // (identical aggregate expressions are planned once)
        round(element_at(percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.95))), 1), 4).as("p50"),
        round(element_at(percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.95))), 2), 4).as("p95"),
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("q25"))
      .orderBy("l_returnflag")),

    // Q15/Q16 — rollup / cube
    "q15_rollup" -> ((s, d) => t(s, d, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first, col("c"))),
    "q16_cube" -> ((s, d) => t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first, col("c"))),

    // Q15b — explicit GROUPING SETS (beyond rollup/cube)
    "q15_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c
          |""".stripMargin)
    }),

    // Q17 — ranking window + filter (top-3 per nation)
    "q17_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rnk", rank().over(w).cast("bigint"))
        .filter(col("rnk") <= 3)
        .select("c_custkey", "c_nationkey", "rnk")
        .orderBy("c_nationkey", "rnk", "c_custkey")
    }),

    // Q18 — analytic window with row frame
    "q18_window_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"),
          round(sum(col("value")).over(w), 4).as("mv"))
        .orderBy("event_id")
    }),

    // Q19 — lag/lead
    "q19_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), lag(col("event_type"), 1).over(w).as("prev"))
        .orderBy("event_id")
    }),

    // Q20 — global top-K (TakeOrderedAndProject — no full sort at scale)
    "q20_topk" -> ((s, d) => t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("price"))),

    // Q21 — set operations
    "q21_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k")),
    "q21_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k")),
    "q21_union_agg" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .unionAll(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .orderBy("k")),

    // Q21b — multiset (ALL) set operations: bag semantics keep
    // duplicate multiplicities (EXCEPT ALL subtracts per-copy, the
    // "remove one occurrence per match" the distinct forms lose);
    // grouped output so the row hash pins the multiplicities
    "q104_except_all" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .exceptAll(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .orderBy("k")),
    "q104_intersect_all" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersectAll(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .orderBy("k")),

    // Q107 — salted skew join: the manual hot-key fallback (small side
    // exploded saltFactor×, each large row one deterministic salt) —
    // the salt only changes the physical key distribution, so the
    // oracle is the plain join
    "q107_skew_join" -> ((s, d) => {
      val o = t(s, d, "orders").withColumnRenamed("o_custkey", "k")
      val c = t(s, d, "customer")
        .select(col("c_custkey").as("k"), col("c_mktsegment"))
      graft.operators.SkewJoin.salted(o, c, "k", saltFactor = 4)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(avg(col("o_totalprice")), 4).as("avg_price"))
        .orderBy("c_mktsegment")
    }),

    // Q105 — correlated scalar subquery: Catalyst decorrelates it into
    // ONE aggregate + left outer join (never a per-row re-execution),
    // which is why the construct survives at fact-table scale
    "q105_scalar_subquery" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer_sq")
      t(s, d, "orders").createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT COUNT(*) FROM orders_sq o
          |   WHERE o.o_custkey = c.c_custkey) AS n_orders
          |FROM customer_sq c ORDER BY c_custkey
          |""".stripMargin)
    }),

    // Q128 — winsorized aggregates: per-group p05/p95 clip before the
    // sum/avg (the outlier-robust feature-prep transform). The percentile
    // table is |groups| rows broadcast back onto the stream; exact
    // percentile is the declared test-scale semantics, approx_percentile
    // the certified ≤5% scale path (SketchSpec, as with q50)
    "q128_winsorize" -> ((s, d) => {
      val e = t(s, d, "events")
      val pct = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
      // clipped values quantized to 1e-4 and summed as EXACT decimals:
      // a raw double SUM differs in the last ulps between aggregation
      // orders/engines, which round(...,4) can't always hide — the
      // declared semantics is clip-then-quantize (q62's fixed-point
      // convention); only the final display ratios touch doubles
      val q = expr("CAST(round(LEAST(GREATEST(value, lo), hi) * 10000) AS DECIMAL(38,0))")
      e.join(broadcast(pct), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(q).as("sq"))
        .selectExpr("event_type", "n",
          "ROUND(CAST(sq AS DOUBLE) / 10000 / CAST(n AS DOUBLE), 4) AS avg_clipped",
          "ROUND(CAST(sq AS DOUBLE) / 10000, 4) AS sum_clipped")
        .orderBy("event_type")
    }),

    // Q123 — ordered string aggregation (group_concat / string_agg):
    // collect_list is order-nondeterministic under shuffle, so the
    // deterministic form is array_sort before join — the buffered list
    // is bounded by group cardinality (suppliers per nation); for
    // unbounded groups cap with slice() first
    "q123_string_agg" -> ((s, d) => {
      val n = t(s, d, "nation")
      t(s, d, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("members"),
          count(lit(1)).as("n"))
        .orderBy("n_name")
    }),

    // Q124 — relative-rank window functions: percent_rank/cume_dist are
    // pure rank arithmetic over a total order, so the doubles agree
    // bit-for-bit across engines (no sum-order sensitivity)
    "q124_percent_rank" -> ((s, d) => {
      // distribution windows emitted as EXACT integer basis points
      // (half-up in pure integer arithmetic): at sf1, n = 5600 made
      // rk/n an exact .xxxx5 rational whose ROUND(double) is engine-
      // dependent (Spark rounds the shortest decimal repr, DuckDB the
      // binary value) — integers cannot disagree. Keys are unique
      // under the c_custkey tiebreak, so row_number IS the
      // peers-inclusive rank both functions are defined on.
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wp = Window.partitionBy(col("c_nationkey"))
      t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"),
          row_number().over(w).as("rk"),
          count(lit(1)).over(wp).as("n"))
        .select(col("c_custkey"), col("c_nationkey"),
          // n = 1: PERCENT_RANK is defined as 0 (the DIV would be /0).
          // rk is row_number's IntegerType: widen BEFORE the multiply —
          // 20000 * (rk - 1) in 32-bit silently overflows past ~107k
          // rows per partition under non-ANSI Spark while the DuckDB
          // oracle computes in BIGINT
          expr("CAST(CASE WHEN n = 1 THEN 0 ELSE " +
            "(20000 * (CAST(rk AS BIGINT) - 1) + (n - 1)) DIV " +
            "(2 * (n - 1)) END AS BIGINT)").as("pr_bp"),
          expr("CAST((20000 * CAST(rk AS BIGINT) + n) DIV (2 * n) " +
            "AS BIGINT)").as("cd_bp"))
        .orderBy("c_custkey")
    }),

    // Q130 — Pareto / percent-of-total contribution analysis: revenue
    // share and cumulative share by priority. The grand total rides the
    // plan as a one-row broadcast cross join (the q113/q116 scalar
    // pattern — never a global window over the fact table); the ordered
    // cumulative window runs over the |groups|-row AGGREGATED relation
    // only, so the single-partition window sort is O(|groups|), not
    // O(rows)
    "q130_pareto" -> ((s, d) => {
      // prices are cents-valued: sum EXACT decimal cents (order-proof
      // under any partitioning, same convention as q62's fixed-point
      // moments), convert to double only for the final ratios
      val g = t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS DECIMAL(38,0))"))
          .as("cents"))
      val tot = g.agg(sum(col("cents")).as("tot"))
      val w = Window.orderBy(col("cents").desc, col("o_orderpriority"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("cents")).over(w))
        .selectExpr("o_orderpriority",
          "ROUND(CAST(cents AS DOUBLE) / 100, 4) AS rev",
          "ROUND(CAST(cents AS DOUBLE) / CAST(tot AS DOUBLE) * 100, 4) AS pct",
          "ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) * 100, 4) AS cum_pct")
        .orderBy("o_orderpriority")
    }),

    // Q22 — string / date / math scalars
    "q22_scalars" -> ((s, d) => t(s, d, "orders")
      .select(
        col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).as("pri"),
        date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("mon"),
        round(col("o_totalprice") * 0.1, 4).as("tithe"))
      .orderBy("o_orderkey")),

    // Q23 — tumbling-window agg, batch-equivalent form (streaming twin
    // registered separately as q23_stream)
    "q23_hourly" -> ((s, d) => t(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).cast("string").as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 4).as("v"))
      .orderBy("h", "event_type")),

    // Pivot: event counts per user_id bucket x event_type matrix
    "q42_pivot" -> ((s, d) => t(s, d, "events")
      .withColumn("ub", pmod(col("user_id"), lit(10)))
      .groupBy(col("ub"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("ub")),

    // Null-AWARE anti join (NOT IN with a nullable probe key): rows
    // whose key is NULL compare UNKNOWN against the in-list and are
    // FILTERED — the three-valued-logic trap a plain left-anti join
    // gets wrong. Catalyst plans the single-column NOT IN as a
    // null-aware broadcast anti join (NAAJ)
    "q237_null_aware_anti" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("k",
          when(col("event_id") % 10 =!= 0,
            get_json_object(col("props"), "$.k").cast("bigint")))
        .createOrReplaceTempView("q237_ev")
      s.sql("""
        SELECT event_type, COUNT(*) AS c FROM q237_ev
        WHERE k NOT IN (SELECT DISTINCT k FROM q237_ev
                        WHERE event_type = 'signup' AND k IS NOT NULL)
        GROUP BY event_type ORDER BY event_type""")
    }),

    // GROUPING() surface: rollup subtotal rows distinguished from
    // genuine NULL data — the reporting disambiguator ROLLUP output is
    // unusable without
    "q238_grouping_id" -> ((s, d) => t(s, d, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"),
        grouping(col("o_orderstatus")).cast("bigint").as("g_status"),
        grouping(col("o_orderpriority")).cast("bigint").as("g_prio"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first, col("c"))),

    // Percent-of-total (ratio_to_report): each (hour, type) cell's
    // share of its hour in exact ppm — a window over an AGGREGATE
    // (runs on the |hours|x|types| rollup, never the raw events)
    "q239_share_of_total" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")),
            "yyyy-MM-dd HH").as("h"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .select(col("h"), col("event_type"), col("c"),
          expr("c * 1000000 div SUM(c) OVER (PARTITION BY h)")
            .as("share_ppm"))
        .orderBy("h", "event_type")),

    // Null-safe equality join (<=>): NULL keys MATCH each other —
    // the join form plain = silently drops; per-k click vs purchase
    // counts where every 10th event's extracted key is NULL, so the
    // NULL group must survive the inner join
    "q225_nullsafe_join" -> ((s, d) => {
      val e = t(s, d, "events").withColumn("k",
        when(col("event_id") % 10 =!= 0,
          get_json_object(col("props"), "$.k").cast("bigint")))
      val c = e.filter(col("event_type") === "click")
        .groupBy(col("k")).agg(count(lit(1)).as("clicks"))
      val p = e.filter(col("event_type") === "purchase")
        .groupBy(col("k").as("pk")).agg(count(lit(1)).as("purchases"))
      c.join(p, col("k") <=> col("pk"))
        .select(col("k"), col("clicks"), col("purchases"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // Unpivot (wide → long): the inverse relational surface of q42's
    // pivot — four measure columns melt into (measure, val) rows, then
    // re-aggregate per measure. Narrow map-side op; the only shuffle is
    // the 4-key final agg. The per-measure total sums EXACT integer
    // centi-units: a raw double SUM is aggregation-order dependent and
    // crossed the ROUND(.,4) boundary at the sf1 confidence scale
    "q212_unpivot" -> ((s, d) => t(s, d, "lineitem")
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "val")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("c"),
        sum(round(col("val") * 100, 0).cast("bigint")).as("total_c100"))
      .orderBy("measure")),

    // Time-RANGE window frame (vs q18's ROWS frame): trailing 1-hour
    // per-user count/sum keyed on the ORDER BY VALUE, not row position —
    // tied timestamps share one frame, so the result is insensitive to
    // intra-tie row order
    "q213_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-3600, Window.currentRow)
      t(s, d, "events")
        .withColumn("sec", unix_timestamp(date_trunc("second", col("ts"))))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(col("value")).over(w), 4).as("v_1h"))
        .orderBy("event_id")
    }),

    // Ordered array aggregation: each user's first 5 event types in
    // time order as one value — the list(x ORDER BY y) surface. The
    // per-user top-5 cut runs BEFORE the collect (map-side
    // WindowGroupLimit), so the agg never materializes a user's full
    // history; the in-group order comes from array_sort over a
    // (sec, event_id, type) struct — deterministic, event_id unique
    "q216_ordered_collect" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(
              struct(col("sec"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ",").as("first5"))
        .orderBy("user_id")
    }),

    // Extract-all regex surface: every >=4-letter s-word occurrence
    // melted to rows (regexp_extract_all + explode), then the term
    // distribution — the log/text-mining scalar the single-match
    // regexp_extract can't express
    "q218_regex_extract" -> ((s, d) => t(s, d, "documents")
      .select(explode(
        regexp_extract_all(col("text"), lit("\\bs[a-z]{3,}\\b"), lit(0)))
        .as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))),

    // TPC-H Q3 shape: shipping-priority top-10 (3-way join + agg + topK)
    "q39_tpch3" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") < expr("TIMESTAMP '1997-01-01'"))
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") > expr("TIMESTAMP '1997-01-01'"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("string").as("od"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: regional supplier revenue (6-table join)
    "q40_tpch5" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      val l = t(s, d, "lineitem"); val su = t(s, d, "supplier")
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(n, su("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA" &&
          o("o_orderdate") >= expr("TIMESTAMP '1996-01-01'") &&
          o("o_orderdate") < expr("TIMESTAMP '1997-01-01'"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    // 4-way join where nation broadcasts and customer/orders/lineitem
    // shuffle on their join keys; the topK is TakeOrderedAndProject
    // over the ROUNDED revenue (custkey tiebreak) so the cut is
    // insensitive to last-ulp float sums
    "q58_tpch10" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01'") &&
          col("o_orderdate") < expr("TIMESTAMP '1996-04-01'"))
      val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape: large-order customers (groupBy-HAVING semi join
    // back onto the fact table). The qualifying-orderkey set is tiny
    // relative to lineitem, so it broadcasts into semi joins applied to
    // BOTH orders and lineitem BEFORE the wide 3-way join — Catalyst
    // does not reorder left-semi across inner joins, so the pruning
    // must be written where it should execute (fact rows are dropped at
    // the scan side of the shuffle, not after it).
    "q59_tpch18" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("_q"))
        .filter(col("_q") > 150).select(col("l_orderkey").as("_bk"))
      val oBig = o.join(broadcast(big), o("o_orderkey") === col("_bk"), "left_semi")
      val lBig = l.join(broadcast(big), l("l_orderkey") === col("_bk"), "left_semi")
      c.join(oBig, c("c_custkey") === oBig("o_custkey"))
        .join(lBig, oBig("o_orderkey") === lBig("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q25 — sessionization (30-min inactivity gap), batch-equivalent
    "q25_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id"))
      val base = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          date_trunc("second", col("ts")).as("ts_s"))
      val flagged = base.withColumn("prev_ts", lag(col("ts_s"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            col("ts_s") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
            .otherwise(0))
      flagged
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("sid")).as("n_sessions"))
        .orderBy("user_id")
    }),

    // Bloom-pruned fact-to-dim join: the big side is runtime-filtered
    // by a Bloom filter over the selective dim's keys before its
    // shuffle — row-identical to the plain join (oracle IS the plain
    // join), the plan is what changes
    "q81_bloom_join" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_nationkey") === 1)
        .select(col("c_custkey"))
      graft.operators.BloomJoin.prunedInner(
          t(s, d, "orders"), cust, "o_custkey", "c_custkey")
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("total"))
        .orderBy("c_custkey")
    }),

    // bivariate statistics per group: correlation / covariance /
    // stddev are all one-pass partial-aggregatable moments
    "q87_corr" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("r"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          .as("cov"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"))
      .orderBy("l_returnflag")),

    // exact per-group order statistics: interpolated median plus the
    // DETERMINISTIC mode (smallest value among the most frequent — a
    // declared tie-break, not engine luck). The mode's window max runs
    // over the tiny (group, value) rollup, never the fact table; the
    // median is the one genuinely sort-based agg, bounded per group
    "q144_median_mode" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val med = li.groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          count(lit(1)).as("n_rows"))
      val byVal = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      val mode = byVal
        .withColumn("mx",
          max(col("n")).over(Window.partitionBy(col("l_returnflag"))))
        .groupBy(col("l_returnflag"))
        .agg(min(when(col("n") === col("mx"), col("l_quantity")))
          .as("mode_qty"))
      med.join(mode, "l_returnflag").orderBy("l_returnflag")
    }),

    // equi-width histogram per event type: numeric binning is a pure
    // projection, so this is ONE map-side-combinable groupBy
    "q86_histogram" -> ((s, d) => t(s, d, "events")
      .groupBy(col("event_type"),
        floor(col("value") / 50).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 4).as("v"))
      .orderBy("event_type", "bin")),

    // sliding-window aggregation (1 h windows every 30 min): each event
    // lands in exactly two overlapping windows — q23's overlapping
    // sibling, same map-side-combinable groupBy after a 2x fan-out
    "q82_sliding" -> ((s, d) => t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 4).as("v"))
      .select(col("window.start").cast("string").as("w_start"),
        col("event_type"), col("c"), col("v"))
      .orderBy("w_start", "event_type")),

    // distribution-position window functions: quartile bucket, percent
    // rank and cumulative distribution per market segment (unique
    // (acctbal, custkey) ordering key, so both engines agree on peers)
    "q94_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // time-series gap fill: the dense (event_type x hour) grid with
    // zero-filled gaps — sequence() spans the corpus hour range, the
    // sparse hourly counts left-join onto it. The grid is |types| x
    // |hours| rows (tiny next to the events body, which aggregates
    // map-side before its one shuffle).
    "q95_gapfill" -> ((s, d) => {
      val e = t(s, d, "events")
      val hourly = e.groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"))
      val hours = e.agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("h"))
      val types = e.select(col("event_type")).distinct()
      types.crossJoin(hours)
        .join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h").cast("string").as("h"),
          coalesce(col("c"), lit(0L)).as("c"))
        .orderBy("event_type", "h")
    }),

    // RANGE-interval window frame: 7-day trailing moving average over
    // daily revenue (q18's ROWS-frame sibling — the frame is bounded by
    // VALUE distance, so gaps in the day sequence shrink it). The
    // window runs over rows already reduced to |types| x |days|.
    "q101_moving_avg" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(round(sum(col("value")), 4).as("rev"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(unix_timestamp(col("d")))
        .rangeBetween(-6L * 86400, 0)
      daily.select(col("event_type"),
          col("d").cast("date").cast("string").as("d"),
          col("rev"), round(avg(col("rev")).over(w), 4).as("ma7"))
        .orderBy("event_type", "d")
    }),

    // cumulative distinct users by day: first-seen day per user (one
    // map-side-combinable min groupBy), daily new-user counts, running
    // total — the growth-curve query; the window runs over |days| rows
    "q102_cum_users" -> ((s, d) => {
      val firstDay = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts"))).as("d"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstDay.groupBy(col("d")).agg(count(lit(1)).as("new_users"))
        .select(col("d").cast("date").cast("string").as("d"),
          col("new_users"),
          sum(col("new_users")).over(w).as("cum_users"))
        .orderBy("d")
    })
  )

  /** DuckDB-dialect oracles, one per query above. */
  val oracles: Map[String, String] = Map(
    // the bucketed layout only changes the physical plan — the oracle
    // is the plain join
    "q103_bucketed_join" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_orders, "
       + "SUM(CAST(round(o_totalprice * 100) AS HUGEINT))::BIGINT AS total_c "
       + "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
       + "GROUP BY 1 ORDER BY 1"),
    "q01_scan" ->
      "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
    "q02_filter" ->
      "SELECT event_id, value FROM events WHERE event_type = 'purchase' AND value > 100 ORDER BY event_id",
    "q03_json_path" ->
      "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events ORDER BY event_id",
    "q03_variant" ->
      "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events ORDER BY event_id",
    "q04_missing_path" ->
      "SELECT event_id, props->>'$.nope.deeper' AS missing FROM events ORDER BY event_id LIMIT 100",
    "q05_residual_json" ->
      "SELECT doc_id, to_json(struct_pack(lang := lang, n := n_chars)) AS j FROM documents ORDER BY doc_id",
    "q06_cast_ts" ->
      "SELECT event_id, CAST(date_trunc('second', ts) AS VARCHAR) AS ts_s FROM events ORDER BY event_id",
    "q08_join" ->
      "SELECT c.c_custkey, n.n_name, ROUND(c.c_acctbal, 4) AS bal FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey ORDER BY c.c_custkey",
    "q09_multijoin" ->
      "SELECT r.r_name, n.n_name, COUNT(*) AS c FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey JOIN customer cu ON cu.c_nationkey = n.n_nationkey GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name",
    "q10_left_join" ->
      "SELECT n.n_nationkey, COUNT(s.s_suppkey) AS nsup FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY n.n_nationkey ORDER BY n.n_nationkey",
    "q11_semi" ->
      "SELECT o_custkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') GROUP BY o_custkey ORDER BY o_custkey",
    "q11_anti" ->
      "SELECT o_custkey FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') GROUP BY o_custkey ORDER BY o_custkey",
    "q12_range_join" ->
      "SELECT p.p_partkey, COUNT(*) AS c FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size GROUP BY p.p_partkey ORDER BY p.p_partkey",
    "q13_agg" ->
      "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty, ROUND(SUM(l_extendedprice), 4) AS sum_price, ROUND(AVG(l_discount), 4) AS avg_disc, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q14_distinct" ->
      "SELECT COUNT(DISTINCT user_id) AS du FROM events",
    "q15_rollup" ->
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c",
    "q16_cube" ->
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c",
    "q15_grouping_sets" ->
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c",
    "q17_rank" ->
      "SELECT c_custkey, c_nationkey, rnk FROM (SELECT c_custkey, c_nationkey, RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk FROM customer) t WHERE rnk <= 3 ORDER BY c_nationkey, rnk, c_custkey",
    "q18_window_frame" ->
      "SELECT event_id, ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mv FROM events ORDER BY event_id",
    "q19_lag" ->
      "SELECT event_id, LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev FROM events ORDER BY event_id",
    "q20_topk" ->
      "SELECT o_orderkey, ROUND(o_totalprice, 4) AS price FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q21_intersect" ->
      "SELECT k FROM (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier) t ORDER BY k",
    "q21_except" ->
      "SELECT k FROM (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier) t ORDER BY k",
    "q21_union_agg" ->
      "SELECT k, COUNT(*) AS c FROM (SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey AS k FROM supplier) t GROUP BY k ORDER BY k",
    "q104_except_all" ->
      "SELECT k, COUNT(*) AS c FROM (SELECT c_nationkey AS k FROM customer EXCEPT ALL SELECT s_nationkey AS k FROM supplier) t GROUP BY k ORDER BY k",
    "q104_intersect_all" ->
      "SELECT k, COUNT(*) AS c FROM (SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey AS k FROM supplier) t GROUP BY k ORDER BY k",
    "q105_scalar_subquery" ->
      ("SELECT c_custkey, (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders "
       + "FROM customer c ORDER BY c_custkey"),
    // salting is physical-only: the oracle is the plain join
    "q107_skew_join" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(AVG(o_totalprice), 4) AS avg_price "
       + "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
       + "GROUP BY 1 ORDER BY 1"),
    "q128_winsorize" ->
      ("WITH p AS (SELECT event_type, quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi " +
       "FROM events GROUP BY 1), " +
       "m AS (SELECT e.event_type, COUNT(*) AS n, " +
       "SUM(CAST(round(LEAST(GREATEST(e.value, p.lo), p.hi) * 10000) AS DECIMAL(38,0))) AS sq " +
       "FROM events e JOIN p ON e.event_type = p.event_type GROUP BY 1) " +
       "SELECT event_type, n, " +
       "ROUND(CAST(sq AS DOUBLE) / 10000 / CAST(n AS DOUBLE), 4) AS avg_clipped, " +
       "ROUND(CAST(sq AS DOUBLE) / 10000, 4) AS sum_clipped " +
       "FROM m ORDER BY 1"),
    "q123_string_agg" ->
      ("SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS members, COUNT(*) AS n " +
       "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
       "GROUP BY 1 ORDER BY 1"),
    "q124_percent_rank" ->
      ("WITH r AS (SELECT c_custkey, c_nationkey, " +
       "ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS rk, " +
       "COUNT(*) OVER (PARTITION BY c_nationkey) AS n FROM customer) " +
       "SELECT c_custkey, c_nationkey, " +
       "(CASE WHEN n = 1 THEN 0 ELSE (20000 * (rk - 1) + (n - 1)) // (2 * (n - 1)) END)::BIGINT AS pr_bp, " +
       "((20000 * rk + n) // (2 * n))::BIGINT AS cd_bp " +
       "FROM r ORDER BY c_custkey"),
    "q130_pareto" ->
      ("WITH g AS (SELECT o_orderpriority, SUM(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) AS cents FROM orders GROUP BY 1), "
       + "t AS (SELECT SUM(cents) AS tot FROM g), "
       + "c AS (SELECT g.*, tot, SUM(cents) OVER (ORDER BY cents DESC, o_orderpriority ROWS UNBOUNDED PRECEDING) AS cum FROM g, t) "
       + "SELECT o_orderpriority, ROUND(CAST(cents AS DOUBLE) / 100, 4) AS rev, "
       + "ROUND(CAST(cents AS DOUBLE) / CAST(tot AS DOUBLE) * 100, 4) AS pct, "
       + "ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) * 100, 4) AS cum_pct "
       + "FROM c ORDER BY o_orderpriority"),
    "q22_scalars" ->
      "SELECT o_orderkey, SUBSTRING(o_orderpriority, 1, 1) AS pri, CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS mon, ROUND(o_totalprice * 0.1, 4) AS tithe FROM orders ORDER BY o_orderkey",
    "q23_hourly" ->
      "SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS h, event_type, COUNT(*) AS c, ROUND(SUM(value), 4) AS v FROM events GROUP BY 1, 2 ORDER BY h, event_type",
    "q50_percentiles" ->
      ("SELECT l_returnflag, ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50, " +
       "ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95, " +
       "ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25 " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q42_pivot" ->
      ("SELECT user_id % 10 AS ub, " +
       "COUNT(*) FILTER (WHERE event_type = 'click') AS click, " +
       "COUNT(*) FILTER (WHERE event_type = 'error') AS error, " +
       "COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
       "COUNT(*) FILTER (WHERE event_type = 'signup') AS signup, " +
       "COUNT(*) FILTER (WHERE event_type = 'view') AS view " +
       "FROM events GROUP BY 1 ORDER BY 1"),
    "q225_nullsafe_join" ->
      ("WITH e AS (SELECT event_type, CASE WHEN event_id % 10 <> 0 THEN CAST(props->>'$.k' AS BIGINT) END AS k FROM events), "
       + "c AS (SELECT k, COUNT(*) AS clicks FROM e WHERE event_type = 'click' GROUP BY k), "
       + "p AS (SELECT k AS pk, COUNT(*) AS purchases FROM e WHERE event_type = 'purchase' GROUP BY k) "
       + "SELECT c.k, clicks, purchases FROM c JOIN p ON c.k IS NOT DISTINCT FROM p.pk "
       + "ORDER BY k NULLS FIRST"),
    "q237_null_aware_anti" ->
      ("WITH e AS (SELECT event_type, CASE WHEN event_id % 10 <> 0 THEN CAST(props->>'$.k' AS BIGINT) END AS k FROM events) "
       + "SELECT event_type, COUNT(*) AS c FROM e "
       + "WHERE k NOT IN (SELECT DISTINCT k FROM e WHERE event_type = 'signup' AND k IS NOT NULL) "
       + "GROUP BY event_type ORDER BY event_type"),
    "q238_grouping_id" ->
      ("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c, "
       + "GROUPING(o_orderstatus)::BIGINT AS g_status, GROUPING(o_orderpriority)::BIGINT AS g_prio "
       + "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) "
       + "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c"),
    "q239_share_of_total" ->
      ("SELECT h, event_type, c, (c * 1000000 // SUM(c) OVER (PARTITION BY h))::BIGINT AS share_ppm FROM ("
       + "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS h, event_type, COUNT(*)::BIGINT AS c "
       + "FROM events GROUP BY 1, 2) t ORDER BY h, event_type"),
    "q216_ordered_collect" ->
      ("SELECT user_id, array_to_string((list(event_type ORDER BY sec, event_id))[1:5], ',') AS first5 " +
       "FROM (SELECT user_id, event_id, event_type, epoch(date_trunc('second', ts))::BIGINT AS sec FROM events) t " +
       "GROUP BY user_id ORDER BY user_id"),
    "q218_regex_extract" ->
      ("SELECT w, COUNT(*) AS c FROM (SELECT unnest(regexp_extract_all(text, '\\bs[a-z]{3,}\\b')) AS w FROM documents) t " +
       "GROUP BY w ORDER BY c DESC, w"),
    "q212_unpivot" ->
      ("SELECT measure, COUNT(*) AS c, SUM(CAST(ROUND(val * 100, 0) AS BIGINT))::BIGINT AS total_c100 " +
       "FROM (UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem) " +
       "ON l_quantity, l_extendedprice, l_discount, l_tax INTO NAME measure VALUE val) t " +
       "GROUP BY measure ORDER BY measure"),
    "q213_range_frame" ->
      ("SELECT event_id, COUNT(*) OVER w AS n_1h, ROUND(SUM(value) OVER w, 4) AS v_1h " +
       "FROM (SELECT event_id, user_id, value, epoch(date_trunc('second', ts))::BIGINT AS sec FROM events) t " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
       "ORDER BY event_id"),
    "q39_tpch3" ->
      ("SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue, CAST(o_orderdate AS VARCHAR) AS od " +
       "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
       "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01' AND l_shipdate > TIMESTAMP '1997-01-01' " +
       "GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q40_tpch5" ->
      ("SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue " +
       "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
       "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
       "JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey " +
       "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
       "JOIN region r ON n.n_regionkey = r.r_regionkey " +
       "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
       "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "q58_tpch10" ->
      ("SELECT c_custkey, c_name, revenue, n_name FROM (" +
       "SELECT c.c_custkey, c.c_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue, n.n_name " +
       "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
       "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
       "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
       "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01' AND l.l_returnflag = 'R' " +
       "GROUP BY 1, 2, 4) t ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "q59_tpch18" ->
      ("SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice, SUM(l.l_quantity) AS total_qty " +
       "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
       "JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
       "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150) " +
       "GROUP BY 1, 2, 3, 4 ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
    "q25_sessionize" ->
      ("SELECT user_id, COUNT(DISTINCT sid) AS n_sessions FROM (" +
        "SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS sid FROM (" +
        "SELECT user_id, event_id, date_trunc('second', ts) AS ts_s, " +
        "CASE WHEN LAG(date_trunc('second', ts)) OVER (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id) IS NULL " +
        "OR date_trunc('second', ts) > LAG(date_trunc('second', ts)) OVER (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id) + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_s FROM events) a) b GROUP BY user_id ORDER BY user_id"),
    "q87_corr" ->
      ("SELECT l_returnflag, ROUND(corr(l_quantity, l_extendedprice), 4) AS r, "
       + "ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov, "
       + "ROUND(stddev_samp(l_quantity), 4) AS sd_qty "
       + "FROM lineitem GROUP BY 1 ORDER BY l_returnflag"),
    "q86_histogram" ->
      ("SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bin, COUNT(*) AS c, "
       + "ROUND(SUM(value), 4) AS v FROM events GROUP BY 1, 2 ORDER BY event_type, bin"),
    "q144_median_mode" ->
      ("WITH med AS (SELECT l_returnflag, ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty, COUNT(*) AS n_rows FROM lineitem GROUP BY 1), "
       + "c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS n FROM lineitem GROUP BY 1, 2), "
       + "m AS (SELECT l_returnflag, l_quantity, n, MAX(n) OVER (PARTITION BY l_returnflag) AS mx FROM c), "
       + "mo AS (SELECT l_returnflag, MIN(CASE WHEN n = mx THEN l_quantity END) AS mode_qty FROM m GROUP BY 1) "
       + "SELECT med.l_returnflag, med.median_qty, med.n_rows, mo.mode_qty "
       + "FROM med JOIN mo ON med.l_returnflag = mo.l_returnflag ORDER BY 1"),
    // q81's semantics ARE the plain join — the Bloom prune only changes
    // the physical plan, so the oracle is the unpruned SQL
    "q81_bloom_join" ->
      ("SELECT c.c_custkey, COUNT(*) AS n_orders, ROUND(SUM(o.o_totalprice), 4) AS total "
       + "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
       + "WHERE c.c_nationkey = 1 GROUP BY 1 ORDER BY c_custkey"),
    // floor(epoch), not epoch::BIGINT — DuckDB's double-to-int cast
    // ROUNDS (03:59:59.9 would jump to the 04:00 window); ::TIMESTAMP
    // strips the TIMESTAMPTZ '+00' rendering suffix
    "q82_sliding" ->
      ("WITH e AS (SELECT event_type, value, "
       + "to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800)::TIMESTAMP AS w0 FROM events), "
       + "w AS (SELECT event_type, value, unnest([w0, w0 - INTERVAL 30 MINUTE]) AS ws FROM e) "
       + "SELECT CAST(ws AS VARCHAR) AS w_start, event_type, COUNT(*) AS c, "
       + "ROUND(SUM(value), 4) AS v FROM w GROUP BY 1, 2 ORDER BY w_start, event_type"),
    "q94_ntile" ->
      ("SELECT c_custkey, c_mktsegment, NTILE(4) OVER w AS quartile, "
       + "ROUND(PERCENT_RANK() OVER w, 4) AS pr, "
       + "ROUND(CUME_DIST() OVER w, 4) AS cd "
       + "FROM customer "
       + "WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) "
       + "ORDER BY c_mktsegment, c_custkey"),
    "q95_gapfill" ->
      ("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c FROM events GROUP BY 1, 2), "
       + "b AS (SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events), "
       + "hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b), "
       + "types AS (SELECT DISTINCT event_type FROM events) "
       + "SELECT t.event_type, CAST(g.h AS VARCHAR) AS h, COALESCE(hourly.c, 0)::BIGINT AS c "
       + "FROM types t CROSS JOIN hours g "
       + "LEFT JOIN hourly ON hourly.event_type = t.event_type AND hourly.h = g.h "
       + "ORDER BY t.event_type, h"),
    "q101_moving_avg" ->
      ("WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d, ROUND(SUM(value), 4) AS rev FROM events GROUP BY 1, 2) "
       + "SELECT event_type, CAST(d AS VARCHAR) AS d, rev, "
       + "ROUND(AVG(rev) OVER (PARTITION BY event_type ORDER BY epoch(d)::BIGINT RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW), 4) AS ma7 "
       + "FROM daily ORDER BY event_type, d"),
    "q102_cum_users" ->
      ("WITH fd AS (SELECT user_id, MIN(date_trunc('day', ts)) AS d FROM events GROUP BY 1), "
       + "daily AS (SELECT d, COUNT(*) AS new_users FROM fd GROUP BY 1) "
       + "SELECT CAST(d AS VARCHAR) AS d, new_users, "
       + "SUM(new_users) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_users "
       + "FROM daily ORDER BY d")
  )
}
