package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** TPC-H completion pack (q108–q122, q183–q184): the remaining
  * canonical TPC-H query shapes, adapted to the synthetic star schema
  * (no `partsupp`, no commit/receipt dates, no
  * shipmode/container/comment columns):
  *
  *   - part↔supplier relations derive from `lineitem` (distinct pairs);
  *   - "late" = `l_shipdate > o_orderdate + N days` stands in for the
  *     commit/receipt-date lag predicates of Q4/Q12/Q21;
  *   - Q11/Q20's availqty/supplycost become shipped-value/quantity.
  *
  * Together with Q3/Q5/Q10/Q18 in [[CoreQueries]] this covers every
  * TPC-H shape: correlated scalar subqueries (Q2/Q17), EXISTS /
  * NOT-EXISTS (Q4/Q21/Q22), multi-way dimension chains with aliased
  * dims (Q7/Q8/Q9), global-scalar HAVING (Q11/Q15), conditional
  * aggregation ratios (Q8/Q12/Q14), NOT-IN anti joins (Q16/Q22),
  * disjunctive pushdown (Q19), nested semi joins (Q20), the pure
  * pushdown scan (Q6), and outer-join count distributions (Q13).
  *
  * Conventions follow CoreQueries: total ORDER BY, ROUND(·,4) on float
  * aggregates, identical column aliases in Spark and oracle, counts
  * left as BIGINT on both sides.
  *
  * Scale notes (100 TB framing): every dim side (part, supplier,
  * nation, filtered key lists) is broadcast so the fact table shuffles
  * at most once per aggregation grain; one-row global scalars (totals,
  * maxima, averages) ride the plan as broadcast cross joins, never a
  * driver collect; correlated subqueries are written as their
  * decorrelated join form directly, which is exactly what Catalyst
  * produces for the SQL form — a per-row re-execution never exists.
  */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, Q] = Map(
    // Q2 shape — min-acctbal supplier per qualifying part. The
    // part↔supplier relation is the distinct (partkey, suppkey)
    // projection of lineitem: one distinct-shuffle at fact grain, then
    // the window min runs on the p_partkey partitioning the join
    // already established. Ties on the min keep all suppliers (as in
    // TPC-H Q2).
    "q108_tpch2" -> ((s, d) => {
      val ps = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val p = t(s, d, "part")
        .filter(col("p_size") < 10 && col("p_type") === "SMALL")
        .select(col("p_partkey"), col("p_name"))
      val su = t(s, d, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      val j = ps.join(broadcast(p), ps("l_partkey") === p("p_partkey"))
        .join(broadcast(su), ps("l_suppkey") === su("s_suppkey"))
      val w = Window.partitionBy(col("p_partkey"))
      j.withColumn("mn", min(col("s_acctbal")).over(w))
        .filter(col("s_acctbal") === col("mn"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          round(col("s_acctbal"), 4).as("acctbal"))
        .orderBy("p_partkey", "s_name")
    }),

    // Q4 shape — priority counts of orders with at least one late line
    // (EXISTS): a left-semi join whose equi key is the orderkey and
    // whose residual is the non-equi lateness predicate, so it plans
    // as a shuffled-hash semi join, never a per-row subquery.
    "q109_tpch4" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01'") &&
          col("o_orderdate") < expr("TIMESTAMP '1996-07-01'"))
      val l = t(s, d, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q7 shape — bilateral shipping volume between two nations by ship
    // year. The nation dims are FILTERED to the two names BEFORE the
    // broadcast joins, so supplier and customer rows outside the pair
    // are dropped at the dim join, not in a post-join filter over the
    // full fact join.
    "q110_tpch7" -> ((s, d) => {
      // NATION_3/NATION_8 have suppliers at every test scale (sf0.001's
      // 10-supplier sample covers only a third of the nations)
      val pair = Seq("NATION_3", "NATION_8")
      val n1 = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val su = t(s, d, "supplier").join(broadcast(n1),
        col("s_nationkey") === col("n1_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val c = t(s, d, "customer").join(broadcast(n2),
        col("c_nationkey") === col("n2_key"))
        .select(col("c_custkey"), col("cust_nation"))
      val l = t(s, d, "lineitem"); val o = t(s, d, "orders")
      l.join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
          (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
        .withColumn("l_year", year(col("l_shipdate")).cast("bigint"))
        .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(round(sum(col("volume")), 4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8 shape — market share of one supplier nation per order year for
    // one part type sold into one region: a conditional-aggregation
    // ratio over a 7-table chain where every non-fact side broadcasts.
    "q111_tpch8" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      val n1 = t(s, d, "nation").join(broadcast(r),
        col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cust_nkey"))
      val c = t(s, d, "customer").join(broadcast(n1),
        col("c_nationkey") === col("cust_nkey"))
        .select(col("c_custkey"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("supp_nkey"), col("n_name").as("nation"))
      val su = t(s, d, "supplier").join(broadcast(n2),
        col("s_nationkey") === col("supp_nkey"))
        .select(col("s_suppkey"), col("nation"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01'") &&
          col("o_orderdate") < expr("TIMESTAMP '1998-01-01'"))
      val l = t(s, d, "lineitem")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .withColumn("o_year", year(col("o_orderdate")).cast("bigint"))
        .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy(col("o_year"))
        .agg(round(
          sum(when(col("nation") === "NATION_3", col("volume")).otherwise(lit(0.0))) /
            sum(col("volume")), 4).as("mkt_share"))
        .orderBy("o_year")
    }),

    // Q9 shape — product profit by supplier nation × order year for a
    // part-name family. Profit uses p_retailprice·quantity·0.1 as the
    // supply-cost stand-in (no partsupp in this schema).
    "q112_tpch9" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_name").like("%bolt%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val n = t(s, d, "nation")
        .select(col("n_nationkey"), col("n_name").as("nation"))
      val su = t(s, d, "supplier").join(broadcast(n),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("nation"))
      val l = t(s, d, "lineitem"); val o = t(s, d, "orders")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(o.select(col("o_orderkey"), col("o_orderdate")),
          l("l_orderkey") === col("o_orderkey"))
        .withColumn("o_year", year(col("o_orderdate")).cast("bigint"))
        .withColumn("amount",
          col("l_extendedprice") * (lit(1) - col("l_discount")) -
            lit(0.1) * col("p_retailprice") * col("l_quantity"))
        .groupBy(col("nation"), col("o_year"))
        .agg(round(sum(col("amount")), 4).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q11 shape — part-value concentration for one nation's suppliers:
    // value per part HAVING > fraction of the grand total. The total is
    // a one-row aggregate broadcast back over the per-part values —
    // the global scalar never touches the driver.
    "q113_tpch11" -> ((s, d) => {
      val su = t(s, d, "supplier").filter(col("s_nationkey") === 3)
        .select(col("s_suppkey"))
      val v = t(s, d, "lineitem")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey").as("p_key"))
        .agg(sum(col("l_extendedprice") * col("l_quantity")).as("val"))
      val total = v.agg((sum(col("val")) * lit(0.002)).as("cut"))
      v.crossJoin(broadcast(total))
        .filter(col("val") > col("cut"))
        .select(col("p_key"), round(col("val"), 4).as("part_value"))
        .orderBy(col("part_value").desc, col("p_key"))
    }),

    // Q12 shape — late-line priority counts by linestatus: the
    // CASE-conditional dual count over a single fact join.
    "q114_tpch12" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-01-01'"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // Q14 shape — promo revenue percentage for one ship month: a
    // conditional-aggregation ratio, single output row.
    "q115_tpch14" -> ((s, d) => {
      val p = t(s, d, "part").select(col("p_partkey"), col("p_type"))
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-03-01'") &&
          col("l_shipdate") < expr("TIMESTAMP '1996-04-01'"))
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev), 4).as("promo_revenue"))
    }),

    // Q15 shape — top supplier(s) by quarterly revenue: the per-supplier
    // revenue "view" feeds a one-row MAX broadcast back over itself
    // (ties keep all maxima, as in the spec). Revenue is rounded BEFORE
    // the max-equality so the cut is insensitive to last-ulp sums.
    "q116_tpch15" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP '1996-04-01'"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      val su = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(broadcast(su), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Q16 shape — distinct supplier counts per part attribute triple,
    // excluding a supplier denylist (NOT IN → broadcast anti join;
    // equivalent because s_suppkey is never NULL).
    "q117_tpch16" -> ((s, d) => {
      val bad = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      val p = t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(p), col("l_partkey") === p("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === bad("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q17 shape — revenue from small-quantity lines of one brand, where
    // "small" is a correlated per-part average. Written directly as its
    // decorrelated form: per-part averages (semi-pruned to the brand's
    // parts before aggregating — the full-corpus aggregate Q17's SQL
    // implies would shuffle every part for a 1/25-brand answer) joined
    // back broadcast. Integer-valued quantities make the 0.5·avg
    // threshold exact in IEEE arithmetic, so the comparison is
    // engine-order-independent.
    "q118_tpch17" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_brand") === "Brand#2")
        .select(col("p_partkey"))
      val l = t(s, d, "lineitem")
      val avgQ = l.join(broadcast(p), l("l_partkey") === p("p_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("a_key"))
        .agg(avg(col("l_quantity")).as("avg_q"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(avgQ), l("l_partkey") === col("a_key"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_q"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
    }),

    // Q19 shape — disjunctive brand/size/quantity predicate bands: the
    // OR of three conjunct groups evaluates post-join in one codegen
    // stage; the part side broadcasts with only its band-relevant
    // columns.
    "q119_tpch19" -> ((s, d) => {
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val l = t(s, d, "lineitem")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50)))
        // revenue in EXACT 10^-4 units: both factors are 2-decimal
        // values, so cents x (100 - discount-percent) is an integer —
        // ROUND(SUM(double)) moved in the 4th decimal at sf1 under
        // 6M-row accumulation order (the q212 fragility class)
        .agg(sum(expr(
            "CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) * " +
              "CAST(100 - round(l_discount * 100) AS DECIMAL(38,0))"))
          .cast("long").as("revenue_u"))
    }),

    // Q20 shape — suppliers who shipped in bulk from a part-name family
    // in one year: nested semi joins (parts → qualifying (supp, part)
    // volumes → supplier). Each inner key list is aggregated to keys
    // only before the next semi join.
    "q120_tpch20" -> ((s, d) => {
      val red = t(s, d, "part").filter(col("p_name").like("red%"))
        .select(col("p_partkey"))
      val bulk = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-01-01'"))
        .join(broadcast(red), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 50)
        .select(col("l_suppkey")).distinct()
      t(s, d, "supplier")
        .join(bulk, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    }),

    // Q21 shape — the sole-late supplier in multi-supplier finished
    // orders. The EXISTS / NOT-EXISTS pair is computed as per-order
    // distinct counts (suppliers, late suppliers) in ONE aggregation
    // over the order-joined fact — for a late line, "another supplier
    // exists AND no other supplier was late" ⟺ n_supp ≥ 2 ∧ n_late = 1.
    // That replaces two correlated-subquery scans of lineitem with one.
    "q121_tpch21" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lo = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .cast("int"))
      val per = lo.groupBy(col("o_orderkey").as("agg_okey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("is_late") === 1, col("l_suppkey"))).as("n_late"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
        .select(col("agg_okey"))
      val su = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
      lo.filter(col("is_late") === 1)
        .join(per, col("o_orderkey") === col("agg_okey"), "left_semi")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // Q22 shape — rich customers with no recent orders, per market
    // segment: a one-row positive-balance average broadcast over the
    // customer scan, then a NOT-EXISTS anti join against recent orders.
    "q122_tpch22" -> ((s, d) => {
      val c = t(s, d, "customer")
      val avgPos = c.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("ab"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1999-01-01'"))
        .select(col("o_custkey"))
      c.crossJoin(broadcast(avgPos))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 4).as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // Q6 shape — the forecasting-revenue-change scan: pure
    // filter + global sum, zero joins. The point at scale is the PLAN:
    // every predicate pushes to the parquet scan (PushedFilters on
    // shipdate/discount/quantity), the projection reads two columns,
    // and the aggregate is one map-side-combinable partial per split.
    "q183_tpch6" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1996-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-01-01'") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
          .as("revenue"))),

    // Q13 shape — customer distribution by order count (non-urgent
    // stand-in for the comment-pattern exclusion): orders pre-aggregate
    // to customer grain FIRST (map-side combinable), then the left join
    // fills in zero-order customers — the fact table never carries
    // through the join, only the |customers|-sized rollup does.
    "q184_tpch13" -> ((s, d) => {
      val oc = t(s, d, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("c_count0"))
      t(s, d, "customer").select(col("c_custkey"))
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("c_count0"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    })
  )

  val oracles: Map[String, String] = Map(
    "q108_tpch2" ->
      ("WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), " +
       "j AS (SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, " +
       "MIN(s.s_acctbal) OVER (PARTITION BY p.p_partkey) AS mn " +
       "FROM part p JOIN ps ON p.p_partkey = ps.l_partkey " +
       "JOIN supplier s ON s.s_suppkey = ps.l_suppkey " +
       "WHERE p.p_size < 10 AND p.p_type = 'SMALL') " +
       "SELECT p_partkey, p_name, s_name, ROUND(s_acctbal, 4) AS acctbal " +
       "FROM j WHERE s_acctbal = mn ORDER BY p_partkey, s_name"),
    "q109_tpch4" ->
      ("SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o " +
       "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' " +
       "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey " +
       "AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY) " +
       "GROUP BY 1 ORDER BY 1"),
    "q110_tpch7" ->
      ("SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue FROM (" +
       "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
       "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, " +
       "l.l_extendedprice * (1 - l.l_discount) AS volume " +
       "FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey " +
       "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
       "JOIN customer c ON c.c_custkey = o.o_custkey " +
       "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey " +
       "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey " +
       "WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8') " +
       "OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))" +
       ") t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    "q111_tpch8" ->
      ("SELECT o_year, ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / SUM(volume), 4) AS mkt_share " +
       "FROM (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year, " +
       "l.l_extendedprice * (1 - l.l_discount) AS volume, n2.n_name AS nation " +
       "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey " +
       "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
       "JOIN orders o ON l.l_orderkey = o.o_orderkey " +
       "JOIN customer c ON o.o_custkey = c.c_custkey " +
       "JOIN nation n1 ON c.c_nationkey = n1.n_nationkey " +
       "JOIN region r ON n1.n_regionkey = r.r_regionkey " +
       "JOIN nation n2 ON s.s_nationkey = n2.n_nationkey " +
       "WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO' " +
       "AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'" +
       ") t GROUP BY o_year ORDER BY o_year"),
    "q112_tpch9" ->
      ("SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit FROM (" +
       "SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year, " +
       "l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity AS amount " +
       "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey " +
       "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
       "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
       "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
       "WHERE p.p_name LIKE '%bolt%'" +
       ") t GROUP BY 1, 2 ORDER BY nation, o_year DESC"),
    "q113_tpch11" ->
      ("WITH v AS (SELECT l.l_partkey AS p_key, SUM(l.l_extendedprice * l.l_quantity) AS val " +
       "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
       "WHERE s.s_nationkey = 3 GROUP BY 1) " +
       "SELECT p_key, ROUND(val, 4) AS part_value FROM v " +
       "WHERE val > (SELECT SUM(val) * 0.002 FROM v) " +
       "ORDER BY part_value DESC, p_key"),
    "q114_tpch12" ->
      ("SELECT l.l_linestatus, " +
       "CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
       "CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
       "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
       "WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY " +
       "AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01' " +
       "GROUP BY 1 ORDER BY 1"),
    "q115_tpch14" ->
      ("SELECT ROUND(100.00 * SUM(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) " +
       "/ SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue " +
       "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey " +
       "WHERE l.l_shipdate >= TIMESTAMP '1996-03-01' AND l.l_shipdate < TIMESTAMP '1996-04-01'"),
    "q116_tpch15" ->
      ("WITH rev AS (SELECT l_suppkey AS supplier_no, " +
       "ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue " +
       "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01' " +
       "GROUP BY 1) " +
       "SELECT s.s_suppkey, s.s_name, r.total_revenue " +
       "FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no " +
       "WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev) " +
       "ORDER BY s_suppkey"),
    "q117_tpch16" ->
      ("SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt " +
       "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
       "WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO' " +
       "AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35) " +
       "AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
       "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    "q118_tpch17" ->
      ("SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly " +
       "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
       "WHERE p.p_brand = 'Brand#2' " +
       "AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)"),
    "q119_tpch19" ->
      ("SELECT SUM(CAST(round(l.l_extendedprice * 100) AS HUGEINT) * CAST(100 - round(l.l_discount * 100) AS HUGEINT))::BIGINT AS revenue_u " +
       "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
       "WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20) " +
       "OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40) " +
       "OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)"),
    "q120_tpch20" ->
      ("SELECT s.s_suppkey, s.s_name FROM supplier s " +
       "WHERE s.s_suppkey IN (SELECT l.l_suppkey FROM lineitem l " +
       "WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') " +
       "AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01' " +
       "GROUP BY l.l_suppkey, l.l_partkey HAVING SUM(l.l_quantity) > 50) " +
       "ORDER BY s_suppkey"),
    "q121_tpch21" ->
      ("SELECT s.s_name, COUNT(*) AS numwait " +
       "FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey " +
       "JOIN orders o ON o.o_orderkey = l1.l_orderkey " +
       "WHERE o.o_orderstatus = 'F' AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY " +
       "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
       "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
       "AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) " +
       "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20"),
    "q122_tpch22" ->
      ("SELECT c_mktsegment, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 4) AS totacctbal " +
       "FROM customer c " +
       "WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0) " +
       "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
       "AND o.o_orderdate >= TIMESTAMP '1999-01-01') " +
       "GROUP BY 1 ORDER BY 1"),
    "q183_tpch6" ->
      ("SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue " +
       "FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
       "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    "q184_tpch13" ->
      ("WITH oc AS (SELECT o_custkey, COUNT(*) AS c_count0 FROM orders " +
       "WHERE o_orderpriority <> '1-URGENT' GROUP BY 1) " +
       "SELECT COALESCE(c_count0, 0)::BIGINT AS c_count, COUNT(*)::BIGINT AS custdist " +
       "FROM customer LEFT JOIN oc ON c_custkey = o_custkey " +
       "GROUP BY 1 ORDER BY custdist DESC, c_count DESC")
  )
}
