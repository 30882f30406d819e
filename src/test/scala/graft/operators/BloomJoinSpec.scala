package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class BloomJoinSpec extends SparkSpec {

  private lazy val orders = Tables(spark, sf, "orders")
  private lazy val cust = Tables(spark, sf, "customer")

  test("prunedInner is row-identical to the plain inner join") {
    val dim = cust.filter(col("c_nationkey") === 1).select("c_custkey")
    val got = BloomJoin.prunedInner(orders, dim, "o_custkey", "c_custkey")
      .select("o_orderkey", "c_custkey")
      .collect().map(_.toString).sorted.toSeq
    val want = orders.join(dim, orders("o_custkey") === dim("c_custkey"))
      .select("o_orderkey", "c_custkey")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("empty small side yields an empty join (no NPE on null bloom)") {
    val dim = cust.filter(lit(false)).select("c_custkey")
    assert(BloomJoin.prunedInner(orders, dim, "o_custkey", "c_custkey")
      .count() == 0)
  }

  test("high-fpp filter still gives exact results (FPs die in the join)") {
    val dim = cust.filter(col("c_custkey") % 50 === 0).select("c_custkey")
    val got = BloomJoin.prunedInner(orders, dim, "o_custkey", "c_custkey",
        fpp = 0.5)
      .count()
    val want = orders.join(dim, orders("o_custkey") === dim("c_custkey"))
      .count()
    assert(got == want)
  }
}
