package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String, rows: Row*) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  private lazy val trades = df("k STRING, t BIGINT, trade_id BIGINT",
    Row("a", 10L, 1L), Row("a", 20L, 2L), Row("a", 25L, 3L),
    Row("b", 10L, 4L), Row("c", 5L, 5L))
  private lazy val quotes = df("k STRING, t BIGINT, px DOUBLE",
    Row("a", 8L, 1.0), Row("a", 20L, 2.0), Row("a", 21L, 3.0),
    Row("b", 15L, 4.0))

  test("backward as-of picks latest right row at-or-before left ts") {
    val r = AsOfJoin.backward(trades, quotes, Seq("k"), "t", Seq("px"))
      .orderBy("trade_id").collect()
      .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(r(1L) == Some(1.0))  // t=10: quote@8
    assert(r(2L) == Some(2.0))  // t=20: quote@20 inclusive
    assert(r(3L) == Some(3.0))  // t=25: quote@21
    assert(r(4L) == None)       // b: only quote is at t=15 > 10
    assert(r(5L) == None)       // c: no quotes at all
  }

  test("tolerance nulls out stale matches") {
    val r = AsOfJoin.backward(trades, quotes, Seq("k"), "t", Seq("px"),
        tolerance = Some(lit(1L)))
      .orderBy("trade_id").collect()
      .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(r(1L) == None)       // quote@8 is 2 old, tolerance 1
    assert(r(2L) == Some(2.0))  // exact-ts match always fresh
  }

  test("right value column collision is rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, quotes.withColumnRenamed("px", "trade_id"),
        Seq("k"), "t", Seq("trade_id"))
    }
  }

  test("forward as-of picks earliest right row at-or-after left ts") {
    val r = AsOfJoin.forward(trades, quotes, Seq("k"), "t", Seq("px"))
      .orderBy("trade_id").collect()
      .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(r(1L) == Some(2.0))  // t=10: next quote@20
    assert(r(2L) == Some(2.0))  // t=20: quote@20 inclusive
    assert(r(3L) == None)       // t=25: nothing after
    assert(r(4L) == Some(4.0))  // b t=10: quote@15
    assert(r(5L) == None)       // c: no quotes
  }

  test("forward tolerance nulls out too-distant matches") {
    val r = AsOfJoin.forward(trades, quotes, Seq("k"), "t", Seq("px"),
        tolerance = Some(lit(5L)))
      .orderBy("trade_id").collect()
      .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(r(1L) == None)       // quote@20 is 10 ahead, tolerance 5
    assert(r(4L) == Some(4.0))  // quote@15 is 5 ahead, inclusive
  }

  test("nearest as-of picks the closer side, ties toward the past") {
    val r = AsOfJoin.nearest(trades, quotes, Seq("k"), "t",
        Seq("px"), matchTsCol = "qts")
      .orderBy("trade_id").collect()
      .map(x => (x.getLong(2),
        (Option(x.get(3)).map(_.asInstanceOf[Double]),
         Option(x.get(4)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(r(1L) == ((Some(1.0), Some(8L))))   // d=2 back vs 10 fwd
    assert(r(2L) == ((Some(2.0), Some(20L))))  // exact
    assert(r(3L) == ((Some(3.0), Some(21L))))  // only backward exists
    assert(r(4L) == ((Some(4.0), Some(15L))))  // only forward exists
    assert(r(5L) == ((None, None)))            // no quotes at all
  }

  test("tolerance gates on the ts of the row that supplied the value") {
    // nearest right row carries a NULL value: its ts must not validate
    // the farther row's value against the staleness budget
    val l = df("k STRING, t BIGINT, id BIGINT", Row("a", 10L, 1L))
    val qB = df("k STRING, t BIGINT, px DOUBLE",
      Row("a", 9L, null), Row("a", 1L, 7.0))
    val rB = AsOfJoin.backward(l, qB, Seq("k"), "t", Seq("px"),
      tolerance = Some(lit(3L))).collect().head
    assert(rB.isNullAt(3), "stale 7.0@t=1 must not pass via null@t=9's ts")
    val qF = df("k STRING, t BIGINT, px DOUBLE",
      Row("a", 12L, null), Row("a", 100L, 9.0))
    val rF = AsOfJoin.forward(l, qF, Seq("k"), "t", Seq("px"),
      tolerance = Some(lit(5L))).collect().head
    assert(rF.isNullAt(3), "far 9.0@t=100 must not pass via null@t=12's ts")
  }

  test("nearest keeps exact distances for epoch-nanosecond longs") {
    // doubles collapse past 2^53: 300 ns back vs 100 ns forward at
    // ~1.7e18 must still pick the forward match
    val base = 1700000000000000000L
    val l = df("k STRING, t BIGINT, id BIGINT", Row("a", base, 1L))
    val q = df("k STRING, t BIGINT, px DOUBLE",
      Row("a", base - 300L, 1.0), Row("a", base + 100L, 2.0))
    val r = AsOfJoin.nearest(l, q, Seq("k"), "t", Seq("px"), "qts")
      .collect().head
    assert(r.getDouble(3) == 2.0 && r.getLong(4) == base + 100L)
  }

  test("nearest tie at equal distance picks the backward match") {
    val l = df("k STRING, t BIGINT, id BIGINT", Row("a", 10L, 1L))
    val q = df("k STRING, t BIGINT, px DOUBLE",
      Row("a", 7L, 1.0), Row("a", 13L, 2.0))
    val r = AsOfJoin.nearest(l, q, Seq("k"), "t", Seq("px"), "qts")
      .collect().head
    assert(r.getDouble(3) == 1.0 && r.getLong(4) == 7L)
  }
}
