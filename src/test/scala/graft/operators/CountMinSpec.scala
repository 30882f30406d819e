package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish fixture: key k_i appears ~1000/i times — heavy head,
  // long tail, the shape CMS is built for
  private lazy val rows: Seq[String] =
    (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"k$i"))
  private lazy val df = rows.toDF("w")
  private lazy val exact: Map[String, Long] =
    rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def estimates(depth: Int, width: Int): Map[String, Long] = {
    val tab = CountMin.table(df, "w", depth, width)
    val cand = exact.keys.toSeq.toDF("w")
    CountMin.estimate(tab, cand, "w", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, and are exact when width is ample") {
    val est = estimates(depth = 4, width = 256)
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k undercounted: ${est(k)} < $c")
    }
    // collision excess stays within a small multiple of N/width
    // (deterministic given the fixed hash — a regression pin, with the
    // probabilistic bound E[excess] = N/width behind it)
    val n = rows.size.toLong
    exact.foreach { case (k, c) =>
      assert(est(k) - c <= 4 * n / 256, s"$k excess ${est(k) - c}")
    }
  }

  test("narrow sketch still never undercounts under heavy collision") {
    val est = estimates(depth = 4, width = 8)
    exact.foreach { case (k, c) => assert(est(k) >= c) }
  }

  test("merge equals rebuild: summed half-tables == whole-corpus table") {
    val (h1, h2) = rows.splitAt(rows.size / 2)
    val merged = CountMin.table(h1.toDF("w"), "w", 4, 64)
      .unionAll(CountMin.table(h2.toDF("w"), "w", 4, 64))
      .groupBy(col("r"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val whole = CountMin.table(df, "w", 4, 64)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("absent key estimates 0 when no collision, never negative") {
    val tab = CountMin.table(df, "w", 4, 4096)
    val est = CountMin.estimate(tab, Seq("never-seen").toDF("w"), "w", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("never-seen") >= 0L)
  }
}
