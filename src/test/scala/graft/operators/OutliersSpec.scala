package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OutliersSpec extends SparkSpec {

  test("planted extreme value is flagged; the bulk is not") {
    import spark.implicits._
    // 100 values tightly around 10.0 plus one extreme spike per group
    val bulk = (1 to 100).map(i => (i.toLong, "a", 10.0 + (i % 7) * 0.01))
    val rows = bulk :+ (999L, "a", 500.0)
    val out = Outliers.zscoreOutliers(
      rows.toDF("id", "grp", "v"), "id", "grp", "v", threshold = 3.0)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(999L), out.mkString(","))
  }

  test("moments are exact: result identical under any partitioning") {
    import spark.implicits._
    val rows = (1 to 5000).map(i =>
      (i.toLong, if (i % 2 == 0) "x" else "y", (i % 83) * 1.37 + i % 19))
    val df = rows.toDF("id", "grp", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Outliers.zscoreOutliers(d, "id", "grp", "v", threshold = 2.5)
        .collect().map(_.toString).sorted.toSeq
    assert(run(df.repartition(1)) == run(df.repartition(17)))
  }

  test("degenerate groups (n=1, constant-valued) emit nothing") {
    import spark.implicits._
    // single-row group: n-1 = 0; constant group: variance = 0. Engines
    // disagree on 0/0 and sqrt(0-eps) (NULL vs inf/NaN), so both shapes
    // are excluded by an explicit guard rather than left to float rules.
    val rows = Seq((1L, "single", 42.0)) ++
      (1 to 50).map(i => (100L + i, "const", 7.0)) ++
      ((1 to 50).map(i => (200L + i, "ok", 10.0 + (i % 5) * 0.01)) :+
        (299L, "ok", 500.0))
    val out = Outliers.zscoreOutliers(
      rows.toDF("id", "grp", "v"), "id", "grp", "v", threshold = 3.0)
      .collect()
    assert(out.map(_.getString(1)).toSet == Set("ok"), out.mkString(","))
    assert(out.map(_.getLong(0)).toSet == Set(299L), out.mkString(","))
  }

  test("MAD flags the spike a masking pair hides from z-scores") {
    import spark.implicits._
    // two extreme spikes inflate the stddev enough that z-scores at 3.0
    // miss the moderate outlier 50.0; the MAD scale is immune
    val bulk = (1 to 100).map(i => (i.toLong, "a", 10.0 + (i % 7) * 0.01))
    val rows = bulk ++ Seq((901L, "a", 5000.0), (902L, "a", -5000.0),
      (903L, "a", 50.0))
    val df = rows.toDF("id", "grp", "v")
    val z = Outliers.zscoreOutliers(df, "id", "grp", "v", threshold = 3.0)
      .collect().map(_.getLong(0)).toSet
    assert(!z.contains(903L), s"z-scores should mask 903: $z")
    val mad = Outliers.madOutliers(df, "id", "grp", "v", threshold = 3.5)
      .collect().map(_.getLong(0)).toSet
    assert(mad == Set(901L, 902L, 903L), mad.toString)
  }

  test("MAD degenerate group (majority-constant => mad=0) emits nothing") {
    import spark.implicits._
    val rows = (1 to 50).map(i => (i.toLong, "c", 7.0)) :+ (99L, "c", 1e6)
    val out = Outliers.madOutliers(
      rows.toDF("id", "grp", "v"), "id", "grp", "v", threshold = 3.5)
      .collect()
    assert(out.isEmpty, out.mkString(","))
  }

  test("MAD robust z matches a direct computation") {
    import spark.implicits._
    val vs = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i + 1L, "g", v) }
      .toDF("id", "grp", "v")
    val med = 3.0                       // median of the 5 values
    val madv = 1.0                      // |dev| = 4,1,0,1,97 -> median 1
    val got = Outliers.madOutliers(df, "id", "grp", "v", threshold = 3.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(5L), got.toString)
    val want = math.abs(100.0 - med) / (madv * 1.4826)
    assert(math.abs(got(5L) - want) < 1e-3, s"got=${got(5L)} want=$want")
  }

  test("z matches a direct two-pass computation") {
    import spark.implicits._
    val rows = Seq((1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0),
      (4L, "g", 4.0), (5L, "g", 100.0))
    val df = rows.toDF("id", "grp", "v")
    val vs = rows.map(_._3)
    val m = vs.sum / vs.size
    val sd = math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (vs.size - 1))
    val expect = vs.zipWithIndex
      .map { case (v, i) => (i + 1L, math.abs(v - m) / sd) }
      .filter(_._2 > 1.5).map(_._1).toSet
    val got = Outliers.zscoreOutliers(df, "id", "grp", "v", threshold = 1.5)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // the quantization (scale=100) keeps z within ~1e-3 of the true value
    val z = Outliers.zscoreOutliers(df, "id", "grp", "v", threshold = 1.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    expect.foreach { id =>
      val v = vs(id.toInt - 1)
      assert(math.abs(z(id) - math.abs(v - m) / sd) < 1e-2,
        s"id=$id z=${z(id)} want=${math.abs(v - m) / sd}")
    }
  }
}
