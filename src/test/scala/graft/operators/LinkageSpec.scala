package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.functions.StrKernels

class LinkageSpec extends SparkSpec {
  private def jw(a: String, b: String): Double =
    StrKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaroWinkler kernel matches the DuckDB/rapidfuzz convention") {
    // textbook pairs (also verified against DuckDB's
    // jaro_winkler_similarity, which the oracle re-scores with)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    // empty-side convention: 0.0, even for empty-vs-empty
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0)
    // prefix boost applies ONLY above jaro 0.7: this pair has jaro 0.5
    // and a 2-char common prefix — boosted it would read 0.6
    assert(jw("abcdefgh", "abxxxxxx") == 0.5)
    // transposition accounting (jaro only)
    assert(math.abs(StrKernels.jaro(UTF8String.fromString("dwayne"),
      UTF8String.fromString("duane")) - 0.8222222222222223) < 1e-12)
  }

  test("jaroWinklerPairs finds in-block near matches above threshold") {
    import spark.implicits._
    val recs = Seq(
      (1L, "acme corp"), (2L, "acme corp."), (3L, "acme inc"),
      (4L, "zenith ltd"), (5L, "zenith ltd"), (6L, "other name")
    ).toDF("id", "name")
    val pairs = Linkage.jaroWinklerPairs(recs, "id", "name",
        threshold = 0.9, lenBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((4L, 5L))) // identical names
    assert(pairs.contains((1L, 2L))) // trailing-dot variant
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("jaroWinklerPairs output is partitioning-invariant") {
    val parts = graft.engine.Tables(spark, sf, "part")
    val a = Linkage.jaroWinklerPairs(parts, "p_partkey", "p_name", 0.88)
      .collect().map(_.toString).sorted.toSeq
    val b = Linkage.jaroWinklerPairs(parts.repartition(7), "p_partkey",
        "p_name", 0.88)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("blocking never pairs across blocks; scores agree with the kernel") {
    val parts = graft.engine.Tables(spark, sf, "part")
    val byId = parts.select(col("p_partkey"), col("p_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Linkage.jaroWinklerPairs(parts, "p_partkey", "p_name", 0.88)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (na, nb) = (byId(a), byId(b))
      assert(na.split(" ").head == nb.split(" ").head) // same block
      assert(na.length / 8 == nb.length / 8)
      assert(math.abs(s - BigDecimal(jw(na, nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(s >= 0.88)
    }
  }
}
