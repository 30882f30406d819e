package graft.functions

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests (SURVEY §5.3): random nested JSON objects through the
  * engine's path extraction must honor the reference's rules (missing ⇒
  * null, residual nesting ⇒ JSON string). Raw ScalaCheck generators
  * sampled with fixed seeds (scalatestplus bridge not in the offline
  * dependency set).
  */
class PathExtractPropSpec extends SparkSpec {

  private val leafGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s.take(8) + "\""),
    Gen.oneOf("true", "false", "null"))

  private def objGen(depth: Int): Gen[String] =
    if (depth == 0) leafGen
    else Gen.choose(1, 3).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.identifier.map(_.take(5))
        v <- Gen.frequency(3 -> leafGen, 2 -> objGen(depth - 1))
      } yield s""""$k": $v""").map(_.mkString("{", ", ", "}"))
    }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def extract(json: String, path: String): org.apache.spark.sql.Row = {
    val s = spark
    s.createDataset(Seq(json))(org.apache.spark.sql.Encoders.STRING)
      .toDF("j").select(PathExtract.fromJson(col("j"), path)).collect().head
  }

  test("a path whose first segment is absent is always null") {
    samples(objGen(2), 20).foreach { json =>
      assert(extract(json, "zzzzzz.x").isNullAt(0), json)
    }
  }

  test("top-level scalar keys round-trip") {
    val kv = for {
      k <- Gen.identifier.map(_.take(5))
      v <- Gen.choose(-1000, 1000)
    } yield (k, v)
    samples(kv, 20).foreach { case (k, v) =>
      assert(extract(s"""{"$k": $v}""", k).getString(0) == v.toString)
    }
  }

  test("traversal into a scalar is always null") {
    val kv = for {
      k <- Gen.identifier.map(_.take(5))
      v <- leafGen if v != "null"
    } yield (k, v)
    samples(kv, 20).foreach { case (k, v) =>
      assert(extract(s"""{"$k": $v}""", s"$k.deeper").isNullAt(0), s"$k=$v")
    }
  }

  test("residual nesting always serializes to parseable JSON") {
    val kv = for {
      k <- Gen.identifier.map(_.take(5))
      inner <- objGen(1) if inner.startsWith("{")
    } yield (k, inner)
    samples(kv, 20).foreach { case (k, inner) =>
      val out = extract(s"""{"$k": $inner}""", k).getString(0)
      assert(out != null && out.startsWith("{") && out.endsWith("}"), s"$inner -> $out")
    }
  }
}
