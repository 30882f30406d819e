package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Dedup invariants over generated corpora (seeded ScalaCheck):
  * conservation of rows, min-id keep rule, and minhash estimate
  * bounded by [0,1] with exact-dup pairs at 1.0.
  */
class DedupPropSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val docGen: Gen[Seq[String]] = for {
    vocab <- Gen.listOfN(8, Gen.identifier.map(_.take(4))).map(_.distinct)
    n <- Gen.choose(5, 20)
    docs <- Gen.listOfN(n, Gen.listOfN(6, Gen.oneOf(vocab)).map(_.mkString(" ")))
  } yield docs

  private def df(texts: Seq[String]) =
    spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType.fromDDL("doc_id BIGINT, text STRING"))

  private def corpora(n: Int): Seq[Seq[String]] =
    (1 to n).flatMap(i => docGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("exact dedup conserves rows and keeps the min id per text") {
    corpora(8).foreach { texts =>
      val d = df(texts)
      val r = Dedup.exact(d, "doc_id", "text").collect()
      assert(r.map(_.getLong(1)).sum == texts.length, "n_copies sums to corpus size")
      val expectKeep = texts.zipWithIndex.groupBy(_._1)
        .map { case (_, g) => g.map(_._2.toLong).min }.toSet
      assert(r.map(_.getLong(0)).toSet == expectKeep)
    }
  }

  test("minhash est_jac is within [0,1]; identical texts estimate 1.0") {
    corpora(4).foreach { texts =>
      val withDup = texts ++ texts.headOption // force one exact dup pair
      val r = Dedup.minHashPairs(df(withDup), "doc_id", "text",
        n = 1, threshold = 0.0).collect()
      assert(r.forall(x => x.getDouble(2) >= 0.0 && x.getDouble(2) <= 1.0))
      val dupPair = r.find(x =>
        x.getLong(0) == 0L && x.getLong(1) == withDup.length - 1L)
      dupPair.foreach(p => assert(p.getDouble(2) == 1.0))
    }
  }
}
