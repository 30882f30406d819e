package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class SamplingSpec extends SparkSpec {
  private lazy val docs = Tables(spark, sf, "documents")

  test("split is exhaustive, disjoint, deterministic, ~80/10/10") {
    val s1 = Sampling.deterministicSplit(docs, "text",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    assert(s1.count() == docs.count())
    val byS = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(byS("train") / n > 0.7 && byS("train") / n < 0.9, byS.toString)
    // repartitioning must not change any assignment
    val s2 = Sampling.deterministicSplit(docs.repartition(7), "text",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s1.select("doc_id", "split").collect().map(_.toString).sorted.toSeq ==
      s2.select("doc_id", "split").collect().map(_.toString).sorted.toSeq)
  }

  test("deterministicSample keeps a stable subset of the right size") {
    val a = Sampling.deterministicSample(docs, "text", 0.25)
    val frac = a.count().toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"frac=$frac")
    val b = Sampling.deterministicSample(docs, "text", 0.25)
    assert(a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      b.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("stratifiedSample keeps every stratum near the target fraction") {
    val s = Sampling.stratifiedSample(docs, "lang", "text", 0.5)
    val per = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    base.foreach { case (lang, total) =>
      val f = per.getOrElse(lang, 0L).toDouble / total
      assert(f > 0.25 && f < 0.75, s"$lang sampled at $f")
    }
  }

  test("temperatureSample: smallest stratum keeps all; rates shrink with size") {
    val kept = Sampling.temperatureSample(docs, "lang", "text", alpha = 0.5)
      .groupBy("lang")
      .agg(count(lit(1)).as("total"), sum(col("keep")).as("kept"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val minLang = kept.minBy(_._2._1)._1
    assert(kept(minLang)._2 == kept(minLang)._1, s"min stratum must keep 100%: $kept")
    // expected rate per stratum is (n_min/n)^0.5 within binomial noise
    val nMin = kept(minLang)._1.toDouble
    kept.foreach { case (lang, (n, k)) =>
      val want = math.sqrt(nMin / n)
      val got = k.toDouble / n
      assert(math.abs(got - want) < 0.15, s"$lang rate=$got want=$want")
    }
  }

  test("temperatureSample: alpha=1 keeps everything; deterministic") {
    val all = Sampling.temperatureSample(docs, "lang", "text", alpha = 1.0)
    assert(all.filter(col("keep") === 0).count() == 0)
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureSample(d, "lang", "text", alpha = 0.5)
        .filter(col("keep") === 1)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(docs) == ids(docs.repartition(13)))
  }
}
