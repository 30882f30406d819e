package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class KmvSpec extends SparkSpec {

  test("sketch rollup: merging stored sub-sketches equals the direct sketch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Encoders
    val agg = udaf(new Kmv.KmvAgg(8), Encoders.scalaLong)
    import spark.implicits._
    // 40 keys split over 4 shards; k=8 so every shard sketch saturates
    val rows = (0 until 40).map(i => (i % 4, s"key-$i")).toDF("shard", "k")
      .select(col("shard"), Kmv.hash60(col("k")).as("h"))
    val direct = rows.agg(agg(col("h"))).collect().head.getSeq[Long](0)
    val rolled = rows.groupBy(col("shard")).agg(agg(col("h")).as("mins"))
      .select(explode(col("mins")).as("h"))
      .agg(agg(col("h"))).collect().head.getSeq[Long](0)
    // bottom-k of merged bottom-ks IS bottom-k of the union — exact
    assert(rolled == direct)
  }
  import spark.implicits._

  test("unsaturated sketch is exact: n_kept = distinct count, no threshold") {
    val df = Seq.tabulate(40)(i => (i % 4, s"key$i"))
      .toDF("g", "k") // 10 distinct keys per group < k=64
    val r = Kmv.distinctEstimate(df, "g", "k", k = 64)
      .collect().map(x => (x.getInt(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)), x.getDouble(3)))
    assert(r.length == 4)
    r.foreach { case (_, nKept, kth, est) =>
      assert(nKept == 10L)
      assert(kth.isEmpty)
      assert(est == 10.0)
    }
  }

  test("saturated estimate lands within the sketch's error envelope") {
    val df = Seq.tabulate(5000)(i => ("all", s"v$i")).toDF("g", "k")
    val est = Kmv.distinctEstimate(df, "g", "k", k = 64)
      .head().getDouble(3)
    // k=64 -> relative stderr ~ 1/sqrt(63) ~ 12.6%; 4 sigma bound
    assert(math.abs(est - 5000) / 5000 < 0.5, s"est $est vs 5000")
  }

  test("sketch is partitioning-invariant (merge order independence)") {
    val docs = Tables(spark, sf, "documents")
    val a = Kmv.distinctEstimate(docs.repartition(13), "lang", "text", k = 16)
      .collect().map(_.toSeq).toSet
    val b = Kmv.distinctEstimate(docs.coalesce(1), "lang", "text", k = 16)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("duplicate keys do not inflate the estimate") {
    val dup = Seq.tabulate(3000)(i => ("all", s"v${i % 30}")).toDF("g", "k")
    val r = Kmv.distinctEstimate(dup, "g", "k", k = 64).head()
    assert(r.getLong(1) == 30L) // 30 distinct, unsaturated: exact
    assert(r.getDouble(3) == 30.0)
  }

  test("intersection estimate tracks true overlap from sketches alone") {
    val a = (0 until 1000).map(i => ("g", s"id$i")).toDF("grp", "k")
    val b = (500 until 1500).map(i => ("g", s"id$i")).toDF("grp", "k")
    val r = Kmv.intersectEstimate(a, b, "grp", "k", k = 128).head()
    val (estA, estB, estI, estJ) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs(estA - 1000) / 1000 < 0.4, s"est_a $estA")
    assert(math.abs(estB - 1000) / 1000 < 0.4, s"est_b $estB")
    assert(math.abs(estI - 500) / 500 < 0.6, s"est_inter $estI")
    // true jaccard = 500/1500 = 0.333
    assert(estJ > 0.1 && estJ < 0.6, s"est_jaccard $estJ")
  }

  test("pairwiseOverlap covers every a<b pair and tracks known overlap") {
    // three groups: g1 = 0..999, g2 = 500..1499 (50% with g1),
    // g3 = disjoint
    val rows = (0 until 1000).map(i => ("g1", s"id$i")) ++
      (500 until 1500).map(i => ("g2", s"id$i")) ++
      (0 until 1000).map(i => ("g3", s"zz$i"))
    val df = rows.toDF("grp", "k")
    val m = Kmv.pairwiseOverlap(df, "grp", "k", k = 128)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(m.keySet == Set("g1" -> "g2", "g1" -> "g3", "g2" -> "g3"))
    assert(m("g1" -> "g2") > 0.1 && m("g1" -> "g2") < 0.6) // true jac 1/3
    assert(m("g1" -> "g3") == 0.0)
    assert(m("g2" -> "g3") == 0.0)
  }

  test("disjoint sets estimate ~zero intersection") {
    val a = (0 until 800).map(i => ("g", s"a$i")).toDF("grp", "k")
    val b = (0 until 800).map(i => ("g", s"b$i")).toDF("grp", "k")
    val r = Kmv.intersectEstimate(a, b, "grp", "k", k = 64).head()
    // a few stray shared-below-theta values can never appear (sets are
    // truly disjoint and hashing is deterministic): exact zero
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.0)
  }

  test("sample sketch: merged shard samples equal the direct sample") {
    import org.apache.spark.sql.Encoders
    val agg = udaf(new Kmv.SampleAgg(8), Encoders.product[Kmv.HV])
    val rows = (0 until 100).map(i => (i % 5, s"id-$i", i * 1.5))
      .toDF("shard", "k", "v")
      .select(col("shard"), Kmv.hash60(col("k")).as("h"), col("v"))
    val direct = rows.agg(agg(col("h"), col("v")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    val rolled = rows.groupBy(col("shard"))
      .agg(agg(col("h"), col("v")).as("s"))
      .select(explode(col("s")).as("s"))
      .select(col("s.h").as("h"), col("s.v").as("v"))
      .agg(agg(col("h"), col("v")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    // bottom-k-by-hash of merged bottom-ks IS bottom-k of the union,
    // values riding along — the mergeability that makes it a sketch
    assert(rolled == direct)
    assert(direct.size == 8)
  }

  test("sample sketch keeps exactly the k globally-smallest hashes") {
    import org.apache.spark.sql.Encoders
    val agg = udaf(new Kmv.SampleAgg(4), Encoders.product[Kmv.HV])
    val rows = (0 until 50).map(i => (s"id-$i", i.toDouble)).toDF("k", "v")
      .select(Kmv.hash60(col("k")).as("h"), col("v"))
    val kept = rows.agg(agg(col("h"), col("v")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expected = rows.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1).take(4).toSeq
    assert(kept == expected)
  }
}
