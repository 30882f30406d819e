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

  test("groupAwareSplit: a group never straddles splits; row split leaks") {
    // add case-variant copies so multi-doc groups certainly exist
    // (same normalized key, different doc_id)
    val dupes = docs.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000).as("doc_id"),
        upper(col("text")).as("text"))
    val corpus = docs.select(col("doc_id"), col("text")).unionAll(dupes)
    val grouped = corpus.select(col("doc_id"),
      TextOps.normalizeText(col("text")).as("nkey"))
    val s = Sampling.groupAwareSplit(grouped, "doc_id", col("nkey"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    assert(s.count() == corpus.count())
    // leakage-safety: every normalized-text group maps to ONE split
    val maxSplitsPerGroup = s.groupBy("nkey")
      .agg(count_distinct(col("split")).as("ns"))
      .agg(max("ns")).head().getLong(0)
    assert(maxSplitsPerGroup == 1L)
    // the corpus HAS multi-doc groups (otherwise this test proves nothing)
    assert(s.groupBy("nkey").count().filter(col("count") > 1).count() > 0)
    // partitioning must not change any assignment
    val s2 = Sampling.groupAwareSplit(grouped.repartition(7), "doc_id",
      col("nkey"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.select("doc_id", "split").collect().map(_.toString).sorted.toSeq ==
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

  test("mixtureSample: binding stratum keeps 100%; output tracks target weights") {
    val weights = Seq("en" -> 0.4, "de" -> 0.2, "es" -> 0.2,
      "fr" -> 0.1, "zh" -> 0.1)
    val kept = Sampling.mixtureSample(docs, "lang", "text", weights)
      .groupBy("lang")
      .agg(count(lit(1)).as("total"), sum(col("keep")).as("kept"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val w = weights.toMap
    // the binding stratum (min n/w) keeps everything
    val binding = kept.minBy { case (l, (n, _)) => n / w(l) }._1
    assert(kept(binding)._2 == kept(binding)._1,
      s"binding stratum $binding must keep 100%: $kept")
    // kept counts follow the target mixture within binomial noise
    val totalKept = kept.values.map(_._2).sum.toDouble
    kept.foreach { case (lang, (_, k)) =>
      assert(math.abs(k / totalKept - w(lang)) < 0.07,
        s"$lang kept share ${k / totalKept}, want ${w(lang)}")
    }
  }

  test("mixtureEpochs: per-stratum copies track target; small strata repeat") {
    val weights = Seq("en" -> 0.2, "de" -> 0.2, "es" -> 0.2,
      "fr" -> 0.2, "zh" -> 0.2)
    val out = Sampling.mixtureEpochs(docs, "lang", "text", weights).cache()
    val n = docs.count()
    val per = out.groupBy("lang")
      .agg(count(lit(1)).as("total"), sum(col("n_copies")).as("copies"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    per.foreach { case (lang, (total, copies)) =>
      val target = 0.2 * n
      assert(math.abs(copies - target) <= total * 0.2 + 1,
        s"$lang copies=$copies target=$target")
      // strata above target downsample (copies < total), below repeat
      if (total > target) assert(copies < total, s"$lang should downsample")
      else assert(copies >= total, s"$lang should repeat rows")
    }
    // grand total lands on sizeFactor * N within hash-selection noise
    val copies = per.values.map(_._2).sum
    assert(math.abs(copies - n) <= 0.05 * n, s"total copies $copies vs $n")
  }

  test("mixtureEpochs: N is the WHOLE input even when a stratum is unweighted") {
    // weights omit every lang but en/de: the copy target must still be
    // w * |all docs|, not w * |weighted docs| — the unweighted strata
    // drop from the OUTPUT but not from the denominator
    val out = Sampling.mixtureEpochs(docs, "lang", "text",
      Seq("en" -> 0.5, "de" -> 0.5)).cache()
    assert(out.select("lang").distinct().collect()
      .map(_.getString(0)).toSet == Set("en", "de"))
    val n = docs.count().toDouble
    val copies = out.groupBy("lang").agg(sum(col("n_copies")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    copies.foreach { case (lang, c) =>
      assert(math.abs(c - 0.5 * n) < 0.1 * n,
        s"$lang copies $c must target 0.5 * $n (whole input)")
    }
  }

  test("mixtureSample: unweighted strata drop; assignment partition-independent") {
    val partial = Seq("en" -> 0.7, "de" -> 0.3)
    val out = Sampling.mixtureSample(docs, "lang", "text", partial).cache()
    assert(out.select("lang").distinct().collect()
      .map(_.getString(0)).toSet == Set("en", "de"))
    def keptIds(d: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureSample(d, "lang", "text", partial)
        .filter(col("keep") === 1)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptIds(docs) == keptIds(docs.repartition(11)))
  }

  test("capPerGroup: exact cap on over-cap groups, under-cap untouched, deterministic") {
    // lang groups are ~100 docs each at sf0.01; source groups 25 each.
    // Cap langs at 30: every lang is over-cap -> exactly 30 kept. Cap
    // sources at 40: every source under-cap -> identity (same rows).
    val capped = Sampling.capPerGroup(docs, "lang", "doc_id", 30).cache()
    val per = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    base.foreach { case (lang, total) =>
      assert(per(lang) == math.min(total, 30L), s"$lang kept ${per(lang)}")
    }
    val ident = Sampling.capPerGroup(docs, "source", "doc_id", 40)
    assert(ident.count() == docs.count())
    // kept set is a pure function of the data: partitioning-invariant
    def kept(d: org.apache.spark.sql.DataFrame) =
      Sampling.capPerGroup(d, "lang", "doc_id", 30)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept(docs) == kept(docs.repartition(13)))
  }

  test("dsirSelect: quota respected, target-like docs favored, partition-invariant") {
    val target = docs.filter(col("lang") === "en")
    val sel = Sampling.dsirSelect(docs, target, "doc_id", "text",
      quota = 50).cache()
    assert(sel.count() == 50)
    assert(sel.columns.toSeq == Seq("doc_id", "score_micro"))
    // the selected set should be enriched in the target language well
    // beyond its base rate (the whole point of importance weighting)
    val baseRate = target.count().toDouble / docs.count()
    val selEn = sel.join(docs.select("doc_id", "lang"), "doc_id")
      .filter(col("lang") === "en").count().toDouble / 50
    assert(selEn > baseRate,
      s"selected en-rate $selEn not above base rate $baseRate")
    // exact-integer scores: selection is a pure function of the corpus
    val sel2 = Sampling.dsirSelect(docs.repartition(13),
      target.repartition(7), "doc_id", "text", quota = 50)
    assert(sel.collect().map(_.toString).toSeq ==
      sel2.collect().map(_.toString).toSeq)
    // a doc made of pure target-corpus text must outscore one made of
    // tokens the target never uses
    import spark.implicits._
    val tiny = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zzqq xxyy wwvv uuss ttrr qqpp oonn mmll kkjj")).toDF("doc_id", "text")
    val tgt2 = Seq((10L, "the quick brown fox and the quick dog"))
      .toDF("doc_id", "text")
    val scores = Sampling.dsirSelect(tiny, tgt2, "doc_id", "text", quota = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(1L) > scores(2L))
  }

  test("shuffleExport: exhaustive, balanced, seed-keyed, sorted within shard") {
    val n = docs.count()
    val a = Sampling.shuffleExport(docs.select(col("doc_id")), "doc_id",
      nShards = 8, seed = "s1").cache()
    assert(a.count() == n)
    val byShard = a.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.keySet == (0L until 8L).toSet)
    // md5 is uniform: no shard more than 2x the mean at sf>=0.001
    assert(byShard.values.max < 2 * n / 8, byShard.toString)
    // pure function of (seed, id): partitioning must not move a doc
    val a2 = Sampling.shuffleExport(docs.select(col("doc_id"))
      .repartition(13), "doc_id", nShards = 8, seed = "s1")
    assert(a.select("doc_id", "shard").collect().map(_.toString).sorted.toSeq ==
      a2.select("doc_id", "shard").collect().map(_.toString).sorted.toSeq)
    // a different seed is a genuine reshuffle (some docs change shard)
    val b = Sampling.shuffleExport(docs.select(col("doc_id")), "doc_id",
      nShards = 8, seed = "s2")
    val moved = a.select(col("doc_id"), col("shard").as("s1"))
      .join(b.select(col("doc_id"), col("shard").as("s2")), "doc_id")
      .filter(col("s1") =!= col("s2")).count()
    assert(moved > n / 4, s"only $moved docs moved on reseed")
    // within every output partition, rows arrive in (shard, skey)
    // order (two shards may hash to one partition; the writer streams
    // each shard's run straight to its file)
    val perPartSorted = a.select(col("shard"), col("skey")).rdd
      .mapPartitions(it => Iterator.single(
        it.map(r => (r.getLong(0), r.getString(1)))
          .foldLeft((true, (-1L, ""))) { case ((ok, prev), k) =>
            (ok && (prev._1 < k._1 ||
              (prev._1 == k._1 && prev._2 <= k._2)), k)
          }._1))
      .collect()
    assert(perPartSorted.forall(identity))
  }

  test("rendezvousShard: HRW stability — N->N+1 moves only to the new shard") {
    val a = docs.select(col("doc_id"),
      Sampling.rendezvousShard(col("doc_id"), 16).as("s16"),
      Sampling.rendezvousShard(col("doc_id"), 17).as("s17")).cache()
    val n = a.count()
    // range check + every key present in both assignments
    assert(a.filter(col("s16") < 0 || col("s16") > 15).count() == 0)
    assert(a.filter(col("s17") < 0 || col("s17") > 16).count() == 0)
    // THE rendezvous contract: a changed assignment lands on the new
    // shard — nothing reshuffles between surviving shards
    assert(a.filter(col("s16") =!= col("s17") && col("s17") =!= 16)
      .count() == 0)
    // moved fraction ~ 1/17 (md5 is uniform; allow wide slack at sf)
    val moved = a.filter(col("s16") =!= col("s17")).count().toDouble / n
    assert(moved > 0.015 && moved < 0.12, s"moved=$moved")
    // balance: no shard holds more than 3x the uniform share
    val maxCnt = a.groupBy("s16").count().agg(max("count")).head().getLong(0)
    assert(maxCnt <= 3L * n / 16 + 1, s"max shard size $maxCnt of $n")
    a.unpersist(); ()
  }

  test("shardManifest checksum is order- and partitioning-independent") {
    val assigned = Sampling.shuffleExport(
      docs.select(col("doc_id"), col("text")), "doc_id", 8, "m1")
    val m1 = Sampling.shardManifest(assigned, "shard", "doc_id", "text")
      .orderBy("shard").collect().map(_.toString).toSeq
    // same rows, adversarial order and partitioning: manifest identical
    val shuffled = Sampling.shuffleExport(
      docs.select(col("doc_id"), col("text"))
        .orderBy(col("text")).repartition(13), "doc_id", 8, "m1")
    val m2 = Sampling.shardManifest(shuffled, "shard", "doc_id", "text")
      .orderBy("shard").collect().map(_.toString).toSeq
    assert(m1 == m2)
    // a single-byte payload corruption flips its shard's checksum
    val corrupt = Sampling.shuffleExport(
      docs.select(col("doc_id"),
        when(col("doc_id") === 7, concat(col("text"), lit("x")))
          .otherwise(col("text")).as("text")), "doc_id", 8, "m1")
    val m3 = Sampling.shardManifest(corrupt, "shard", "doc_id", "text")
      .orderBy("shard").collect().map(_.toString).toSeq
    assert(m1 != m3 && m1.zip(m3).count { case (x, y) => x != y } == 1)
  }

  test("combineManifests(old, delta) equals the full recompute exactly") {
    val base = docs.select(col("doc_id"), col("text"))
    def m(df: org.apache.spark.sql.DataFrame) = Sampling.shardManifest(
      Sampling.shuffleExport(df, "doc_id", 16, "cm"), "shard", "doc_id", "text")
    val full = m(base).orderBy("shard").collect().map(_.toString).toSeq
    val inc = Sampling.combineManifests(
        m(base.filter(col("doc_id") % 10 =!= 0)),
        m(base.filter(col("doc_id") % 10 === 0)))
      .orderBy("shard").collect().map(_.toString).toSeq
    assert(inc == full)
    // a tiny delta (one doc) still composes: shards absent from the
    // delta manifest pass through the coalesce identity unchanged
    val inc1 = Sampling.combineManifests(
        m(base.filter(col("doc_id") =!= 3)), m(base.filter(col("doc_id") === 3)))
      .orderBy("shard").collect().map(_.toString).toSeq
    assert(inc1 == full)
  }

  test("packSequences tiles each shard exactly, even on tied sort keys") {
    import spark.implicits._
    // duplicate ids ⇒ duplicate skeys (the documented tied-key edge):
    // the pinned ROWS frame must still hand every row a DISTINCT
    // start_off so the per-shard intervals tile [0, total) exactly —
    // the default RANGE frame gives peers the sum INCLUDING each
    // other, which overlaps the tiles and breaks conservation
    val df = Seq.tabulate(200)(i => (i.toLong % 50, 3L + i % 5))
      .toDF("doc_id", "n_tok")
    val packed = Sampling.packSequences(df, "doc_id", "n_tok",
      seqLen = 16, nShards = 4, seed = "tied").cache()
    val perShard = packed.groupBy("shard")
      .agg(sum("n_tok").as("tot"),
        max(col("start_off") + col("n_tok")).as("hi"),
        count(lit(1)).as("n"),
        countDistinct("start_off").as("nd"))
      .collect()
    assert(perShard.nonEmpty)
    perShard.foreach { r =>
      assert(r.getAs[Long]("hi") == r.getAs[Long]("tot"),
        s"shard ${r.get(0)}: intervals must end exactly at the token total")
      assert(r.getAs[Long]("nd") == r.getAs[Long]("n"),
        s"shard ${r.get(0)}: tied keys must still get distinct offsets")
    }
    // chunk bounds stay consistent with the offsets
    assert(packed.filter(col("chunk_last") < col("chunk_first")).count() == 0)
  }
}
