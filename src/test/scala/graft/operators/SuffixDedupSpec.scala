package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: duplicated W-gram starts, merged islands. */
  private def bruteSpans(texts: Seq[(Long, String)], w: Int,
      minCount: Int = 2): Set[(Long, Long, Long)] = {
    val grams = texts.flatMap { case (id, t) =>
      (0 to t.length - w).map(i => (id, i + 1, t.substring(i, i + w)))
    }
    val counts = grams.groupBy(_._3).map { case (g, xs) => g -> xs.size }
    val dupPos = grams.filter(g => counts(g._3) >= minCount)
      .map(g => (g._1, g._2)).groupBy(_._1)
    dupPos.flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      sorted.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2) {
          val (s, e) = spans.remove(spans.length - 1)
          spans += ((s, math.max(e, p + w)))
        } else spans += ((p, p + w))
      }
      spans.map { case (s, e) => (id, s.toLong, (e - s).toLong) }
    }.toSet
  }

  test("windowClasses: class equality == exact substring equality") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen quick brown foxes"),
      (3L, "the quick brown fox naps; the quick brown fox naps"))
    for (w <- Seq(2, 3, 5, 8, 11)) {
      // cls is an opaque equality-comparable id (long or struct,
      // depending on the re-rank schedule) — compare it as a value
      val cls = SuffixDedup.windowClasses(texts.toDF("doc_id", "text"),
          "doc_id", "text", w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.get(2)))
      val byText = texts.toMap
      // exactly one row per window start
      assert(cls.length == texts.map(_._2.length - w + 1).sum)
      val grouped = cls.groupBy(_._3).values
      grouped.foreach { rows =>
        val subs = rows.map { case (id, p, _) =>
          byText(id).substring(p - 1, p - 1 + w) }.toSet
        assert(subs.size == 1, s"w=$w: one class, two substrings: $subs")
      }
      // and distinct classes never share a substring
      val bySub = cls.groupBy { case (id, p, _) =>
        byText(id).substring(p - 1, p - 1 + w) }.values
      bySub.foreach { rows =>
        assert(rows.map(_._3).distinct.length == 1,
          s"w=$w: equal substrings split across classes")
      }
    }
  }

  test("planted repeat LONGER than the window surfaces as ONE full span") {
    val repeat = "abcdefghijklmnopqrstuvwxyz0123456789" * 3 // 108 chars
    // APERIODIC filler (multiplicative hash of the index) — a linear
    // congruence mod 26 would repeat with period 26 < window and make
    // the filler itself a duplicated span
    def filler(seed: Int, n: Int): String =
      (0 until n).map { i =>
        ((((i + seed * 1000) * 2654435761L >>> 16) % 26) + 'A').toChar
      }.mkString
    val docs = Seq(
      (10L, filler('a', 61) + repeat + filler('b', 47)),
      (20L, filler('c', 31) + repeat + filler('d', 83)),
      (30L, filler('e', 97))).toDF("doc_id", "text")
    val got = SuffixDedup.duplicatedSpans(docs, "doc_id", "text", window = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the whole 108-char repeat, at its exact offset in each doc —
    // not a 32-char clip (1-based starts: 62 and 32)
    assert(got == Set((10L, 62L, 108L), (20L, 32L, 108L)), got.toString)
  }

  test("spans == brute force on the real corpus, windows 17 and 32") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    val texts = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    for (w <- Seq(17, 32)) {
      val got = SuffixDedup.duplicatedSpans(docs, "doc_id", "text", w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == bruteSpans(texts, w), s"w=$w mismatch")
      assert(got.nonEmpty, s"w=$w: fixture has no duplicated spans")
    }
  }

  test("minCount raises the duplication bar") {
    val docs = Seq(
      (1L, "xxTRIPLExx"), (2L, "yyTRIPLEyy"), (3L, "zzTRIPLEzz"),
      (4L, "aaDOUBLEaa"), (5L, "bbDOUBLEbb")).toDF("doc_id", "text")
    val twoPlus = SuffixDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 6, minCount = 2).collect().map(_.getLong(0)).toSet
    val threePlus = SuffixDedup.duplicatedSpans(docs, "doc_id", "text",
      window = 6, minCount = 3).collect().map(_.getLong(0)).toSet
    assert(twoPlus == Set(1L, 2L, 3L, 4L, 5L))
    assert(threePlus == Set(1L, 2L, 3L))
  }

  /** Brute-force keep-first removal: char c of doc d is removed iff
    * some duplicated w-gram covering c starts at a non-canonical
    * occurrence (canonical = minimum (did, pos)).
    */
  private def bruteRemove(texts: Seq[(Long, String)], w: Int)
      : Map[Long, String] = {
    val grams = texts.flatMap { case (id, t) =>
      (0 to t.length - w).map(i => (id, i + 1, t.substring(i, i + w)))
    }
    val byGram = grams.groupBy(_._3).filter(_._2.size > 1)
    val removedStarts = byGram.values.flatMap { occ =>
      occ.sortBy(o => (o._1, o._2)).tail.map(o => (o._1, o._2))
    }.toSet
    texts.map { case (id, t) =>
      val gone = (1 to t.length).filter(c =>
        (math.max(1, c - w + 1) to c).exists(p =>
          removedStarts.contains((id, p)) && p + w - 1 <= t.length)).toSet
      id -> t.zipWithIndex.collect {
        case (ch, i) if !gone.contains(i + 1) => ch
      }.mkString
    }.toMap
  }

  test("removeDuplicatedSpans: keep-first surgery matches brute force") {
    // 72 chars, NON-periodic — a repeated block would self-duplicate
    // at the window level and correctly lose its own second half
    val repeat = "abcdefghijklmnopqrstuvwxyz0123456789" +
      "zyxwvutsrqponmlkjihgfedcba9876543210"
    def filler(seed: Int, n: Int): String =
      (0 until n).map { i =>
        ((((i + seed * 1000) * 2654435761L >>> 16) % 26) + 'A').toChar
      }.mkString
    val texts = Seq(
      (1L, filler(1, 40) + repeat + filler(2, 30)),
      (2L, filler(3, 25) + repeat + filler(4, 50)),
      (3L, repeat + filler(5, 45) + repeat),
      (4L, filler(6, 80)))
    import spark.implicits._
    val got = SuffixDedup.removeDuplicatedSpans(
        texts.toDF("doc_id", "text"), "doc_id", "text", window = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = bruteRemove(texts, 32)
    assert(got == want)
    // doc 1 holds the canonical copy (smallest doc id, earliest pos):
    // its repeat survives; docs 2 and 3 lose theirs
    assert(got(1L).contains(repeat))
    assert(!got(2L).contains(repeat) && !got(3L).contains(repeat))
    assert(got(4L) == texts(3)._2, "dup-free doc unchanged")
    // and on the real corpus
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    val corpus = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    val gotC = SuffixDedup.removeDuplicatedSpans(docs, "doc_id", "text",
        window = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotC == bruteRemove(corpus, 32))
  }

  test("deterministic under repartitioning") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      SuffixDedup.duplicatedSpans(df, "doc_id", "text", 32)
        .collect().map(_.toString).sorted.toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("contaminationSpans: train-side regions shared with eval, brute-force match") {
    import spark.implicits._
    val w = 16
    val leak = "THE QUICK BROWN FOX JUMPS OVER"
    val train = Seq(
      (1L, s"aaaa $leak bbbb"),               // one contaminated span
      (2L, "totally clean text with no overlap at all here"),
      (3L, s"$leak and later again $leak ok")) // two spans (merged if close)
      .toDF("doc_id", "text")
    val eval = Seq(
      (100L, s"prefix $leak suffix"),
      (101L, "other eval content"))
      .toDF("doc_id", "text")
    val got = SuffixDedup
      .contaminationSpans(train, eval, "doc_id", "text", w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: train position i contaminated iff its w-gram occurs
    // anywhere in eval; merge overlapping windows into spans
    val evalGrams = eval.collect().map(_.getString(1))
      .flatMap(t => t.sliding(w)).toSet
    val expect = train.collect().flatMap { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      val hits = (0 to t.length - w)
        .filter(i => evalGrams.contains(t.substring(i, i + w)))
        .map(_ + 1) // 1-based
      val spans = hits.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, p) =>
          if (acc.nonEmpty && p <= acc.last._1 + acc.last._2)
            acc.init :+ ((acc.last._1,
              math.max(acc.last._2, p + w - acc.last._1)))
          else acc :+ ((p.toLong, w.toLong))
      }
      spans.map { case (st, ln) => (id, st, ln) }
    }.toSet
    assert(got == expect, s"got $got expect $expect")
    assert(got.exists(_._1 == 1L) && got.exists(_._1 == 3L) &&
      !got.exists(_._1 == 2L))
    // eval-side rows are never reported
    assert(!got.exists(_._1 >= 100L))
  }
}
