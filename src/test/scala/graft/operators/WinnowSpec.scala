package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** The engine's k-gram hashes (same xxhash64), for brute-forcing
    * the selection logic in plain Scala.
    */
  private def gramHashes(text: String, k: Int): Seq[(Int, Long)] =
    (1 to text.length - k + 1).map { p =>
      p -> Seq(text.substring(p - 1, p - 1 + k)).toDF("g")
        .select(xxhash64(col("g"))).head().getLong(0)
    }

  /** Reference winnowing: every full window of w consecutive k-gram
    * hashes selects its minimum, rightmost on ties; positions dedupe.
    */
  private def bruteWinnow(hs: Seq[(Int, Long)], w: Int): Set[(Int, Long)] =
    hs.sliding(w).filter(_.size == w).map { win =>
      win.minBy { case (p, h) => (h, -p) }
    }.toSet

  test("selection == reference winnowing, density within the bound") {
    val text = ("the quick brown fox jumps over the lazy dog and then " +
      "the quick brown fox naps by the quiet river bank until dusk")
    val k = 4
    val t = 12
    val w = t - k + 1
    val got = Winnow.fingerprints(Seq((7L, text)).toDF("doc_id", "text"),
        "doc_id", "text", k, t)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val want = bruteWinnow(gramHashes(text, k), w)
    assert(got == want)
    // density: winnowing selects ~2/(w+1) of positions, never more
    // than one per window step; sanity-bound it loosely
    val nGrams = text.length - k + 1
    assert(got.size <= nGrams - w + 1 && got.nonEmpty)
  }

  /** Code-point-aware gram hashes (the engine's `substr`/`length` unit
    * — NOT UTF-16), for pinning the deque kernel on multibyte text.
    */
  private def gramHashesCp(text: String, k: Int): Seq[(Int, Long)] = {
    val n = text.codePointCount(0, text.length)
    (1 to n - k + 1).map { p =>
      val s = text.offsetByCodePoints(0, p - 1)
      val e = text.offsetByCodePoints(0, p - 1 + k)
      p -> Seq(text.substring(s, e)).toDF("g")
        .select(xxhash64(col("g"))).head().getLong(0)
    }
  }

  test("kernel edge cases: multibyte, ties, boundary lengths") {
    val k = 4
    val t = 9
    val w = t - k + 1 // 6
    // multibyte: 2-byte, 3-byte and astral (4-byte) code points — the
    // deque kernel walks UTF-8 bytes; positions must stay code-point
    val multi = "héllo wörld 日本語😀 café " +
      "pâté naïve résumé touché!"
    // all-equal hashes: rightmost tie-break dominates every window
    val ties = "aaaaaaaaaaaaaaaaaaaaaaaa"
    // exactly one full window, and one char short of it
    val nOne = k + w - 1
    val one = "abcdefghijklmnopqrstuvwxyz".take(nOne)
    val short = one.dropRight(1)
    for (text <- Seq(multi, ties, one)) {
      val got = Winnow.fingerprints(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", k, t)
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
      val want = bruteWinnow(gramHashesCp(text, k), w)
      assert(got == want, s"text=$text")
      assert(got.nonEmpty)
    }
    assert(Winnow.fingerprints(
        Seq((1L, short)).toDF("doc_id", "text"), "doc_id", "text", k, t)
      .count() == 0, "no full window => no selection")
  }

  test("guarantee: any shared run >= t yields a shared fingerprint") {
    def filler(seed: Int, n: Int): String =
      (0 until n).map { i =>
        ((((i + seed * 1000) * 2654435761L >>> 16) % 26) + 'A').toChar
      }.mkString
    val shared = "abcdefghijklmnopqrstuvwxyz012345" // exactly t=32
    val a = Seq((2L, filler(1, 57) + shared + filler(2, 41))).toDF("doc_id", "text")
    val b = Seq((3L, filler(3, 23) + shared + filler(4, 66))).toDF("doc_id", "text")
    val idx = Winnow.fingerprints(a, "doc_id", "text", k = 8, t = 32)
    val m = Winnow.matchesAgainst(idx, b, "doc_id", "text", k = 8, t = 32)
      .collect()
    assert(m.length == 1 && m.head.getLong(0) == 2L &&
      m.head.getLong(1) == 3L && m.head.getLong(2) >= 1L,
      s"a 32-char shared run must share a fingerprint: ${m.toSeq}")
    // unrelated docs share nothing
    val c = Seq((4L, filler(5, 120))).toDF("doc_id", "text")
    assert(Winnow.matchesAgainst(idx, c, "doc_id", "text", 8, 32)
      .count() == 0)
  }

  test("fingerprints are deterministic and partitioning-invariant") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Winnow.fingerprints(df, "doc_id", "text")
        .collect().map(_.toString).sorted.toSeq
    val one = run(docs)
    assert(one == run(docs.repartition(13)))
    assert(one.nonEmpty)
  }

  test("incremental contract: index side never re-reads text") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("winnow-idx-").toString
    Winnow.fingerprints(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text").write.mode("overwrite").parquet(dir)
    // detection runs against the STORED rows only
    val idx = spark.read.parquet(dir)
    val m = Winnow.matchesAgainst(idx,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    assert(m.columns.toSeq ==
      Seq("a", "b", "n_shared", "diag_runs"))
    m.collect().foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1)
    }
  }
}
