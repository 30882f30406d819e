package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("unicodeNormalize: NFC composes, NFD decomposes, NFKC folds compat") {
    val composed = "caf\u00e9"
    val decomposed = "café"
    val got = Seq((composed, decomposed, "ﬁle", "①"))
      .toDF("c", "d", "lig", "circ")
      .select(
        TextFunctions.unicodeNormalize(col("d"), "NFC").as("nfc"),
        TextFunctions.unicodeNormalize(col("c"), "NFD").as("nfd"),
        TextFunctions.unicodeNormalize(col("lig"), "NFKC").as("nfkc"),
        TextFunctions.unicodeNormalize(col("circ"), "NFKC").as("nfkc2"))
      .collect().head
    assert(got.getString(0) == composed)   // decomposed -> composed
    assert(got.getString(1) == decomposed) // composed -> decomposed
    assert(got.getString(2) == "file")     // ﬁ ligature folds
    assert(got.getString(3) == "1")        // circled one folds
    // NFC is a no-op on already-normalized ASCII (fast path)
    val ascii = Seq("plain ascii").toDF("s")
      .select(TextFunctions.unicodeNormalize(col("s"), "NFC"))
      .collect().head.getString(0)
    assert(ascii == "plain ascii")
  }

  test("foldAccents strips diacritics from both unicode forms; null safe") {
    val got = Seq(("café", "café", "señor"))
      .toDF("a", "b", "c")
      .select(TextFunctions.foldAccents(col("a")),
        TextFunctions.foldAccents(col("b")),
        TextFunctions.foldAccents(col("c")))
      .collect().head
    assert((got.getString(0), got.getString(1), got.getString(2)) ==
      (("cafe", "cafe", "senor")))
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextFunctions.unicodeNormalize(col("s"), "NFC"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("hashedNgramScore matches the SQL md5/conv replay; short text is 0") {
    val docs = Seq("hello world", "ab", "a", "", "café").toDF("t")
    val kernel = docs.select(
      TextFunctions.hashedNgramScore(col("t"), 2, 2001).as("s"))
      .collect().map(_.getLong(0)).toSeq
    // replay with Spark SQL built-ins over an exploded position list —
    // the same arithmetic the DuckDB oracle runs
    val sql = docs.selectExpr(
      """case when length(t) < 2 then 0L else aggregate(
           transform(sequence(1, length(t) - 1),
             i -> cast(conv(substring(md5(substring(t, i, 2)), 1, 15), 16, 10)
                       as bigint) % 2001 - 1000),
           0L, (acc, x) -> acc + x) end as s""")
      .collect().map(_.getLong(0)).toSeq
    assert(kernel == sql)
    assert(kernel(2) == 0L && kernel(3) == 0L) // < n grams -> 0
    // null-safe
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextFunctions.hashedNgramScore(col("t"), 2, 2001))
      .collect().head
    assert(n.isNullAt(0))
    // the kernel stays inside whole-stage codegen (the q167 lesson:
    // an `aggregate` HOF formulation would be CodegenFallback)
    val plan = spark.range(3).selectExpr("cast(id as string) as t")
      .select(TextFunctions.hashedNgramScore(col("t"), 2, 2001))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project")) // *(n) = inside codegen stage n
  }

  test("cdcChunks: concatenation invariant, boundary realignment on edit") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark woods tonight again"
    val edited = "XX " + base // prefix edit shifts every fixed block
    val got = Seq((base, edited)).toDF("a", "b")
      .select(TextFunctions.cdcChunks(col("a"), 8, 16).as("ca"),
        TextFunctions.cdcChunks(col("b"), 8, 16).as("cb"))
      .collect().head
    val ca = got.getSeq[String](0)
    val cb = got.getSeq[String](1)
    assert(ca.mkString == base && cb.mkString == edited)
    // after the first boundary past the edit, chunks realign: the
    // suffix chunk multisets overlap (the CDC property fixed-size
    // blocking lacks)
    assert(ca.toSet.intersect(cb.toSet).nonEmpty)
    // degenerate inputs: shorter than the window -> one chunk;
    // empty -> zero chunks; null-safe
    val deg = Seq(("ab", "")).toDF("x", "y")
      .select(TextFunctions.cdcChunks(col("x"), 8, 16),
        TextFunctions.cdcChunks(col("y"), 8, 16))
      .collect().head
    assert(deg.getSeq[String](0) == Seq("ab"))
    assert(deg.getSeq[String](1).isEmpty)
    val n = Seq[Option[String]](None).toDF("x")
      .select(TextFunctions.cdcChunks(col("x"), 8, 16)).collect().head
    assert(n.isNullAt(0))
  }

  test("unicode_norm is registered for SQL users; bad form rejected") {
    val r = spark.sql("SELECT unicode_norm('café', 'NFC') AS w")
      .collect().head.getString(0)
    assert(r == "caf\u00e9")
    intercept[Exception] {
      spark.sql("SELECT unicode_norm('x', 'BOGUS')").collect()
    }
    ()
  }

  test("weighted classifier: table-driven scores match the hand fold") {
    val weights = Array.tabulate(64L.toInt)(b => (b * 7L) - 200L)
    val texts = Seq("hello world", "a", "")
    val got = texts.toDF("t")
      .select(TextFunctions.hashedNgramScoreW(col("t"), 2, weights))
      .collect().map(_.getLong(0)).toSeq
    def score(s: String): Long = s.sliding(2).filter(_.length == 2)
      .map { g =>
        val h = ClassifierKernels.hash60(g.getBytes("UTF-8"))
        weights((h % weights.length).toInt)
      }.sum
    assert(got == texts.map(score))
    assert(got(1) == 0L && got(2) == 0L)
  }

  test("hashed_ngram_score and cdc_chunks are registered for SQL users") {
    val s = spark.sql(
      "SELECT hashed_ngram_score('hello world', 2, 2001) AS sc")
      .collect().head.getLong(0)
    val viaApi = Seq("hello world").toDF("t")
      .select(TextFunctions.hashedNgramScore(col("t"), 2, 2001))
      .collect().head.getLong(0)
    assert(s == viaApi)
    val ch = spark.sql(
      "SELECT concat_ws('', cdc_chunks('the quick brown fox jumps " +
        "over the lazy dog', 8, 16)) AS joined")
      .collect().head.getString(0)
    assert(ch == "the quick brown fox jumps over the lazy dog")
    // non-literal size params are rejected at resolution, not silently
    intercept[Exception] {
      spark.sql("SELECT cdc_chunks('x', length('ab'), 16)").collect()
    }
    ()
  }
}
