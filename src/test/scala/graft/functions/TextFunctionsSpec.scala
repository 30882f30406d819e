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

  test("unicode_norm is registered for SQL users; bad form rejected") {
    val r = spark.sql("SELECT unicode_norm('café', 'NFC') AS w")
      .collect().head.getString(0)
    assert(r == "caf\u00e9")
    intercept[Exception] {
      spark.sql("SELECT unicode_norm('x', 'BOGUS')").collect()
    }
    ()
  }
}
