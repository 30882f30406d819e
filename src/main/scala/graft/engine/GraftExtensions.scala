package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions registration: exposes the engine's native
  * vector expressions to the SQL surface (`spark.sql("... cos_sim(a,b)
  * ...")`), so SQL-only users get the same codegen'd kernels as the
  * Column API. Enabled via
  * `spark.sql.extensions=graft.engine.GraftExtensions` (Sessions.local
  * sets it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cos_sim"),
      info("cos_sim", "cos_sim(a, b) - cosine similarity of two FLOAT arrays"),
      (cs: Seq[Expression]) => FloatCosine(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two FLOAT arrays"),
      (cs: Seq[Expression]) => FloatDot(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("vec_l2"),
      info("vec_l2", "vec_l2(a, b) - euclidean distance of two FLOAT arrays"),
      (cs: Seq[Expression]) => FloatL2(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm_sq"),
      info("vec_norm_sq", "vec_norm_sq(a) - squared L2 norm of a FLOAT array"),
      (cs: Seq[Expression]) => FloatNormSq(cs(0))))
    ext.injectFunction((FunctionIdentifier("sign_bits"),
      info("sign_bits",
        "sign_bits(v) - 1-bit sign code of a FLOAT array (bit i = v[i] >= 0, first 64 dims); pair with bit_count(a ^ b) for Hamming"),
      (cs: Seq[Expression]) => SignPack64(cs(0))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(words) - 64-bit SimHash of a STRING array"),
      (cs: Seq[Expression]) => SimHash64(cs(0))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect"),
      info("sorted_intersect",
        "sorted_intersect(a, b) - count of common elements of two SORTED BIGINT arrays (merge scan)"),
      (cs: Seq[Expression]) => SortedLongIntersect(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("agree_frac"),
      info("agree_frac",
        "agree_frac(a, b) - fraction of agreeing positions of two BIGINT arrays (MinHash estimator)"),
      (cs: Seq[Expression]) => LongArrayAgreeFrac(cs(0), cs(1))))
    ext.injectFunction((FunctionIdentifier("unicode_norm"),
      info("unicode_norm",
        "unicode_norm(s, 'NFC') - Unicode normalization (NFC/NFD/NFKC/NFKD)"),
      (cs: Seq[Expression]) => UnicodeNormalize(cs(0), cs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          String.valueOf(v)
        case other => throw new IllegalArgumentException(
          s"unicode_norm form must be a string literal, got $other")
      })))
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
        String.valueOf(v).toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    ext.injectFunction((FunctionIdentifier("hashed_ngram_score"),
      info("hashed_ngram_score",
        "hashed_ngram_score(s, n, m) - hashed char-n-gram linear score (fastText-style inference)"),
      (cs: Seq[Expression]) => HashedNgramScore(cs(0),
        intLit(cs(1), "n"), intLit(cs(2), "m"))))
    ext.injectFunction((FunctionIdentifier("cdc_chunks"),
      info("cdc_chunks",
        "cdc_chunks(s, w, m) - content-defined chunks (cut where rolling w-gram hash60 % m == 0)"),
      (cs: Seq[Expression]) => CdcChunks(cs(0),
        intLit(cs(1), "w"), intLit(cs(2), "m"))))
    // fuse the SQL-idiom aggregate/zip_with dot product into the
    // codegen'd kernel — SQL-only users get the native loop for free
    ext.injectOptimizerRule(_ => graft.plans.VecFusion)
    // SQL DELETE/UPDATE/MERGE on txlog tables, routed into the commit
    // protocol (resolution-batch interception, the DeltaAnalysis
    // pattern — fires before Spark's row-level rewrite would reject
    // the stock ParquetTable)
    ext.injectResolutionRule(_ => graft.plans.TxSqlDml)
    // SQL scans over DV'd / column-mapped txlog tables, served from
    // the certified snapshot plan (the DeltaAnalysis pattern) instead
    // of the old loud refusal
    ext.injectResolutionRule(_ => graft.plans.TxSnapshotScan)
  }
}
