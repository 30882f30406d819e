package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class PackingSpec extends SparkSpec {
  test("offset packing conserves tokens, bins are contiguous and bounded") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(TextOps.regexTokens(col("text"))).cast("bigint").as("n_tokens"))
    val packed = Packing.byTokenOffset(docs, "doc_id", "n_tokens", 2048).cache()
    val total = docs.agg(sum("n_tokens")).collect().head.getLong(0)
    val manifest = Packing.binManifest(packed, "n_tokens").orderBy("bin").collect()
    assert(manifest.map(_.getLong(2)).sum == total, "tokens conserved")
    val bins = manifest.map(_.getLong(0)).toSeq
    assert(bins == bins.sorted && bins.distinct == bins)
    // every bin except possibly per-straddle overshoot stays near budget
    val maxDoc = docs.agg(max("n_tokens")).collect().head.getLong(0)
    assert(manifest.dropRight(1).forall(_.getLong(2) <= 2048 + maxDoc))
    // deterministic under repartitioning
    val again = Packing.byTokenOffset(docs.repartition(7), "doc_id",
      "n_tokens", 2048).select("doc_id", "bin")
      .collect().map(_.toString).sorted.toSeq
    assert(again == packed.select("doc_id", "bin")
      .collect().map(_.toString).sorted.toSeq)
  }
}
