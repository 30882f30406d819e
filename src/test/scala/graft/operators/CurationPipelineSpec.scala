package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class CurationPipelineSpec extends SparkSpec {
  private lazy val docs = Tables(spark, sf, "documents")

  test("curate survives schema and filters, keeps at most input rows") {
    val out = CurationPipeline.curate(docs, "doc_id", "text").cache()
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    assert(out.columns.contains("pred_lang") && out.columns.contains("n_tokens"))
    // near-dups removed: no surviving pair above the threshold
    val pairs = Dedup.minHashPairs(out, "doc_id", "text", 3, 0.8)
    assert(pairs.count() == 0, "curated corpus still contains near-dups")
  }

  test("quality gate actually drops degenerate docs") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val bad = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "a b"),                        // too short
      org.apache.spark.sql.Row(2L, "the a of to and in is on for the the the")  // stopword soup
    ).asJava, schema)
    val good = docs.select(col("doc_id") + 1000000, col("text"))
      .toDF("doc_id", "text").limit(5)
    val out = CurationPipeline.curate(bad.unionByName(good), "doc_id", "text")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(2L))
  }

  test("partitioned write produces per-language directories") {
    val out = CurationPipeline.curate(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("curated").toString
    CurationPipeline.writePartitioned(out, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("pred_lang=")).map(_.getName)
    assert(parts.nonEmpty, "expected pred_lang=<x> partition dirs")
    // partition pruning: reading one language reads only its partition
    val one = spark.read.parquet(dir).filter(col("pred_lang") === "und")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(pred_lang"), plan)
  }
}
