package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

/** The co-located-join contract: two tables bucketed on the same key
  * join WITHOUT any shuffle exchange — the physical plan must contain
  * no Exchange above the scans.
  */
class BucketedTablesSpec extends SparkSpec {
  test("bucketed self-join plans with zero shuffle exchanges") {
    Seq("docs_bkt_a", "docs_bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val docs = Tables(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    BucketedTables.write(docs, "docs_bkt_a", "doc_id", 8)
    BucketedTables.write(docs, "docs_bkt_b", "doc_id", 8)
    // disable auto-broadcast: at real scale neither side broadcasts —
    // the point of bucketing is the shuffle-free SMJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("docs_bkt_a").as("a")
        .join(spark.table("docs_bkt_b").as("b"), "doc_id")
        .groupBy(col("a.lang")).agg(count(lit(1)).as("c"))
      joined.collect() // force AQE final plan
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must be exchange-free; only the final tiny
      // groupBy(lang) may shuffle
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(doc_id"),
        s"join key exchange found — bucketing not used:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
