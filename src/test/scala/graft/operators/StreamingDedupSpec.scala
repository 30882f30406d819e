package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Streaming exact dedup with watermark-bounded state. */
class StreamingDedupSpec extends SparkSpec {
  test("duplicate keys across micro-batches are dropped within watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(min: Int) = new java.sql.Timestamp(86400000L + min * 60000L)
    val dedup = Dedup.streamingExact(
      input.toDF().toDF("ts", "k"), Seq("k"), "ts", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("sd_test")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(1), "b"))
      q.processAllAvailable()
      input.addData((ts(2), "a"), (ts(3), "b"), (ts(4), "c")) // a,b dups
      q.processAllAvailable()
      val keys = spark.table("sd_test").collect().map(_.getString(1)).sorted
      assert(keys.toSeq == Seq("a", "b", "c"), keys.mkString(","))
    } finally q.stop()
  }

  test("streaming delta dedup: each batch checks the grown index, then joins it") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("mhstream").toString
    val (idxPath, pairsPath) = (s"$dir/index", s"$dir/pairs")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(Dedup.minHashDedupStream("doc_id", "text", n = 3,
        threshold = 0.5, indexPath = idxPath, pairsPath = pairsPath))
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "completely unrelated text about spark engines"))
      q.processAllAvailable()
      // batch 2 contains a dup of batch 1's doc 1 — detected against
      // the index alone, batch 1's text is never re-read
      input.addData((10L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      // batch 3 duplicates a BATCH-2 doc: proves the index grew mid-stream
      input.addData((20L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.read.parquet(pairsPath)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 10L), (1L, 20L), (10L, 20L)),
      pairs.toSeq.toString)
    val idx = spark.read.parquet(idxPath)
    assert(idx.count() == 4 && idx.columns.contains("batch_id"))
  }
}
