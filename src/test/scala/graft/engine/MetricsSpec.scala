package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.sources.MemoryBroker

class MetricsSpec extends SparkSpec {
  test("listener accumulates per-flow row counts") {
    Metrics.register(spark)
    Metrics.reset()
    val ex = "metrics_ex"
    (1 to 9).foreach(i => MemoryBroker.publish(ex, s"""{"i":$i}"""))
    val q = spark.readStream.format("graftmq").option("exchange", ex).load()
      .writeStream.queryName("metrics_flow")
      .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("m-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val deadline = System.currentTimeMillis() + 20000
    def rows = Metrics.snapshot.get("metrics_flow").map(_.rows).getOrElse(0L)
    while (rows < 9L && System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(rows == 9L, s"snapshot=${Metrics.snapshot}")
  }
}
