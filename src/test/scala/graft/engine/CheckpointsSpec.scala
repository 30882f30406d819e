package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The lineage cut's statistics contract: Spark's checkpoint copies the
  * origin plan's ESTIMATED statistics onto the cut result, and an
  * iterative loop that joins a cut with itself (connected components'
  * pointer doubling) then SQUARES the inherited sizeInBytes every
  * round — by round ~20 the estimate is a BigInt with millions of
  * digits and every AQE broadcast-threshold check multiplies them,
  * pinning the driver for minutes per round (observed at the 5x scale
  * probe). `Checkpoints.cut` clamps the inherited estimate to
  * Long.MaxValue, which this spec pins by simulating the compounding.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("cut clamps inherited stats so self-join rounds cannot compound") {
    val maxB = BigInt(Long.MaxValue)
    var cur = Checkpoints.cut(
      (1L to 200L).toDF("id").select(col("id"), col("id").as("comp")))
    // 12 pointer-doubling-shaped rounds: without the clamp the
    // estimate grows as size^(2^rounds) and this loop stalls planning
    (0 until 12).foreach { _ =>
      val prev = cur
      val joined = cur.join(
          cur.select(col("id").as("pid"), col("comp").as("pcomp")),
          col("comp") === col("pid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("pcomp"), col("comp"))).as("comp"))
      cur = Checkpoints.cut(joined)
      assert(cur.queryExecution.analyzed.stats.sizeInBytes <= maxB,
        "cut result's inherited size estimate must be clamped")
      Checkpoints.release(prev)
    }
    assert(cur.count() == 200)
  }

  test("cut result stays releasable (plan is still a LogicalRDD leaf)") {
    val df = Checkpoints.cut((1L to 10L).toDF("id"))
    assert(df.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "clamping must not change the plan shape release() matches on")
    Checkpoints.release(df) // must not throw
  }
}
