package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

/** Two independent sessionization implementations must agree: the
  * window/lag formulation (q25, oracle-checked against DuckDB) and
  * Spark's native `session_window` (gap-merged event-time sessions).
  */
class SessionWindowEquivalenceSpec extends SparkSpec {
  test("session_window session counts == lag-based sessionization (q25)") {
    val viaLag = CoreQueries.queries("q25_sessionize")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaNative = Tables(spark, sf, "events")
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts_s"))
      .groupBy(session_window(col("ts_s"), "30 minutes"), col("user_id"))
      .count()
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaNative == viaLag)
  }
}
