package graft.queries

import graft.SparkSpec

/** SURVEY §5.3 item 4: Q23 through Structured Streaming must equal the
  * batch form exactly.
  */
class StreamingEquivalenceSpec extends SparkSpec {
  test("q23_stream == q23_hourly on sf0.001") {
    val batch = CoreQueries.queries("q23_hourly")(spark, sf).collect()
    val stream = StreamingQueries.q23Stream(spark, sf).collect()
    assert(stream.length == batch.length)
    assert(stream.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }
}
