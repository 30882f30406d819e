package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("tableProfile: exact counts/min/max per column, long format") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, String)](
      (1.5, "b"), (2.25, "a"), (null, "b"), (2.25, null)
    ).toDF("x", "s")
    val rows = Profile.tableProfile(df, numCols = Seq("x"),
        strCols = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = rows("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 3 && x.getLong(3) == 2)
    assert(x.getDouble(4) == 1.5 && x.getDouble(5) == 2.25)
    assert(x.isNullAt(6) && x.isNullAt(7))
    val s = rows("s")
    assert(s.getLong(1) == 4 && s.getLong(2) == 3 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "b")
  }

  test("tableProfile plans one single-column aggregate per column — no Expand") {
    val li = graft.engine.Tables(spark, sf, "lineitem")
    val prof = Profile.tableProfile(li,
      numCols = Seq("l_quantity", "l_extendedprice"),
      strCols = Seq("l_returnflag"))
    prof.collect()
    // a multi-count_distinct single agg would plan an Expand that
    // multiplies every input row by the number of distinct aggs
    assert(!prof.queryExecution.executedPlan.toString.contains("Expand"))
  }
}
