package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VecFusionSpec extends SparkSpec {
  import spark.implicits._

  private val dotSql =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (s, x) -> s + x)"

  // repartition keeps ConvertToLocalRelation from eagerly evaluating
  // the projection — the optimized plan must still CONTAIN expressions
  // for the rewrite asserts to inspect
  private def vecs =
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
        (Array(0.5f, -1f, 2f), Array(1f, 1f, 1f)))
      .toDF("a", "b").repartition(2)

  test("SQL dot product is rewritten to the native kernel") {
    val q = vecs.selectExpr(s"$dotSql as dot")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("FloatDot") || opt.contains("floatdot"),
      s"fusion did not fire:\n$opt")
    assert(!opt.contains("aggregate(zip_with"), s"original survived:\n$opt")
    assert(q.collect().map(_.getDouble(0)).toSeq == Seq(32.0, 1.5))
  }

  test("commuted operands and swapped fold order still fuse") {
    val q = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> y * x), 0D, (s, x) -> x + s) as dot")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("FloatDot") || opt.contains("floatdot"),
      s"fusion did not fire:\n$opt")
    assert(q.collect().map(_.getDouble(0)).toSeq == Seq(32.0, 1.5))
  }

  test("non-dot folds are left alone") {
    // max-fold is not a dot product — must NOT rewrite
    val q = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (s, x) -> greatest(s, x)) as m")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("FloatDot"), s"unsound fusion:\n$opt")
    assert(q.collect().map(_.getDouble(0)).toSeq == Seq(18.0, 2.0))
    // non-zero seed changes the result — must NOT rewrite
    val q2 = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(1 as double), (s, x) -> s + x) as d")
    assert(!q2.queryExecution.optimizedPlan.toString.contains("FloatDot"))
    assert(q2.collect().map(_.getDouble(0)).toSeq == Seq(33.0, 2.5))
  }

  test("float seed (FLOAT-typed fold) is NOT rewritten") {
    // cast(0 as float) types the whole aggregate FLOAT; rewriting that
    // to the double kernel would read garbage (caught in review —
    // reproduced returning 0.0 for every row before the dataType guard)
    val q = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as float), (s, x) -> s + x) as d")
    val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!opt.contains("floatdot"), s"unsound float-typed fusion:\n$opt")
    assert(q.collect().map(_.getFloat(0)).toSeq == Seq(32f, 1.5f))
  }

  test("explicit double-product idiom is NOT rewritten (casts in zip lambda)") {
    // a user asking for double products gets ~1 ulp/element more
    // accuracy than float products — the float kernel must not replace
    // that computation (ADVICE round 5: isVar stripped these casts)
    val df = Seq((Array(0.1f, 0.3f, 0.7f), Array(0.3f, 0.7f, 0.9f)))
      .toDF("a", "b").repartition(2)
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, x) -> s + x) as d")
    val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!opt.contains("floatdot"), s"double-product idiom fused:\n$opt")
    val expected = 0.1f.toDouble * 0.3f.toDouble +
      0.3f.toDouble * 0.7f.toDouble + 0.7f.toDouble * 0.9f.toDouble
    assert(q.collect().head.getDouble(0) == expected,
      "result must be the double-product sum, not the float-product one")
  }

  test("-0.0 seed is NOT rewritten (kernel accumulator starts at +0.0)") {
    // observable on an empty array: the fold returns the seed verbatim,
    // so -0.0 in, -0.0 out — the kernel would return +0.0
    val df = Seq((Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b").repartition(2)
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast('-0.0' as double), (s, x) -> s + x) as d")
    val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!opt.contains("floatdot"), s"-0.0 seed fused:\n$opt")
    val bits = java.lang.Double.doubleToRawLongBits(q.collect().head.getDouble(0))
    assert(bits == java.lang.Double.doubleToRawLongBits(-0.0),
      "empty-array fold must return the -0.0 seed bit-for-bit")
  }

  test("fusion is bit-exact vs the unfused idiom, not just close") {
    // products like 0.1f*0.3f round differently in float vs double;
    // the fused kernel must reproduce the idiom's float products
    // exactly. The unfused baseline evades the attribute guard with
    // transform(a, z -> z) so the SAME session evaluates both forms.
    val df = Seq((Array(0.1f, 0.3f, 0.7f), Array(0.3f, 0.7f, 0.9f)))
      .toDF("a", "b").repartition(2)
    val r = df.selectExpr(
      s"$dotSql as fused",
      "aggregate(zip_with(transform(a, z -> z), b, (x, y) -> x * y), cast(0 as double), (s, x) -> s + x) as unfused")
    val opt = r.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("floatdot"), s"fused column did not fuse:\n$opt")
    val row = r.collect().head
    assert(row.getDouble(0) == row.getDouble(1),
      s"fused=${row.getDouble(0)} unfused=${row.getDouble(1)} — rewrite changed the result")
  }

  test("unequal lengths keep zip_with's null semantics after fusion") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 1f))).toDF("a", "b").repartition(2)
    val q = df.selectExpr(s"$dotSql as dot")
    assert(q.queryExecution.optimizedPlan.toString.toLowerCase.contains("floatdot"))
    assert(q.collect().head.isNullAt(0),
      "null-padding must null-poison the fused result too")
  }

  test("fused SQL equals vec_dot on the embeddings table") {
    val e = graft.engine.Tables(spark,
      "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").as("a"))
    val pairs = e.join(e.select(col("vec_id").as("v2"), col("a").as("b")),
      col("vec_id") < col("v2"))
      .limit(200)
    val got = pairs.selectExpr("vec_id", "v2", s"$dotSql as d1",
        "vec_dot(a, b) as d2")
      .filter("abs(d1 - d2) > 1e-6").count()
    assert(got == 0L)
  }
}
