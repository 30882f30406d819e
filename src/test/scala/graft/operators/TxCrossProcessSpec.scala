package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Cross-process concurrent writers (the round-12 verdict's task 8):
  * the optimistic-commit race was only ever exercised in-JVM; here
  * TWO SEPARATE JVMs ([[TxStressWriter]]) interleave appends, a
  * small-file sweep, and rewriting deletes against ONE txlog dir.
  * Asserted: the history is a gap-free serial order, no committed
  * append is lost, every delete serialized (conflicts retried, never
  * corrupted), and the final content equals the closed-form survivor
  * set.
  */
class TxCrossProcessSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
    "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two JVMs interleave appends/deletes/OPTIMIZE: serializable history, nothing lost") {
    val dir = java.nio.file.Files.createTempDirectory("tx-xproc-")
      .toString
    val n = 10
    val cp = "target/scala-2.13/classes:" +
      "target/scala-2.13/test-classes:/opt/spark/jars/*"
    def launch(id: Int): (Process, java.lang.StringBuilder) = {
      val cmd = Seq("java", "-cp", cp) ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Xmx2g",
        "graft.operators.TxStressWriter", dir, id.toString, n.toString)
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
        .start()
      val out = new java.lang.StringBuilder
      val rd = new Thread(() => {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream))
        var line = r.readLine()
        while (line != null) {
          out.synchronized { out.append(line).append('\n') }
          line = r.readLine()
        }
      })
      rd.setDaemon(true); rd.start()
      (p, out)
    }
    val (p1, o1) = launch(1)
    val (p2, o2) = launch(2)
    // generous: under the full parallel suite (or a concurrent bench)
    // the box is oversubscribed and two extra Spark JVMs start slowly
    assert(p1.waitFor(900, java.util.concurrent.TimeUnit.SECONDS),
      s"writer 1 hung:\n$o1")
    assert(p2.waitFor(900, java.util.concurrent.TimeUnit.SECONDS),
      s"writer 2 hung:\n$o2")
    assert(p1.exitValue() == 0, s"writer 1 failed:\n$o1")
    assert(p2.exitValue() == 0, s"writer 2 failed:\n$o2")
    Seq(o1, o2).zip(Seq(1, 2)).foreach { case (o, id) =>
      val s = o.synchronized(o.toString)
      assert(s.contains(s"STRESS-DONE writer=$id") &&
        s.contains("deleted=true"),
        s"writer $id never serialized its delete:\n$s")
    }
    // serializable history: versions are a gap-free 1..V (CREATE_NEW
    // makes two same-version winners impossible; this asserts it held
    // ACROSS processes)
    val hist = TxTable.historyFull(dir)
    assert(hist.map(_._1) == (1 to hist.size),
      s"history has gaps or duplicates: ${hist.map(_._1)}")
    assert(hist.size >= 2 * n + 2,
      s"expected at least ${2 * n + 2} commits, got ${hist.size}")
    // nothing lost, deletes exact: final content == the closed form
    val spark = TestSession.spark
    val got = TxTable.snapshot(spark, dir)
      .select(col("writer"), col("seq"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val expected = (for {
      w <- Seq(1, 2); seq <- 0 until n if seq % 5 != 0
    } yield (w, seq.toLong)).toSet
    assert(got == expected,
      s"extra=${got -- expected} missing=${expected -- got}")
    ()
  }
}
