package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** Graceful shutdown parity with the reference's KeyboardInterrupt
  * handler (cli.py:63-68): SIGINT to a running CLI must stop every
  * flow, report, and exit 0 — not die mid-batch with the JVM's default
  * 130. Runs the real `graft.cli.Main` in its own JVM and kills it.
  */
class CliShutdownSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("SIGINT stops flows gracefully and exits 0") {
    val tmp = java.nio.file.Files.createTempDirectory("cli-sigint")
    val cfgPath = tmp.resolve("flow.yml")
    java.nio.file.Files.writeString(cfgPath,
      s"""size_limit: 4
         |time_limit: 1
         |blocks:
         |  - name: in
         |    type: amqp
         |    kwargs: {}
         |  - name: out
         |    type: parquet
         |    kwargs:
         |      path: '$tmp/out'
         |flows:
         |  - - name: in
         |      kwargs:
         |        exchange: cli_sigint_ex
         |    - name: out
         |      kwargs: {}
         |""".stripMargin)
    val cp = s"target/scala-2.13/classes:/opt/spark/jars/*"
    val cmd = Seq("java", "-cp", cp) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx2g",
      "graft.cli.Main", cfgPath.toString,
      "--checkpoint", s"$tmp/ckpt")
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new java.lang.StringBuilder
    val reader = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = r.readLine()
      while (line != null) {
        out.synchronized { out.append(line).append('\n') }
        line = r.readLine()
      }
    })
    reader.setDaemon(true)
    reader.start()
    try {
      // wait for the flows to come up (child JVM + SparkSession boot)
      val deadline = System.currentTimeMillis() + 120000
      while (!out.synchronized(out.toString).contains("started 1 flow(s)") &&
          System.currentTimeMillis() < deadline && proc.isAlive)
        Thread.sleep(200)
      assert(out.synchronized(out.toString).contains("started 1 flow(s)"),
        s"CLI never came up:\n$out")
      // the real signal, not Process.destroy (which sends SIGTERM)
      Runtime.getRuntime
        .exec(Array("kill", "-INT", proc.pid().toString)).waitFor()
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
        s"CLI did not exit after SIGINT:\n$out")
      assert(proc.exitValue() == 0,
        s"expected clean exit 0, got ${proc.exitValue()}:\n$out")
      assert(out.synchronized(out.toString).contains("stopped 1 flow(s)"),
        s"missing graceful-stop report:\n$out")
    } finally proc.destroyForcibly()
  }
}
