package graft.cli

import graft.engine.{Config, Flows, Sessions}

/** CLI entry point mirroring the reference's `rabbithole config.yml`
  * (reference cli.py:35-70, 190-244): positional YAML config,
  * `--log-level`, optional checkpoint root; launches every flow and
  * parks in awaitAnyTermination (the reference's sleep-until-Ctrl-C
  * loop, cli.py:63-68).
  */
object Main {
  private case class Args(config: String = "", logLevel: String = "WARN",
      checkpoint: String = "")

  private def parse(argv: Array[String]): Args = {
    def loop(rest: List[String], acc: Args): Args = rest match {
      case "--log-level" :: v :: t => loop(t, acc.copy(logLevel = v.toUpperCase))
      case "--checkpoint" :: v :: t => loop(t, acc.copy(checkpoint = v))
      case c :: t if !c.startsWith("--") => loop(t, acc.copy(config = c))
      case Nil => acc
      case other :: _ =>
        System.err.println(s"unknown argument: $other"); sys.exit(2)
    }
    val a = loop(argv.toList, Args())
    if (a.config.isEmpty) { System.err.println("usage: graft <config.yml> [--log-level L] [--checkpoint DIR]"); sys.exit(2) }
    a
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    // config errors exit non-zero before any Spark work (cli.py:97-106)
    val cfg = try Config.load(args.config) catch {
      case e: Exception =>
        System.err.println(s"config error: ${e.getMessage}"); sys.exit(1)
    }
    val spark = Sessions.local("graft",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel(args.logLevel)
    val checkpoint = if (args.checkpoint.nonEmpty) args.checkpoint
      else java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val queries = Flows.start(spark, cfg, checkpoint)
    System.err.println(s"started ${queries.size} flow(s); Ctrl-C to stop")
    spark.streams.awaitAnyTermination()
  }
}
