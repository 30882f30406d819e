package graft

import org.apache.spark.sql.functions._

/** Ad-hoc measurement harness for the optimization rounds: times the
  * labelled sub-stages of a hot query so a change targets the stage
  * that actually costs (guide §1 "measure first"). Not part of any
  * query path; never invoked by the driver.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local("graft-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val which = args.headOption.getOrElse("q277")
    def time(tag: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.setJobDescription(null)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    which match {
      case "q277" =>
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        // fixture: reuse the query's own cached dir by running it once
        noop(SparkEntry.queries("q277_binary_ingest")(spark, sfDir))
        // the NEWEST pngdir is the one this JVM's query just created
        val d = java.nio.file.Files.list(java.nio.file.Paths.get("/tmp"))
          .filter(p => p.getFileName.toString.startsWith("graft-pngdir-"))
          .sorted(java.util.Comparator.comparingLong((p: java.nio.file.Path) =>
            java.nio.file.Files.getLastModifiedTime(p).toMillis).reversed())
          .findFirst().get().toString
        println(s"PROBE dir $d")
        def scan = spark.read.format("binaryFile").load(s"$d/*.png")
        def scan2 = spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.png").load(d)
        time("count glob")(scan.selectExpr("count(*)").collect())
        time("count dir+filter")(scan2.selectExpr("count(*)").collect())
        time("count dir+filter 2")(scan2.selectExpr("count(*)").collect())
        time("count only")(scan.selectExpr("count(*)").collect())
        time("bytes noop")(noop(scan.select(col("content"))))
        time("bytes noop 2")(noop(scan.select(col("content"))))
        time("decode noop")(noop(graft.multimodal.Multimodal.decode(
          scan.select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
            .cast("bigint").as("media_id"),
            lit("image").as("media_type"), col("content")))))
        val decoded = graft.multimodal.Multimodal.decode(
          scan.select(regexp_extract(col("path"), "(\\d+)\\.png$", 1)
            .cast("bigint").as("media_id"),
            lit("image").as("media_type"), col("content")))
          .filter(col("ok"))
          .select(col("media_id"), col("width").cast("bigint").as("width"),
            col("height").cast("bigint").as("height"))
        time("no orderBy")(noop(decoded))
        time("with orderBy")(noop(decoded.orderBy("media_id")))
        time("with orderBy 2")(noop(decoded.orderBy("media_id")))
        time("full query")(noop(
          SparkEntry.queries("q277_binary_ingest")(spark, sfDir)))
      case "q125" =>
        // decompose PageRank: edge build vs ew pin vs per-round cost
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def edges = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
          pairs.select(col("c").as("src"), col("su").as("dst"))
            .unionAll(pairs.select(col("su").as("src"), col("c").as("dst")))
        }
        // warm
        noop(edges)
        time("edge build noop")(noop(edges))
        for (iters <- Seq(1, 2, 5)) {
          time(s"pagerank $iters iters")(
            noop(graft.operators.PageRank.run(edges, iters)))
          spark.catalog.clearCache()
        }
        time("kcore 4 rounds")(noop(graft.operators.KCore.peel(
          edges.select(col("src"), col("dst")), k = 3, rounds = 4)))
      case "sym" =>
        // A/B: union-form vs explode-form symmetrize feeding Lpa.run
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def pairs = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
        }
        def unionForm = pairs.select(col("c").as("src"), col("su").as("dst"))
          .unionAll(pairs.select(col("su").as("src"), col("c").as("dst")))
        def explodeForm = pairs.select(explode(array(
            struct(col("c").as("src"), col("su").as("dst")),
            struct(col("su").as("src"), col("c").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        noop(unionForm); noop(explodeForm) // warm
        for (rep <- 1 to 3) {
          time(s"edges union $rep")(noop(unionForm))
          time(s"edges explode $rep")(noop(explodeForm))
        }
        for (rep <- 1 to 3) {
          time(s"lpa union $rep")(
            noop(graft.operators.Lpa.run(unionForm, 5)))
          spark.catalog.clearCache()
          time(s"lpa explode $rep")(
            noop(graft.operators.Lpa.run(explodeForm, 5)))
          spark.catalog.clearCache()
        }
      case "pr" =>
        // A/B: aggregate+join outdeg attachment (old) vs count-over-
        // window on the pinned shuffle (new), same 5-iteration loop
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def edges = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
          pairs.select(explode(array(
              struct(col("c").as("src"), col("su").as("dst")),
              struct(col("su").as("src"), col("c").as("dst")))).as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"))
        }
        def runOld(iterations: Int): org.apache.spark.sql.DataFrame = {
          val e = edges.select(col("src").cast("long").as("e_src"),
            col("dst").cast("long").as("e_dst"))
          val outdeg = e.groupBy(col("e_src")).agg(count(lit(1)).as("d"))
            .select(col("e_src").as("o_src"), col("d"))
          val ew = e.join(outdeg, col("e_src") === col("o_src"))
            .select(col("e_src"), col("e_dst"), col("d"))
            .repartition(col("e_src"))
            .persist()
          var ranks = outdeg.select(col("o_src").as("node"),
            lit(graft.operators.PageRank.Scale).as("r"))
          var lastCut: org.apache.spark.sql.DataFrame = null
          for (_ <- 1 to iterations) {
            val contribs = ranks
              .join(ew, col("node") === col("e_src"))
              .select(col("e_dst").as("node2"), expr("r div d").as("c"))
            val plan = contribs.groupBy(col("node2"))
              .agg(sum(col("c")).as("s"))
              .select(col("node2").as("node"),
                (lit(15L * graft.operators.PageRank.Scale / 100) +
                  expr("(85 * s) div 100")).as("r"))
            val next = graft.engine.Checkpoints.cut(plan)
            if (lastCut != null) graft.engine.Checkpoints.release(lastCut)
            lastCut = next
            ranks = next
          }
          ew.unpersist()
          ranks
        }
        noop(graft.operators.PageRank.run(edges, 5)); spark.catalog.clearCache()
        noop(runOld(5)); spark.catalog.clearCache() // warm both
        for (rep <- 1 to 3) {
          time(s"pr old $rep")(noop(runOld(5)))
          spark.catalog.clearCache()
          time(s"pr new $rep")(noop(graft.operators.PageRank.run(edges, 5)))
          spark.catalog.clearCache()
        }
      case "lpa" =>
        // A/B: committed Lpa.run (observe early-exit) vs the pre-r15
        // fixed-round loop, same edges, alternating in one JVM
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def edges = {
          val o = t0("orders").select(col("o_orderkey"), col("o_custkey"))
          val l = t0("lineitem").select(col("l_orderkey"), col("l_suppkey"))
          val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("c"),
              (col("l_suppkey") + lit(1000000000L)).as("su"))
            .distinct()
          pairs.select(explode(array(
              struct(col("c").as("src"), col("su").as("dst")),
              struct(col("su").as("src"), col("c").as("dst")))).as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"))
        }
        def lpaOld(iterations: Int): org.apache.spark.sql.DataFrame = {
          val e = edges.select(col("src").cast("long").as("e_src"),
            col("dst").cast("long").as("e_dst"))
            .repartition(col("e_src")).persist()
          var labels = e.select(col("e_src").as("node")).distinct()
            .select(col("node"), col("node").as("lbl"))
          var lastCut: org.apache.spark.sql.DataFrame = null
          for (_ <- 1 to iterations) {
            val votes = labels
              .join(e, col("node") === col("e_src"))
              .groupBy(col("e_dst"), col("lbl"))
              .agg(count(lit(1)).as("cnt"))
            val plan = votes
              .groupBy(col("e_dst"))
              .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l")))
                .as("w"))
              .select(col("e_dst").as("node"), col("w.l").as("lbl"))
            val next = graft.engine.Checkpoints.cut(plan)
            if (lastCut != null) graft.engine.Checkpoints.release(lastCut)
            lastCut = next
            labels = next
          }
          e.unpersist()
          labels.select(col("node"), col("lbl").as("community"))
        }
        noop(lpaOld(5)); spark.catalog.clearCache()
        noop(graft.operators.Lpa.run(edges, 5)); spark.catalog.clearCache()
        for (rep <- 1 to 3) {
          time(s"lpa old $rep")(noop(lpaOld(5)))
          spark.catalog.clearCache()
          time(s"lpa new $rep")(noop(graft.operators.Lpa.run(edges, 5)))
          spark.catalog.clearCache()
        }
      case "bfs" =>
        // A/B: Relax.rounds (join-refresh + observe exit) vs the old
        // inlined union+groupBy, q140's shape, alternating in one JVM
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        def t0(n: String) = graft.engine.Tables(spark, sfDir, n)
        def build() = {
          val li = t0("lineitem").select(col("l_orderkey"), col("l_partkey"))
          val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
          val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
          val e0 = a.join(b, Seq("k")).filter(col("u") =!= col("v"))
            .select(col("u"), col("v")).distinct()
            .repartition(col("u")).persist()
          val dist0 = e0.select(col("u")).distinct()
            .select(col("u").as("node"),
              when(col("u") === 1L, 0L).otherwise(lit(Long.MaxValue))
                .as("dd"))
          (e0, dist0)
        }
        def bfsOld(): Unit = {
          val (e0, d0) = build()
          var dist = d0
          for (_ <- 1 to 4) {
            val relaxed = dist.join(e0, col("node") === col("u"))
              .filter(col("dd") =!= Long.MaxValue)
              .select(col("v").as("node"), (col("dd") + 1L).as("dd"))
            val next = graft.engine.Checkpoints.cut(dist.unionByName(relaxed)
              .groupBy(col("node")).agg(min(col("dd")).as("dd")))
            graft.engine.Checkpoints.release(dist)
            dist = next
          }
          e0.unpersist()
          noop(dist.filter(col("dd") =!= Long.MaxValue)
            .groupBy(col("dd")).agg(count(lit(1)).as("n_nodes"))
            .orderBy("dd"))
        }
        def bfsNew(): Unit = {
          val (e0, d0) = build()
          val dist = graft.operators.Relax.rounds(e0, d0, 4, weighted = false)
          e0.unpersist()
          noop(dist.filter(col("dd") =!= Long.MaxValue)
            .groupBy(col("dd")).agg(count(lit(1)).as("n_nodes"))
            .orderBy("dd"))
        }
        bfsOld(); spark.catalog.clearCache()
        bfsNew(); spark.catalog.clearCache()
        for (rep <- 1 to 3) {
          time(s"bfs old $rep")(bfsOld())
          spark.catalog.clearCache()
          time(s"bfs new $rep")(bfsNew())
          spark.catalog.clearCache()
        }
      case other =>
        // generic: run the named query once, cold, with one timing
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
          "/root/testdata/sf0.1")
        time(other)(noop(SparkEntry.queries(other)(spark, sfDir)))
    }
    spark.stop()
  }
}
