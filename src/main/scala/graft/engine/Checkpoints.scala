package graft.engine

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative operators (PageRank, BFS, connected
  * components, k-means): every round must truncate its plan or round i
  * replays rounds 1..i-1.
  *
  * Two paths, selected by the `graft.checkpoint.dir` runtime conf:
  *  - unset (default): `localCheckpoint` — executor-local blocks, the
  *    right call in local mode and the fastest on a cluster, but the
  *    job fails if an executor holding a block is lost mid-iteration;
  *  - set to a directory: reliable `checkpoint()` into it — what a
  *    1000-executor job over hours actually needs (HDFS/object-store
  *    path; survives executor loss, costs a write+read per round).
  *
  * Both are eager, so the caller's "materialize the round here" intent
  * is identical on either path.
  */
object Checkpoints {
  val ConfKey = "graft.checkpoint.dir"

  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir creates a unique subdir per context; only
        // (re)point it when the configured root actually changed
        if (!sc.getCheckpointDir.exists(_.startsWith(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
