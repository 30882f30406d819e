package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Incremental materialized-view maintenance: a parquet-backed
  * (key → count, sum) aggregate kept up to date from a micro-batch
  * stream. Each batch contributes its map-side-combined partial
  * aggregate; the store merge costs O(|distinct keys|) per batch — the
  * history is never re-read, which is the whole point of maintaining a
  * view incrementally instead of re-running the groupBy over 100 TB.
  *
  * Replay safety is by VERSIONED state, not mutation: the state after
  * merging batches <= b lives at `state_b=<b>`; batch b always merges
  * FROM the newest version strictly below b and OVERWRITES `state_b=<b>`.
  * A batch replayed after a crash (checkpoint not yet committed)
  * rebuilds exactly the same version from exactly the same inputs —
  * idempotent by construction, no marker transactions needed. Old
  * versions beyond the previous one are pruned after a successful merge.
  */
object IncrementalAgg {
  private val Ver = "state_b=(\\d+)".r

  private def versions(storeDir: String): Seq[Long] = {
    val p = Paths.get(storeDir)
    if (!Files.isDirectory(p)) Nil
    else Files.list(p).iterator().asScala
      .flatMap(f => f.getFileName.toString match {
        case Ver(b) => Some(b.toLong)
        case _ => None
      }).toSeq.sorted
  }

  /** The current view: newest committed version, or an empty aggregate
    * if no batch has merged yet.
    */
  def read(spark: SparkSession, storeDir: String,
      keyCols: Seq[String]): DataFrame =
    versions(storeDir).lastOption match {
      case Some(v) => spark.read.parquet(s"$storeDir/state_b=$v")
      case None =>
        spark.emptyDataFrame // schema-less; callers merge via unionByName
    }

  /** Time travel: the view as of batch `asOfBatch` — the newest
    * retained version at or below it. Retention is bounded by pruning
    * (only the merge base survives), so this serves the
    * reprocess-last-batch debugging case, not arbitrary history.
    */
  def readAt(spark: SparkSession, storeDir: String,
      asOfBatch: Long): Option[DataFrame] =
    versions(storeDir).filter(_ <= asOfBatch).lastOption
      .map(v => spark.read.parquet(s"$storeDir/state_b=$v"))

  /** Newest version strictly below this batch: versions >= batchId can
    * only be orphans of a failed attempt at THIS batch — ignore them.
    */
  private def baseBelow(storeDir: String, batchId: Long): Option[Long] =
    versions(storeDir).filter(_ < batchId).lastOption

  /** Prune everything below the merge base (keep the base as the
    * rollback target for a replay of the batch that just merged).
    */
  private def pruneBelow(storeDir: String, base: Option[Long]): Unit =
    versions(storeDir).filter(v => base.exists(v < _)).foreach { v =>
      val dir = Paths.get(s"$storeDir/state_b=$v")
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }

  /** foreachBatch body maintaining an SCD1 SNAPSHOT from a CDC change
    * stream (the Debezium-style lakehouse merge loop): each micro-batch
    * of (key, ts, op I/U/D, attrs) rows merges into the versioned
    * snapshot via [[graft.operators.Cdc.applyLog]] — latest entry per
    * key wins within the batch, upserts overwrite, deletes remove,
    * untouched keys carry over. Same versioned-state replay safety as
    * [[mergeCountSum]]: a replayed batch rebuilds the same version from
    * the same base. Cost per batch = one delta-sized groupBy + one key
    * join against the snapshot; the snapshot body is never re-sorted.
    */
  def mergeCdc(storeDir: String, keyCol: String, tsCol: String,
      opCol: String, attrCols: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val base = baseBelow(storeDir, batchId)
    val snapshot = base match {
      case Some(v) => spark.read.parquet(s"$storeDir/state_b=$v")
      case None =>
        // empty snapshot with the output schema (key + attrs)
        batch.select(col(keyCol) +: attrCols.map(col): _*).limit(0)
    }
    val merged = graft.operators.Cdc.applyLog(
      snapshot, batch, keyCol, tsCol, opCol, attrCols)
    merged.write.mode("overwrite").parquet(s"$storeDir/state_b=$batchId")
    pruneBelow(storeDir, base)
  }

  /** Latest row per key by the lexicographic (ordCols, attrCols) max —
    * one map-side-combinable struct-max aggregate, never a window sort.
    */
  private def latestPerKey(df: DataFrame, keyCol: String,
      ordCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val packed = (ordCols ++ attrCols).map(col)
    df.groupBy(col(keyCol))
      .agg(max(struct(packed: _*)).as("_m"))
      .select(col(keyCol) +:
        (ordCols ++ attrCols).map(c => col(s"_m.$c").as(c)): _*)
  }

  /** foreachBatch body maintaining a LATEST-ROW-PER-KEY view from a
    * plain APPEND stream — no CDC op column: every arrival is an upsert
    * candidate and "latest" = the max of `ordCols` (lexicographic,
    * e.g. (sec, event_id)). The SCD1 sibling of [[mergeCdc]] for
    * sources that only ever emit new facts. Cost per batch = one
    * delta-sized struct-max groupBy + one key-merge against the
    * snapshot; the max-merge is idempotent and associative, so the
    * versioned-state replay contract holds with no marker writes.
    */
  def mergeLatest(storeDir: String, keyCol: String, ordCols: Seq[String],
      attrCols: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val partial = latestPerKey(
      batch.select(col(keyCol) +: (ordCols ++ attrCols).map(col): _*),
      keyCol, ordCols, attrCols)
    val base = baseBelow(storeDir, batchId)
    val merged = base match {
      case None => partial
      case Some(v) => latestPerKey(
        spark.read.parquet(s"$storeDir/state_b=$v").unionByName(partial),
        keyCol, ordCols, attrCols)
    }
    merged.write.mode("overwrite").parquet(s"$storeDir/state_b=$batchId")
    pruneBelow(storeDir, base)
  }

  /** foreachBatch body maintaining a RETRACTION-AWARE group aggregate
    * from a keyed CDC stream — the full incremental-view-maintenance
    * shape [[mergeCountSum]] (insert-only) cannot express: each batch
    * of (key, ts, op U/D, group, value) rows first RETRACTS the stored
    * contribution of every touched key from its group's (cnt, total),
    * then applies the new value (or nothing, for a delete). Two
    * co-versioned tables live under the store: `keys/` (per-key
    * snapshot: key, ts, group, value — the retraction source) and
    * `agg/` (group → cnt, total — the served view).
    *
    * Out-of-order batches are safe: a delta row older than the key's
    * stored ts is dropped (never applied, never retracts), so the
    * final state is a pure function of the log's per-key latest entry
    * regardless of arrival order — entries must carry unique (key, ts)
    * for this to be well-defined (compose ts as day·10⁹+seq if needed).
    * Deletes leave a TOMBSTONE row (alive=false) in `keys/` rather
    * than dropping the key: without it, an older update arriving after
    * the delete would see no stored ts and resurrect the key (found by
    * the cross-engine oracle on the first run). Production would
    * compact tombstones past the source's max reordering horizon.
    * Replay safety is the same versioned-state contract as the other
    * mergers: both tables read only the base version and overwrite
    * their own `state_b=<batch>`.
    *
    * Cost per batch: one delta-sized struct-max groupBy, one key join
    * delta↔snapshot, delta-sized retract/insert aggregates, and a
    * |groups|-row agg merge. The snapshot rewrite is O(|keys|) here
    * (one parquet dir per version); at 100 TB the snapshot would be
    * bucketed by key and only touched buckets rewritten — the merge
    * arithmetic is unchanged.
    */
  def mergeRetract(storeDir: String, keyCol: String, tsCol: String,
      opCol: String, groupCol: String, valueCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val keysDir = s"$storeDir/keys"; val aggDir = s"$storeDir/agg"
    val base = baseBelow(keysDir, batchId)
    val snapshot = base match {
      case Some(v) => spark.read.parquet(s"$keysDir/state_b=$v")
      case None => batch
        .select(col(keyCol), col(tsCol), col(groupCol), col(valueCol),
          lit(true).as("alive"))
        .limit(0)
    }
    val aggBase = base match {
      case Some(v) => spark.read.parquet(s"$aggDir/state_b=$v")
      case None => batch.groupBy(col(groupCol))
        .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("total"))
        .limit(0)
    }
    // batch-local winner per key, then the stale-guard: only deltas at
    // or beyond the stored ts apply ('U' > 'D' breaks an exact-ts tie
    // toward keeping the row, q251's CDC convention)
    val winner = latestPerKey(
      batch.select(col(keyCol) +:
        Seq(tsCol, opCol, groupCol, valueCol).map(col): _*),
      keyCol, Seq(tsCol, opCol), Seq(groupCol, valueCol))
    val delta = winner
      .join(snapshot.select(col(keyCol), col(tsCol).as("_sts")),
        Seq(keyCol), "left")
      .filter(col("_sts").isNull || col(tsCol) >= col("_sts"))
      .drop("_sts")
      .cache()
    val touched = snapshot.filter(col("alive"))
      .join(delta.select(col(keyCol)), Seq(keyCol), "left_semi")
    val retract = touched.groupBy(col(groupCol))
      .agg((-count(lit(1))).as("cnt"), (-sum(col(valueCol))).as("total"))
    val insert = delta.filter(col(opCol) =!= "D")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("total"))
    val newAgg = aggBase.unionByName(retract).unionByName(insert)
      .groupBy(col(groupCol))
      .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"))
      .filter(col("cnt") =!= 0)
    val newSnap = snapshot
      .join(delta.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(delta.select(col(keyCol), col(tsCol), col(groupCol),
        col(valueCol), (col(opCol) =!= "D").as("alive")))
    newSnap.write.mode("overwrite").parquet(s"$keysDir/state_b=$batchId")
    newAgg.write.mode("overwrite").parquet(s"$aggDir/state_b=$batchId")
    delta.unpersist()
    pruneBelow(keysDir, base)
    pruneBelow(aggDir, base)
  }

  /** foreachBatch body maintaining the (keyCols → cnt, total) view. */
  def mergeCountSum(storeDir: String, keyCols: Seq[String],
      valueCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("total"))
    val base = baseBelow(storeDir, batchId)
    val merged = base match {
      case None => partial
      case Some(v) =>
        spark.read.parquet(s"$storeDir/state_b=$v")
          .unionByName(partial)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"), sum(col("total")).as("total"))
    }
    merged.write.mode("overwrite").parquet(s"$storeDir/state_b=$batchId")
    pruneBelow(storeDir, base)
  }
}
