package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC log application — the SCD1 (overwrite-in-place) sibling of
  * [[Scd2]]: apply a change log of (key, ts, op I/U/D, attrs) to a
  * snapshot, producing the new snapshot. Per key only the LATEST log
  * entry wins (ordered by (ts, op, attrs) — a total order, so replayed
  * or reordered deliveries converge to the same result); an
  * insert/update upserts the row, a delete removes it, keys absent
  * from the log pass through untouched.
  *
  * Plan shape for 100 TB: the winner per key is ONE map-side-combinable
  * `max(struct(...))` groupBy over the (small) delta; the snapshot's
  * only work is a key join against that delta (broadcast when the delta
  * is small, AQE decides) — the snapshot body is never re-sorted or
  * re-aggregated. This is the merge-on-read compaction step of every
  * lakehouse table format, expressed as a plain DataFrame transform.
  */
object Cdc {

  /** @param snapshot current table: keyCol + attrCols
    * @param log      change log: keyCol, tsCol, opCol ('I'/'U'/'D'),
    *                 attrCols (ignored for 'D')
    * @return the new snapshot (keyCol + attrCols)
    */
  def applyLog(snapshot: DataFrame, log: DataFrame, keyCol: String,
      tsCol: String, opCol: String, attrCols: Seq[String]): DataFrame = {
    val latest = log.groupBy(col(keyCol))
      .agg(max(struct(
        col(tsCol) +: col(opCol) +: attrCols.map(col): _*)).as("_c"))
      .select(col(keyCol) +: col(s"_c.$opCol").as(opCol) +:
        attrCols.map(a => col(s"_c.$a").as(a)): _*)
    val untouched = snapshot
      .join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
      .select(col(keyCol) +: attrCols.map(col): _*)
    val upserts = latest.filter(col(opCol) =!= "D").drop(opCol)
    untouched.unionByName(upserts)
  }

  /** Merkle-style snapshot diff: LOCATE what changed between two
    * versions of a table without comparing rows — each side rolls up
    * to per-bucket (key div bucketSize) XOR digests of the row content
    * hash plus a count, and only buckets whose (digest, count) differ
    * survive the join. Two snapshots of N rows compare via 2·N/bucket
    * digest rows; the changed buckets then bound any row-level
    * re-read to changed ranges only — the "which shards moved"
    * question a 100 TB versioned corpus answers before re-reading
    * anything. Content hash = 60-bit md5 of (key, content), the same
    * determinism contract as the dataset fingerprint, so the oracle
    * re-executes both sides in SQL.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCol: String,
      contentCol: String, bucketSize: Int): DataFrame = {
    def digest(df: DataFrame, n: String, f: String) = df
      .select(expr(s"$keyCol div $bucketSize").as("bucket"),
        Kmv.hash60(concat_ws("|", col(keyCol), col(contentCol))).as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(n), expr("bit_xor(h)").as(f))
    digest(v1, "n1", "fp1")
      .join(digest(v2, "n2", "fp2"), Seq("bucket"), "full_outer")
      .filter(not(col("fp1") <=> col("fp2")) ||
        not(col("n1") <=> col("n2")))
      .select(col("bucket"), coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
  }

  /** Row-level diff restricted to the buckets [[snapshotDiff]] flagged
    * — the read that completes the Merkle story: only changed
    * id-ranges are re-read and row-compared, so at 100 TB the
    * row-level work is O(changed data), not O(corpus). Returns
    * (key, change ∈ added | deleted | edited). Equal by construction
    * to the global row diff: a changed row always changes its
    * bucket's (count, XOR-digest) pair, so no changed row hides in an
    * unflagged bucket (two in-bucket changes cancelling both the
    * 60-bit XOR and the count has probability ~2⁻⁶⁰ per bucket — the
    * digest-width contract snapshotDiff already documents).
    */
  def snapshotRowDiff(v1: DataFrame, v2: DataFrame, keyCol: String,
      contentCol: String, bucketSize: Int): DataFrame = {
    val changed = snapshotDiff(v1, v2, keyCol, contentCol, bucketSize)
      .select(col("bucket"))
    def arm(df: DataFrame, k: String, c: String) = df
      .withColumn("bucket", expr(s"$keyCol div $bucketSize"))
      .join(broadcast(changed), Seq("bucket"))
      .select(col(keyCol).as(k), col(contentCol).as(c))
    arm(v1, "k1", "c1")
      .join(arm(v2, "k2", "c2"), col("k1") === col("k2"), "full_outer")
      .select(coalesce(col("k1"), col("k2")).as(keyCol),
        when(col("k2").isNull, "deleted")
          .when(col("k1").isNull, "added")
          .when(col("c1") =!= col("c2"), "edited").as("change"))
      .filter(col("change").isNotNull)
  }
}
