package graft.sinks

import java.sql.DriverManager

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PathExtract

/** Batched SQL sink — the Spark re-expression of the reference's
  * `Database` output block (reference sql.py:41-107):
  *
  *   - user SQL with `:named` parameters, compiled once per flow;
  *   - parameter mapping: positional (list of dotted paths), named
  *     (param -> path), or identity (top-level columns by param name) —
  *     reference sql.py:83-90 mapper selection;
  *   - one JDBC batch (`executeBatch`) per partition — the executemany
  *     upgrade: N partitions flush in parallel instead of the
  *     reference's single locked consumer thread;
  *   - error policy: log & drop the failed batch, pipeline continues
  *     (sql.py:99-105), with the dropped batch written to a dead-letter
  *     parquet dir when configured — observable, not silent.
  *
  * Scale notes: rows never touch the driver; each executor partition
  * opens its own connection (connection count == partitions, so size
  * the write `coalesce` to the database's capacity, not the shuffle
  * width).
  */
object SqlSink extends Logging {

  /** `INSERT ... VALUES (:a, CAST(:b AS X))` -> positional form + param
    * order, compiled once (reference sql.py:58-61). A character scan
    * rather than a bare regex: `:name` inside single-quoted literals is
    * text, `''` is the in-literal quote escape, and `::type` (Postgres
    * cast syntax) is never a parameter.
    */
  def compile(query: String): (String, Seq[String]) = {
    def nameStart(c: Char) =
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || c == '_'
    def namePart(c: Char) = nameStart(c) || (c >= '0' && c <= '9')
    val sb = new StringBuilder(query.length)
    val names = Seq.newBuilder[String]
    val n = query.length
    var i = 0
    var inQuote = false
    while (i < n) {
      val ch = query.charAt(i)
      if (inQuote) {
        sb.append(ch)
        if (ch == '\'') {
          if (i + 1 < n && query.charAt(i + 1) == '\'') { sb.append('\''); i += 1 }
          else inQuote = false
        }
        i += 1
      } else if (ch == '\'') {
        inQuote = true; sb.append(ch); i += 1
      } else if (ch == ':' && i + 1 < n && query.charAt(i + 1) == ':') {
        sb.append("::"); i += 2
      } else if (ch == ':' && i + 1 < n && nameStart(query.charAt(i + 1))) {
        var j = i + 1
        while (j < n && namePart(query.charAt(j))) j += 1
        names += query.substring(i + 1, j)
        sb.append('?')
        i = j
      } else {
        sb.append(ch); i += 1
      }
    }
    (sb.toString, names.result())
  }

  sealed trait Mapping
  /** Identity: bind each named param from the same-named top-level column. */
  case object Identity extends Mapping
  /** Positional list of dotted paths (reference ListParametersMapper). */
  case class Positional(paths: Seq[String]) extends Mapping
  /** Named param -> dotted path (reference DictParametersMapper). */
  case class Named(params: Seq[(String, String)]) extends Mapping

  /** Project a micro-batch to bind-ready columns per the mapping rules
    * (missing path => NULL, residual nesting => JSON string).
    * `jsonCol`: when set, paths resolve inside that raw-JSON string
    * column (the schema-less flow shape); otherwise against the row.
    */
  def mapParameters(df: DataFrame, mapping: Mapping, paramOrder: Seq[String],
      jsonCol: Option[String]): DataFrame = {
    def path(p: String): Column = jsonCol match {
      case Some(j) => PathExtract.fromJson(col(j), p)
      case None    => PathExtract.fromRow(df, p)
    }
    mapping match {
      case Identity         => df.select(paramOrder.map(path): _*).toDF(paramOrder: _*)
      case Positional(ps)   =>
        require(ps.length == paramOrder.length,
          s"query has ${paramOrder.length} parameters, mapping has ${ps.length}")
        df.select(ps.zipWithIndex.map { case (p, i) => path(p).as(s"p$i") }: _*)
      case Named(ps)        =>
        val byName = ps.toMap
        df.select(paramOrder.map { n =>
          byName.get(n).map(path(_).as(n)).getOrElse(lit(null).as(n))
        }: _*)
    }
  }

  /** A foreachBatch callback writing each micro-batch via JDBC.
    * Failed batches are logged, dumped to `deadLetterDir` and dropped —
    * the stream keeps running (reference sql.py:99-105 / R14).
    */
  def foreachBatch(url: String, query: String, mapping: Mapping,
      jsonCol: Option[String] = None,
      deadLetterDir: Option[String] = None): (DataFrame, Long) => Unit = {
    val (positional, paramOrder) = compile(query)
    (batch: DataFrame, batchId: Long) => {
      val params = mapParameters(batch, mapping, paramOrder, jsonCol)
      try {
        writeJdbc(url, positional, params)
      } catch {
        case e: Exception =>
          // two-log shape mirrors the reference's error contract
          logError(s"Batch $batchId failed: ${e.getMessage}")
          logError(s"Dropped batch $batchId (query: $query)")
          deadLetterDir.foreach(d =>
            batch.write.mode("append").parquet(s"$d/batch_$batchId"))
      }
    }
  }

  /** One JDBC batch per partition (the executemany analog). */
  def writeJdbc(url: String, positionalSql: String, params: DataFrame): Unit = {
    val n = params.columns.length
    params.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(positionalSql)
          rows.foreach { r =>
            var i = 0
            while (i < n) {
              st.setObject(i + 1, r.get(i)); i += 1
            }
            st.addBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Marker table for idempotent replay detection. */
  val MarkerTable = "graft_committed"

  /** Creates the marker table if absent. The composite PRIMARY KEY is
    * load-bearing: two task attempts for the same (flow, batch,
    * partition) — speculative execution, zombie task after a stage
    * retry — race their marker INSERTs, and the key forces exactly one
    * to commit; the loser rolls back its rows.
    */
  def ensureMarkerTable(url: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      s"CREATE TABLE $MarkerTable (flow_id VARCHAR(128) NOT NULL, " +
        "batch_id BIGINT NOT NULL, part_id INT NOT NULL, " +
        "PRIMARY KEY (flow_id, batch_id, part_id))")
    catch { case _: java.sql.SQLException => () } // already exists
    finally conn.close()
  }

  /** Idempotent variant: rows + a (flow, batch, partition) marker commit
    * in ONE transaction per partition; a replayed micro-batch (Spark
    * restart re-runs the last uncommitted batch — at-least-once) finds
    * its marker and skips. Checkpoint + replayable source + this sink =
    * effectively exactly-once end-to-end (SURVEY §7.4 upgrade path).
    *
    * Two replay hazards are closed here: (a) concurrent task attempts
    * for one partition — the marker INSERT goes first inside the
    * transaction, so the marker-table PRIMARY KEY makes the second
    * committer fail and roll back; (b) a replayed batch partitioned
    * differently than the pre-crash run (file-source splits and
    * shuffle confs are not restart-stable), under which a surviving
    * marker would silently drop a *different* row subset — so the
    * batch is hash-repartitioned on every bind column into a fixed
    * `sinkPartitions` count, making pid a pure function of row values.
    *
    * Error contract (deliberately different from the R14 sink above):
    * a failed batch RETHROWS, failing the micro-batch so the checkpoint
    * does not advance and the restart replays it — log-and-drop here
    * would be silent at-most-once. Deterministic poison input should be
    * dead-lettered upstream (Flows' corrupt-JSON split), not here.
    */
  def idempotentForeachBatch(url: String, query: String, mapping: Mapping,
      flowId: String, jsonCol: Option[String] = None,
      sinkPartitions: Int = 16): (DataFrame, Long) => Unit = {
    val (positional, paramOrder) = compile(query)
    ensureMarkerTable(url)
    (batch: DataFrame, batchId: Long) => {
      val mapped = mapParameters(batch, mapping, paramOrder, jsonCol)
      val params = mapped.repartition(sinkPartitions, mapped.columns.map(col): _*)
      val n = params.columns.length
      try {
        // Dataset.foreachPartition (not .rdd) so the action carries a SQL
        // execution id — upstream observe() metrics (Flows' one-pass
        // corrupt/content-type counts) are delivered off this same job.
        // The partition id is still the deterministic hash-partition
        // index, read off the task context.
        params.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          if (rows.nonEmpty) {
            val conn = DriverManager.getConnection(url)
            try {
              conn.setAutoCommit(false)
              val seen = conn.prepareStatement(
                s"SELECT COUNT(*) FROM $MarkerTable WHERE flow_id = ? AND batch_id = ? AND part_id = ?")
              seen.setString(1, flowId); seen.setLong(2, batchId); seen.setInt(3, pid)
              val rs = seen.executeQuery(); rs.next()
              val alreadyCommitted = rs.getInt(1) > 0
              if (alreadyCommitted) conn.rollback() // end the SELECT's txn
              if (!alreadyCommitted) {
                val committed =
                  try {
                    // marker first: the PK arbitrates concurrent attempts
                    val mark = conn.prepareStatement(
                      s"INSERT INTO $MarkerTable VALUES (?, ?, ?)")
                    mark.setString(1, flowId); mark.setLong(2, batchId); mark.setInt(3, pid)
                    mark.executeUpdate()
                    true
                  } catch {
                    case _: java.sql.SQLException => conn.rollback(); false
                  }
                if (committed) {
                  try {
                    val st = conn.prepareStatement(positional)
                    rows.foreach { r =>
                      var i = 0
                      while (i < n) { st.setObject(i + 1, r.get(i)); i += 1 }
                      st.addBatch()
                    }
                    st.executeBatch()
                    conn.commit() // rows + marker atomically
                  } catch {
                    // roll back the open txn (marker + partial rows)
                    // before close: Derby throws on closing a connection
                    // with an active txn, which would mask the real error
                    // and leave the marker-row lock held against the
                    // task retry's INSERT
                    case e: Throwable =>
                      try conn.rollback()
                      catch { case _: java.sql.SQLException => () }
                      throw e
                  }
                }
              }
            } finally conn.close()
          }
        }
      } catch {
        // Unlike the best-effort R14 sink above, a failed batch is NOT
        // dropped here: rethrowing fails the micro-batch, the streaming
        // checkpoint does not advance, and the restart replays the batch
        // into the marker table — which is exactly what makes the retry
        // safe. Log-and-drop in this path would silently convert a
        // transient failure (interrupt, executor loss, SQL timeout) into
        // permanent, checkpoint-committed data loss.
        case e: Exception =>
          logError(s"Batch $batchId failed, will be replayed from " +
            s"checkpoint: ${e.getMessage} (query: $query)")
          throw e
      }
    }
  }
}
