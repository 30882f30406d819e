package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.operators.TxTable
import graft.sources.SnapshotTxLogTable

/** SQL scans over txlog tables the raw parquet path cannot serve —
  * in-force deletion vectors (the anti-join must apply) or active
  * column mapping (files carry PHYSICAL names) — used to fail loudly
  * with a pointer to [[TxTable.snapshot]]. That refusal was sound but
  * left the SQL surface permanently dark on exactly the tables the
  * features target (a GDPR-erasure table is DV'd in steady state; one
  * RENAME COLUMN and every SQL reader broke until a rewrite).
  *
  * This resolution rule closes the gap the way DeltaAnalysis serves
  * Delta's own specialized scans: the catalog resolves such a table to
  * a [[SnapshotTxLogTable]] stub (logical-name schema, still writable
  * and DML-able), and this rule replaces its `DataSourceV2Relation`
  * with the ALREADY-CERTIFIED snapshot plan — parquet scan of the live
  * files, DV anti-join, logical-name projection — aliased back onto
  * the relation's output attributes so every parent reference stays
  * resolved. The underlying scan is still the stock parquet V2 path,
  * so pushdown/pruning reach the files through the projection; the DV
  * anti-join rides |deleted| (broadcast when small), never table size.
  *
  * Write and DML positions are left untouched: the DML bridge
  * ([[TxSqlDml]]) and the V1 write path both need the RELATION (its
  * catalog + identifier name the table root), so only read positions
  * rewrite. Reference scope note: the reference (jcollado/rabbithole,
  * src/rabbithole/sql.py:1) has no table abstraction at all; this is
  * engine-extension surface.
  */
object TxSnapshotScan extends Rule[LogicalPlan] {

  private def unwrap(p: LogicalPlan): Option[DataSourceV2Relation] =
    p match {
      case r: DataSourceV2Relation => Some(r)
      case SubqueryAlias(_, child) => unwrap(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // relations in WRITE/DML target position keep their V2 relation —
    // marked by object identity BEFORE resolution state is known, so
    // a not-yet-resolved DELETE's target is never rewritten out from
    // under the DML bridge in an earlier fixed-point iteration
    val targets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def mark(p: LogicalPlan): Unit =
      unwrap(p).foreach { r => targets.add(r); () }
    plan.foreach {
      case d: DeleteFromTable => mark(d.table)
      case u: UpdateTable => mark(u.table)
      case m: MergeIntoTable => mark(m.targetTable)
      case w: V2WriteCommand => mark(w.table)
      case i: InsertIntoStatement => mark(i.table)
      case _ => ()
    }
    plan.resolveOperatorsDown {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotTxLogTable] &&
            !targets.contains(r) =>
        val t = r.table.asInstanceOf[SnapshotTxLogTable]
        val snap = TxTable.snapshot(SparkSession.active, t.root,
          t.pinnedVersion).queryExecution.analyzed
        // alias the snapshot's output onto the relation's attributes
        // (exprIds preserved) so parents resolve unchanged; names
        // match by construction — the stub's schema() IS the snapshot
        // schema — but resolve case-insensitively like the analyzer
        val projectList = r.output.map { a =>
          val src = snap.output.find(o => conf.resolver(o.name, a.name))
            .getOrElse(throw new IllegalStateException(
              s"txlog snapshot of ${t.root} lost column ${a.name} " +
                "between resolution and scan (concurrent schema " +
                "change?) — re-run the query"))
          require(src.dataType == a.dataType,
            s"txlog snapshot of ${t.root}: column ${a.name} changed " +
              s"type ${a.dataType} -> ${src.dataType} mid-analysis " +
              "(concurrent schema change) — re-run the query")
          Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        }
        Project(projectList, snap)
    }
  }
}
