package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.Bridges
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

import graft.operators.TxTable
import graft.sources.TxLogCatalog

/** SQL row-level mutation on txlog tables — the missing entry point a
  * SQL-only lakehouse user types first:
  *
  * {{{
  *   DELETE FROM txlog.`/tables/docs` WHERE doc_id % 3 = 0
  *   UPDATE txlog.`/tables/docs` SET lang = 'en' WHERE lang = 'xx'
  *   MERGE INTO txlog.`/tables/docs` t USING updates s
  *     ON t.doc_id = s.doc_id
  *     WHEN MATCHED AND s.del THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET text = s.text
  *     WHEN NOT MATCHED THEN INSERT (doc_id, text) VALUES (s.doc_id, s.text)
  * }}}
  *
  * An analyzer resolution rule (the pattern Delta's DeltaAnalysis
  * established: intercept `DeleteFromTable` / `UpdateTable` /
  * `MergeIntoTable` once resolved, replace with a runnable command)
  * routes each statement into the ALREADY-certified commit protocol —
  * [[TxTable.commitDelete]] / [[TxTable.commitUpdate]] /
  * [[TxTable.commitMergeDml]] — so SQL mutations get the same
  * affected-file-only rewrites, optimistic concurrency, CHECK
  * constraint enforcement, CDF and time travel as the Scala API,
  * never a path around it.
  *
  * Catalyst expressions cross into the DataFrame world by REBINDING:
  * every resolved `AttributeReference` is replaced by name — target
  * columns keep their plain names, source columns take the `__src_`
  * prefix `commitMergeDml` renames its source to — then wrapped as a
  * `Column` (`ExpressionUtils.column`). Rebinding by name is exact
  * here because both sides' names are unique after the rename.
  */
object TxSqlDml extends Rule[LogicalPlan] {

  private def unwrap(p: LogicalPlan): Option[DataSourceV2Relation] =
    p match {
      case r: DataSourceV2Relation => Some(r)
      case SubqueryAlias(_, child) => unwrap(child)
      case _ => None
    }

  /** The txlog root, when the relation came from a [[TxLogCatalog]]. */
  private def rootOf(r: DataSourceV2Relation): Option[String] =
    (r.catalog, r.identifier) match {
      case (Some(c: TxLogCatalog), Some(id)) => Some(c.rootFor(id))
      case _ => None
    }

  /** Rebind a resolved expression to plain / `__src_`-prefixed names
    * and lift it to a Column. Any attribute of neither side (a lateral
    * reference this bridge cannot honor) fails loudly.
    */
  private def rebind(e: Expression, tgtIds: Set[ExprId],
      srcIds: Set[ExprId]): Column =
    Bridges.column(e.transform {
      case a: AttributeReference if tgtIds.contains(a.exprId) =>
        UnresolvedAttribute.quoted(a.name)
      case a: AttributeReference if srcIds.contains(a.exprId) =>
        UnresolvedAttribute.quoted(s"__src_${a.name}")
      case a: AttributeReference =>
        throw new IllegalArgumentException(
          s"txlog DML cannot resolve ${a.name}#${a.exprId.id}: not a " +
            "column of the target table or the merge source")
    })

  private def setsOf(assignments: Seq[Assignment], tgtIds: Set[ExprId],
      srcIds: Set[ExprId]): Seq[(String, Column)] =
    assignments.map { as =>
      as.key match {
        case k: AttributeReference =>
          k.name -> rebind(as.value, tgtIds, srcIds)
        case other => throw new IllegalArgumentException(
          "txlog DML supports top-level column assignments only, got " +
            s"SET $other")
      }
    }

  private def clauseOf(a: MergeAction, tgtIds: Set[ExprId],
      srcIds: Set[ExprId], srcOut: Seq[Attribute])
      : TxTable.MergeClause = a match {
    case u: UpdateAction => TxTable.MergeClause("update",
      u.condition.map(rebind(_, tgtIds, srcIds)),
      setsOf(u.assignments, tgtIds, srcIds))
    case d: DeleteAction => TxTable.MergeClause("delete",
      d.condition.map(rebind(_, tgtIds, srcIds)), Nil)
    case i: InsertAction => TxTable.MergeClause("insert",
      i.condition.map(rebind(_, tgtIds, srcIds)),
      setsOf(i.assignments, tgtIds, srcIds))
    // star actions (UPDATE SET * / INSERT *): target columns take the
    // same-name source columns — expanded here in case the analyzer
    // left them raw for a non-row-level-capable table
    case UpdateStarAction(c) => TxTable.MergeClause("update",
      c.map(rebind(_, tgtIds, srcIds)),
      srcOut.map(s => s.name ->
        org.apache.spark.sql.functions.col(s"__src_${s.name}")))
    case InsertStarAction(c) => TxTable.MergeClause("insert",
      c.map(rebind(_, tgtIds, srcIds)),
      srcOut.map(s => s.name ->
        org.apache.spark.sql.functions.col(s"__src_${s.name}")))
    case other => throw new IllegalArgumentException(
      s"unsupported MERGE action for txlog tables: $other")
  }

  private def exprsResolved(a: MergeAction): Boolean =
    a.condition.forall(_.resolved) && (a match {
      case u: UpdateAction => u.assignments.forall(_.resolved)
      case i: InsertAction => i.assignments.forall(_.resolved)
      case _ => true
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case d @ DeleteFromTable(tgt, cond) if d.childrenResolved &&
          cond.resolved && unwrap(tgt).flatMap(rootOf).isDefined =>
        val r = unwrap(tgt).get
        TxSqlDeleteCommand(rootOf(r).get,
          rebind(cond, r.outputSet.map(_.exprId).toSet, Set.empty))

      case u @ UpdateTable(tgt, assignments, cond)
          if u.childrenResolved && cond.forall(_.resolved) &&
            assignments.forall(_.resolved) &&
            unwrap(tgt).flatMap(rootOf).isDefined =>
        val r = unwrap(tgt).get
        val ids = r.outputSet.map(_.exprId).toSet
        TxSqlUpdateCommand(rootOf(r).get,
          cond.map(rebind(_, ids, Set.empty))
            .getOrElse(org.apache.spark.sql.functions.lit(true)),
          setsOf(assignments, ids, Set.empty))

      case m: MergeIntoTable if m.childrenResolved &&
          m.mergeCondition.resolved &&
          (m.matchedActions ++ m.notMatchedActions ++
            m.notMatchedBySourceActions).forall(exprsResolved) &&
          unwrap(m.targetTable).flatMap(rootOf).isDefined =>
        val r = unwrap(m.targetTable).get
        val tgtIds = r.outputSet.map(_.exprId).toSet
        val srcOut = m.sourceTable.output
        val srcIds = srcOut.map(_.exprId).toSet
        def cl(as: Seq[MergeAction]) =
          as.map(clauseOf(_, tgtIds, srcIds, srcOut))
        TxSqlMergeCommand(rootOf(r).get, m.sourceTable,
          rebind(m.mergeCondition, tgtIds, srcIds),
          cl(m.matchedActions), cl(m.notMatchedActions),
          cl(m.notMatchedBySourceActions))
    }
}

/** The commands run the certified TxTable verb and report the
  * committed version as a one-row relation (the CALL-procedure
  * convention, q356).
  */
final case class TxSqlDeleteCommand(root: String, cond: Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.commitDelete(spark, root, cond).toLong))
}

final case class TxSqlUpdateCommand(root: String, cond: Column,
    sets: Seq[(String, Column)]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.commitUpdate(spark, root, cond, sets).toLong))
}

final case class TxSqlMergeCommand(root: String, source: LogicalPlan,
    cond: Column, matched: Seq[TxTable.MergeClause],
    notMatched: Seq[TxTable.MergeClause],
    notMatchedBySource: Seq[TxTable.MergeClause])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    // the resolved source plan becomes a DataFrame with its exprIds
    // intact; commitMergeDml renames it to __src_* before joining
    val src = org.apache.spark.sql.graftshim.Bridges.ofRows(spark, source)
    Seq(Row(TxTable.commitMergeDml(spark, root, src, cond, matched,
      notMatched, notMatchedBySource).toLong))
  }
}
