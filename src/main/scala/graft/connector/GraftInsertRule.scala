package graft.connector

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.StructType

/** Rewrites `INSERT INTO` / `INSERT OVERWRITE` statements whose target is
  * a graft table into [[GraftInsertCommand]] (an append / atomic-replace
  * LOG COMMIT) — the reason this must be an analyzer rule and not a
  * relation mixin: `DataSource.resolveRelation` REBUILDS a plain
  * `HadoopFsRelation` around [[GraftFileIndex]] when the catalog supplies
  * the table schema, so an `InsertableRelation` marker on the relation
  * object does not survive catalog resolution, and Spark's stock
  * conversion (`InsertIntoHadoopFsRelationCommand`) would then write raw
  * parquet at the table root — deleting the snapshot log first on
  * OVERWRITE. The published Delta Lake design has the same rule
  * (DeltaAnalysis) for the same reason. [[GraftFileIndex.rootPaths]] is
  * empty so extension-less sessions fail loudly instead.
  *
  * Column binding follows the stock V1 semantics: positional, with an
  * explicit column list (`INSERT INTO t (c, b, a) …`) reordered by name
  * first; `BY NAME`, PARTITION specs and IF NOT EXISTS are refused
  * loudly (the table format has its own partition/merge vocabulary).
  */
final class GraftInsertRule extends Rule[LogicalPlan] {

  private def unwrap(plan: LogicalPlan): LogicalPlan = plan match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  /** (tableDir, visible schema) when the relation is a graft one —
    * matched through the FILE INDEX, which survives relation rebuilds. */
  private def graftTarget(rel: BaseRelation): Option[(String, StructType)] =
    rel match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some((g.tableDir, h.dataSchema))
        case _ => None
      }
      case c: GraftComputedRelation => Some((c.tableDir, c.schema))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case i: InsertIntoStatement if i.query.resolved =>
      unwrap(i.table) match {
        case lr: LogicalRelation =>
          val rel = lr.relation
          graftTarget(rel) match {
            case Some((dir, visible)) =>
              require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
                s"graft table $dir: INSERT … PARTITION is not supported — " +
                  "partition values live in the data columns and the " +
                  "manifest records them per file (write them as ordinary " +
                  "columns; see partitionCols)")
              require(!i.byName, s"graft table $dir: INSERT … BY NAME is " +
                "not supported; bind positionally or use an explicit " +
                "column list")
              GraftInsertCommand(dir, visible,
                reorder(i.query, i.userSpecifiedCols, visible, dir),
                i.overwrite, lr.catalogTable.map(_.identifier))
            case None => i
          }
        case _ => i
      }
  }

  /** An explicit column list binds query output i to the NAMED column i;
    * re-project into table-schema order (every column must be named —
    * the format has no column defaults). */
  private def reorder(query: LogicalPlan, cols: Seq[String],
                      visible: StructType, dir: String): LogicalPlan =
    if (cols.isEmpty) query
    else {
      val resolver = org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution
      require(cols.size == visible.size &&
          visible.forall(f => cols.exists(resolver(_, f.name))),
        s"graft table $dir: an INSERT column list must name every table " +
          s"column (${visible.fieldNames.mkString(", ")}), got " +
          s"(${cols.mkString(", ")})")
      require(query.output.size == cols.size,
        s"graft table $dir: INSERT column list names ${cols.size} columns " +
          s"but the query produces ${query.output.size}")
      val byCol: Map[String, Attribute] =
        cols.map(_.toLowerCase(java.util.Locale.ROOT))
          .zip(query.output).toMap
      Project(visible.map(f =>
        byCol(f.name.toLowerCase(java.util.Locale.ROOT))).toSeq, query)
    }
}

/** The V1 insert command for graft tables: materialize the (resolved)
  * query and hand it to [[GraftDataSource.insertInto]] — an `append`
  * snapshot, or on OVERWRITE one atomic whole-table `upsert` commit that
  * keeps every prior snapshot time-travelable. A catalog-table target's
  * cached relation (which pins the pre-insert snapshot — standard V1
  * datasource-table behavior) is refreshed after the commit, exactly as
  * the stock insert commands do; external writers to the same table still
  * require `REFRESH TABLE`, the same contract as parquet tables. */
final case class GraftInsertCommand(
    dir: String, visible: StructType, query: LogicalPlan, overwrite: Boolean,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graftshim.GraftSqlShim.ofRows(spark, query)
    GraftDataSource.insertInto(spark, dir, visible, df, overwrite)
    catalogIdent.foreach(spark.sessionState.catalog.refreshTable)
    Seq.empty
  }
}
