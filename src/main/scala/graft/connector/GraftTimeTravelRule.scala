package graft.connector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.table.SnapshotLog

/** SQL time-travel syntax for graft tables — `SELECT … FROM t VERSION AS
  * OF 3`, `… VERSION AS OF 'audited'` (snapshot TAGS ride the same
  * clause), `… TIMESTAMP AS OF '2026-01-01 12:00:00'` — the same clauses
  * Delta/Iceberg expose. Spark's own `ResolveRelations` refuses time
  * travel for V1 session-catalog tables (UNSUPPORTED_FEATURE.TIME_TRAVEL),
  * so this rule intercepts `RelationTimeTravel` over a graft catalog
  * table FIRST and resolves it directly to the pinned-snapshot relation
  * the reader options (`versionAsOf`/`tagAsOf`/`timestampAsOf`) would
  * build — one resolution path for both faces.
  *
  * Non-graft tables and temp views pass through untouched (Spark's own
  * error stands). Timestamps must be literals (string or timestamp —
  * what the parser produces); the string form accepts `yyyy-MM-dd[
  * HH:mm:ss]`, interpreted in the session's UTC clock exactly like the
  * reader option.
  */
final class GraftTimeTravelRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
      graftDir(u.multipartIdentifier) match {
        case None => tt
        case Some((ident, dir)) =>
          val asOf: Long = version match {
            case Some(v) =>
              // an integer is a snapshot id; anything else names a TAG
              v.toLongOption.getOrElse(SnapshotLog.snapshotForTag(session, dir, v))
            case None =>
              val ms = ts match {
                case Some(Literal(s: UTF8String, StringType)) =>
                  GraftDataSource.parseTimestampMs(s.toString)
                case Some(Literal(us: Long, TimestampType)) => us / 1000L
                case other => throw new IllegalArgumentException(
                  s"graft table $dir: TIMESTAMP AS OF must be a literal " +
                    s"timestamp or date string, got: $other")
              }
              SnapshotLog.snapshotAsOfTimestamp(session, dir, ms)
          }
          SubqueryAlias(ident.table, LogicalRelation(
            GraftDataSource.relationFor(session, session.sqlContext, dir,
              Some(asOf))))
      }
  }

  /** (identifier, table dir) when the name resolves to a graft catalog
    * table — temp views and every other provider pass through. */
  private def graftDir(parts: Seq[String]): Option[(TableIdentifier, String)] =
    GraftMaintenance.graftCatalogDir(session, parts)
}
