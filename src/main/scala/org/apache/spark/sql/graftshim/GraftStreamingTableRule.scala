package org.apache.spark.sql.graftshim

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation
import org.apache.spark.sql.types.{LongType, StringType}

/** `spark.readStream.table("cat.t")` for graft V2 catalog tables — the
  * analyzer rewrite that lowers a [[StreamingRelationV2]] over a graft
  * table onto the V1 `format("graft")` streaming source (the published
  * Delta school: DeltaAnalysis rewrites its streaming V2 relations onto
  * DeltaSource for exactly this reason — the source semantics live once).
  *
  * Spark's own `V2TableWithV1Fallback` resolution already produces a V1
  * fallback relation for graft tables, but it drops the READER OPTIONS on
  * the floor (the fallback `UnresolvedCatalogRelation` is built with the
  * default empty option map — see `RelationResolution`), so
  * `readStream.option("readChangeFeed", "true").table("cat.t")` would
  * silently stream plain appends. This rule rebuilds the V1 relation WITH
  * the user's options, and widens the output by the two change-event
  * columns when `readChangeFeed=true` asks for the CDF vocabulary (the
  * same schema contract as `readStream.format("graft")` — see
  * `GraftDataSource.sourceSchema`).
  *
  * The node's original output attributes are REUSED verbatim (same
  * exprIds), so references already resolved against the table's columns
  * stay valid; the CDF columns append after them and resolve in the same
  * fixed point. Lives in this package because [[StreamingRelationV2]],
  * [[DataSource]] and [[StreamingRelation]] are `private[sql]`; contains
  * no Spark-derived code.
  */
final class GraftStreamingTableRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case s @ StreamingRelationV2(_, _, t: graft.connector.GraftStreamableTable,
        options, output, _, _, _) =>
      require(t.streamPinnedAsOf.isEmpty,
        s"graft table ${t.streamTableDir}: cannot stream from a " +
          "time-travel pinned relation — stream the live table and bound " +
          "it with startingVersion instead")
      // user options verbatim, plus the path the V1 provider resolves by;
      // a user-supplied 'path' option must not silently redirect the read
      val user = options.asCaseSensitiveMap().asScala.toMap
      require(!user.keys.exists(_.equalsIgnoreCase("path")),
        "readStream.table(...): the table name IS the path; drop the " +
          "'path' option")
      val opts = user + ("path" -> t.streamTableDir)
      val cdf = user.exists { case (k, v) =>
        k.equalsIgnoreCase("readChangeFeed") && v.toBoolean }
      val out =
        if (cdf && !output.exists(_.name == "_change_op"))
          output ++ Seq(
            AttributeReference("_change_op", StringType)(),
            AttributeReference("_change_snapshot", LongType)())
        else output
      StreamingRelation(
        DataSource(spark, className = "graft", options = opts),
        sourceName = "graft", output = out)
  }
}
