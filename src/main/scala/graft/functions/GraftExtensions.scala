package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-extension entry point: add
  * `spark.sql.extensions=graft.functions.GraftExtensions` to register the
  * engine's SQL surface at session build — the `parse_human_interval`
  * scalar function and the `graft_query` table function (the SQL face of
  * the dedup/text/similarity operator families). `ParseHumanInterval
  * .install` / `GraftQuery.install` do the same against a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("parse_human_interval"),
      ParseHumanInterval.info,
      ParseHumanInterval.builder))
    ext.injectFunction((
      FunctionIdentifier("fp_dot"),
      FixedPointDot.info,
      FixedPointDot.builder))
    ext.injectTableFunction((
      FunctionIdentifier(GraftQuery.name),
      GraftQuery.info,
      GraftQuery.builder))
  }
}
