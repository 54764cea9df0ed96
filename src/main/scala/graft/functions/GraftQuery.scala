package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** `graft_query(name, dir)` — the SQL face of the extension operators.
  *
  * `Catalog.registerViews` exposes the TABLES to `spark.sql`, but the
  * d/t/v operator families (dedup battery, text analysis, similarity
  * search) were Scala-only: a SQL user could not invoke MinHash dedup or
  * top-k cosine search at all. This table function closes that gap for
  * the WHOLE catalog uniformly:
  *
  * {{{
  * SELECT * FROM graft_query('d03_neardup_minhash', '/data/sf0.01')
  * SELECT * FROM graft_query('v01_similarity_topk', '/data/sf0.01') WHERE rnk = 1
  * }}}
  *
  * The builder resolves the named [[graft.QueryDef]] and splices its
  * ANALYZED plan into the calling query — Catalyst then optimizes the
  * whole statement together, so outer predicates/pruning compose with the
  * operator's plan exactly as they would in Scala. Queries whose plan
  * construction runs jobs (d03's cached shingle count, d05's propagation
  * loop) run them at analysis time — same semantics as the Scala call.
  *
  * Registered at session build via [[GraftExtensions]]
  * (`spark.sql.extensions`) or on a live session with [[install]] —
  * mirroring [[ParseHumanInterval]]'s two entry points.
  */
object GraftQuery {
  val name = "graft_query"

  val info: ExpressionInfo = new ExpressionInfo(getClass.getName, name)

  val builder: Seq[Expression] => LogicalPlan = { args =>
    require(args.length == 2,
      s"$name(query_name, data_dir) takes 2 arguments, got ${args.length}")
    def strArg(e: Expression, what: String): String = {
      require(e.foldable && e.dataType == StringType,
        s"$name: $what must be a string literal")
      val v = e.eval()
      require(v != null, s"$name: $what must not be null")
      v.toString
    }
    val qname = strArg(args(0), "query_name")
    val dir = strArg(args(1), "data_dir")
    val q = graft.Catalog.byName.getOrElse(qname,
      throw new IllegalArgumentException(
        s"unknown graft query '$qname'; known: " +
          graft.Catalog.byName.keys.toSeq.sorted.mkString(", ")))
    q.run(SparkSession.active, dir).queryExecution.analyzed
  }

  /** Register on a live session (extensions only apply at session build). */
  def install(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
