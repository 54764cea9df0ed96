package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type 2 — slowly-changing-dimension HISTORY tracking, the
  * versioned complement to [[MergeUpsert]]'s last-writer-wins: applying
  * an update batch to a dimension closes out each changed row
  * (`valid_to` = effective time) and appends the new version
  * (`valid_from` = effective time, `valid_to` NULL = current), keeps
  * unchanged and untouched rows as-is, and inserts brand-new keys as
  * open rows. A no-op update (same attribute values) creates NO version
  * — change detection is null-safe per attribute.
  *
  * Plan shape and scale. The naive formulation is one FULL OUTER join of
  * the open history slice against the updates — but Spark cannot
  * broadcast a full outer join (no BroadcastHashJoin support), so the
  * hint is silently ignored and the WHOLE dimension shuffles into a
  * SortMergeJoin (caught by this operator's plan audit). The default
  * (small update batch) path therefore decomposes into broadcast-only
  * joins with ZERO dimension shuffle:
  *   - open LEFT OUTER broadcast(updates): closed rows, unchanged rows
  *     and changed-key new versions, emitted in a single pass via an
  *     array-of-structs explode (1-2 rows per joined row);
  *   - open LEFT SEMI broadcast(update keys): the matched key set —
  *     output is AT MOST update-batch-sized;
  *   - updates LEFT ANTI broadcast(matched keys): the inserts —
  *     a batch-sized × batch-sized join.
  * The dimension is scanned twice (map-side both times, pruned to
  * keys+attrs), which beats one full shuffle of it at any real scale.
  * With `broadcastUpdates = false` (bulk loads whose batch won't fit an
  * executor) the full-outer shuffle plan is used instead. Closed history
  * rides through untouched via union. No driver-side work, no window,
  * no sort.
  */
object Scd2 {

  /** @param current   full history table: `keys ++ attrs ++ validFrom ++
    *                  validTo` (open rows have null `validTo`)
    * @param updates   `keys ++ attrs ++ effectiveCol`; must be KEY-UNIQUE
    *                  ([[MergeUpsert]]'s contract — enforce upstream, e.g.
    *                  [[graft.sinks.StreamingUpsert.latestPerKey]]): a
    *                  duplicated update key would open two same-time
    *                  versions of the row
    * @param attrs     tracked attribute columns (a change in any opens a
    *                  new version)
    * @param effectiveCol column in `updates` carrying the effective
    *                  time; must be strictly later than the open rows'
    *                  `validFrom` for the history to stay well-ordered
    */
  def apply(current: DataFrame, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], effectiveCol: String,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      broadcastUpdates: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "scd2 requires at least one key column")
    val needBase = keys ++ attrs :+ validFrom :+ validTo
    val missingB = needBase.filterNot(current.columns.contains)
    require(missingB.isEmpty, s"current lacks columns: ${missingB.mkString(",")}")
    val needUpd = keys ++ attrs :+ effectiveCol
    val missingU = needUpd.filterNot(updates.columns.contains)
    require(missingU.isEmpty, s"updates lacks columns: ${missingU.mkString(",")}")

    val open = current.filter(col(validTo).isNull)
    val closed = current.filter(col(validTo).isNotNull)
    // rename update payload so the join carries both sides unambiguously.
    // effectiveCol is CONTRACT-non-null: the match logic keys "an update
    // is present" on `_u_eff.isNotNull`, so a NULL effective time would
    // silently vanish for a matched key yet still insert an open row
    // with NULL valid_from for a new key — fail loudly at execution
    // instead (raise_error rides the column, so pruning can't drop it).
    val u = attrs.foldLeft(updates.select(needUpd.map(col): _*)) {
      (df, a) => df.withColumnRenamed(a, s"_u_$a")
    }.withColumn(effectiveCol,
        when(col(effectiveCol).isNotNull, col(effectiveCol))
          .otherwise(raise_error(lit(
            s"scd2: updates carry a NULL $effectiveCol — every update row " +
              "must have an effective time (a NULL one would neither close " +
              "nor version its key)"))))
      .withColumnRenamed(effectiveCol, "_u_eff")
    val uSide = if (broadcastUpdates) broadcast(u) else u

    val openPresent = col(validFrom).isNotNull
    val updPresent = col("_u_eff").isNotNull
    val changedCond: Column = attrs
      .map(a => !(col(a) <=> col(s"_u_$a")))
      .reduce(_ || _)

    def rowStruct(attrCols: Seq[Column], from: Column, to: Column) =
      struct(keys.map(col) ++ attrCols :+ from.as(validFrom) :+ to.as(validTo): _*)

    val openAttrs = attrs.map(col)
    val updAttrs = attrs.map(a => col(s"_u_$a").as(a))
    val nullTo = lit(null).cast(current.schema(validTo).dataType)

    val out =
      if (broadcastUpdates) {
        // broadcast-only decomposition: no dimension shuffle anywhere
        val j = open.join(uSide, keys, "left_outer")
        val fromOpen = j.select(explode(array(
          // open row survives: untouched, or update was a no-op → as-is;
          // changed → closed at the update's effective time
          when(!updPresent || !changedCond,
            rowStruct(openAttrs, col(validFrom), col(validTo))),
          when(updPresent && changedCond,
            rowStruct(openAttrs, col(validFrom), col("_u_eff"))),
          when(updPresent && changedCond,
            rowStruct(updAttrs, col("_u_eff"), nullTo))
        )).as("_r"))
          .filter(col("_r").isNotNull)
          .select(col("_r.*"))
        val matched = open.select(keys.map(col): _*)
          .join(broadcast(u.select(keys.map(col): _*)), keys, "left_semi")
        val inserts = u.join(broadcast(matched), keys, "left_anti")
          .select(keys.map(col) ++ updAttrs :+ col("_u_eff").as(validFrom)
            :+ nullTo.as(validTo): _*)
        fromOpen.unionByName(inserts)
      } else {
        // bulk path: the update batch is too big to broadcast — one
        // full-outer shuffle join, single-pass emission
        val j = open.join(uSide, keys, "full_outer")
        j.select(explode(array(
          when(openPresent && (!updPresent || !changedCond),
            rowStruct(openAttrs, col(validFrom), col(validTo))),
          when(openPresent && updPresent && changedCond,
            rowStruct(openAttrs, col(validFrom), col("_u_eff"))),
          // new version: changed key, or brand-new key
          when(updPresent && (!openPresent || changedCond),
            rowStruct(updAttrs, col("_u_eff"), nullTo))
        )).as("_r"))
          .filter(col("_r").isNotNull)
          .select(col("_r.*"))
      }
    closed.select(out.columns.map(col): _*).unionByName(out)
  }
}
