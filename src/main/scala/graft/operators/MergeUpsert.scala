package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (upsert, last-writer-wins) for plain-parquet
  * warehouses, expressed as the classic anti-join + union rewrite — the
  * capability a reference user upgrading from full-replace / append
  * sinks (`Sinks.scala` K2/K3) needs for mutable dimensions: update
  * matched keys in place, insert unmatched ones, leave the rest alone.
  *
  * Plan shape and scale: the only wide operation is the LEFT ANTI join of
  * the base table against the update batch's keys. Update batches are
  * normally orders of magnitude smaller than the base, so the anti join
  * broadcasts (or AQE converts it) and the whole merge is map-side over
  * the base scan — no base-table shuffle, no sort, append-only I/O. With
  * a pathological update batch the anti join degrades to one hash
  * shuffle on the key columns, which is the floor for keyed matching.
  * The union is a no-shuffle bag concatenation. Nothing here collects to
  * the driver.
  *
  * Semantics notes:
  *  - `updates` must be key-unique (enforce upstream, e.g. d09's
  *    canonical pick); duplicate update keys would both survive.
  *  - Schema: updates are aligned to base's columns BY NAME
  *    (unionByName), so column order differences don't corrupt rows.
  *  - Deletes are the degenerate case: pass tombstone rows and filter
  *    them after the merge, or anti-join directly.
  */
object MergeUpsert {
  /** @param broadcastUpdates hint the keys-only update side as a
    *   broadcast (the default — right for the normal small-batch merge).
    *   Pass false for bulk backfills whose key set won't fit an
    *   executor, letting Catalyst/AQE pick a shuffled anti join. */
  def apply(base: DataFrame, updates: DataFrame, keys: Seq[String],
      broadcastUpdates: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val missing = keys.filterNot(base.columns.contains)
    require(missing.isEmpty, s"key columns absent from base: ${missing.mkString(",")}")
    // project the update side to JUST the key columns before the anti
    // join: the broadcast payload is keys-only regardless of how wide
    // the update rows are
    val updKeys = updates.select(keys.map(col): _*)
    val keySide = if (broadcastUpdates) broadcast(updKeys) else updKeys
    base.join(keySide, keys, "left_anti")
      .unionByName(updates.select(base.columns.map(col): _*))
  }
}
