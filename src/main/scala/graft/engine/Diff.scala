package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — "what changed between corpus versions", the audit
  * companion to the managed-table surface ([[Tables.upsert]] applies
  * changes; this reports them). One full-outer equi-join on the key,
  * row payloads compared as null-safe structs — no hashing, so the
  * comparison is exact and SQL-mirrorable.
  *
  * 100 TB shape: a single keyed shuffle join of the two snapshots (AQE
  * handles skew); the payload struct rides the join but is never a
  * partition key.
  */
object Diff {

  /** Per-key status between two same-schema snapshots:
    * `added` (key only in `neu`), `removed` (only in `old`), `changed`
    * (both, payload differs), `unchanged`. */
  def diff(old: DataFrame, neu: DataFrame, idCol: String): DataFrame = {
    require(old.columns.toSeq == neu.columns.toSeq,
      s"schema mismatch: ${old.columns.toSeq} vs ${neu.columns.toSeq}")
    val payload = old.columns.filterNot(_ == idCol).map(col)
    val o = old.select(col(idCol), struct(payload.toIndexedSeq: _*).as("__o"))
    val n = neu.select(col(idCol), struct(payload.toIndexedSeq: _*).as("__n"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__n").isNull, "removed")
          .when(col("__o").isNull, "added")
          .when(!(col("__o") <=> col("__n")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The diff rolled up to one row per status. */
  def diffSummary(old: DataFrame, neu: DataFrame, idCol: String): DataFrame =
    diff(old, neu, idCol).groupBy("status").agg(count(lit(1)).as("n"))
}
