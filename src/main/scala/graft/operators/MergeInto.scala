package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE (upsert/delete batch applied to a base table) — the
  * lakehouse `MERGE INTO` shape, built from one full-outer join.
  *
  * Semantics (per key):
  *  - key only in base                -> base row survives unchanged;
  *  - key in changes with op 'U'     -> the change row's values win
  *    (an UPDATE when the key exists in base, an INSERT when it
  *    doesn't);
  *  - key in changes with op 'D'     -> the key is absent from the
  *    output (a DELETE; a 'D' for a key not in base is a no-op).
  *
  * Scale shape: ONE shuffle join keyed on the merge key — both sides
  * hash-partition on the key and every decision is local to a
  * partition; no driver traffic, no second pass. At 100 TB the two
  * standing levers compose with it unchanged: (a) when the change
  * batch is small (the common CDC case) Spark broadcasts it and the
  * base table never shuffles — AQE picks this up from runtime sizes;
  * (b) when the base table is date-partitioned or bucketed (see
  * [[PartitionedTables]]/[[BucketedTables]]), semi-joining the change
  * batch's touched partition values first prunes the base scan to the
  * files that can match, which is exactly how Delta/Iceberg price a
  * MERGE. The join itself is this operator; the pruning is the
  * layout's job.
  */
object MergeInto {

  /** Apply `changes` (same value schema as `base` + an `op` column
    * holding 'U' or 'D') to `base`. `keyCols` must be unique in both
    * inputs — MERGE on a duplicated key is ambiguous, so upstream
    * CDC compaction (last-writer-wins per key, e.g.
    * [[graft.kv.KVEngine.dedup]]'s row_number idiom) runs first.
    */
  def merge(base: DataFrame, changes: DataFrame, keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    val valueCols = base.columns.filterNot(keyCols.contains)
    require(changes.columns.toSet == (base.columns.toSet + opCol),
      s"changes schema must be base schema + '$opCol'")
    val c = valueCols.foldLeft(changes)((df, v) => df.withColumnRenamed(v, s"__c_$v"))
    base.join(c, keyCols, "full_outer")
      // 'D' rows vanish; everything else resolves changes-side-wins
      .filter(col(opCol).isNull || col(opCol) === "U")
      .select(keyCols.map(col) ++ valueCols.map(v =>
        when(col(opCol) === "U", col(s"__c_$v")).otherwise(col(v)).as(v)): _*)
  }
}
