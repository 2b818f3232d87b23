package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental, resumable table writer.
  *
  * The input DataFrame carries an integer `bucket` column (e.g.
  * `pmod(hash(cellId), numBuckets)`). Buckets are processed in commit
  * groups: each group is written with dynamic partition overwrite (so a
  * re-run of a half-finished group is idempotent), then a snapshot commit
  * records the group's partitions with row/byte metrics and lineage.
  * `resume` = diff the bucket universe against the CURRENT snapshot and
  * process only what's missing — a killed job loses at most one
  * uncommitted group (north rule's mid-tiling resume).
  */
class CheckpointedWriter(store: SnapshotStore, lineage: String) {

  /** Returns (snapshot, numBucketsComputedThisRun). */
  def run(df: DataFrame, numBuckets: Int, bucketsPerCommit: Int,
          failAfterCommits: Int = Int.MaxValue): (Snapshot, Int) = {
    val spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val pending = store.pending(0 until numBuckets)
    var commits = 0
    var computed = 0
    pending.grouped(bucketsPerCommit).foreach { group =>
      if (commits < failAfterCommits) {
        val sub = df.filter(col("bucket").isin(group: _*))
        // one shuffle partition per bucket → file count independent of the
        // session's parallelism (dynamic-overwrite commit is driver-side and
        // scales with file count, not with cores)
        sub.repartition(group.size, col("bucket"))
          .write.mode("overwrite")
          .partitionBy("bucket")
          .parquet(s"${storeRoot}/data")
        // row counts come from the written files' parquet footers
        // (driver-side metadata reads) — no second aggregate job
        val metas = group.map(b => store.partitionMeta(b, lineage))
        store.commit(metas)
        commits += 1
        computed += group.size
      }
    }
    (store.current().getOrElse(throw new IllegalStateException("no snapshot after run")),
      computed)
  }

  private def storeRoot: String = store.root
}
