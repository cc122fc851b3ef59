package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Lineage truncation shared by the pipeline operators that eagerly
  * materialize a small intermediate/result frame (near-dup pair sets,
  * packed-shard assignments, clustering rounds).
  *
  * `localCheckpoint(true)` is the cheap default for local and
  * exploratory runs, but it pins the materialized blocks to the
  * executors that computed them — on a real cluster a lost executor
  * makes those blocks unrecoverable and kills the job mid-flight.
  * Operators thread a `reliableCheckpoints` flag down here: pass
  * `true` on a real cluster to write the blocks to reliable storage
  * instead (requires `spark.sparkContext.setCheckpointDir` to point
  * at durable storage, e.g. HDFS/object store).
  */
private[graft] object Lineage {
  def truncate(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df.localCheckpoint(true)
}
