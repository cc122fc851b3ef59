package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph clustering for dedup: near-dup candidate pairs only say
  * "these two are alike" — curation needs the transitive closure
  * (one keeper per *cluster*, not per pair).
  */
object Cluster {

  /** Connected components by min-label propagation: every node starts
    * labeled with itself; each round every node takes the minimum
    * label among itself and its neighbors; stop when no label moved.
    *
    * Scale shape: each round is one equi-join + one partial min
    * aggregation, both shuffling on node id — no all-pairs work, and
    * rounds are bounded by the graph diameter (near-dup graphs are
    * shallow; for adversarial long chains swap in large-star/
    * small-star, same join primitives). Labels are localCheckpointed
    * per round so the lineage stays flat, and convergence is detected
    * with a cheap limit(1) existence probe, not a full count.
    */
  def connectedComponents(pairs: DataFrame, id1: String = "id1",
      id2: String = "id2", maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col(id1).as("src"), col(id2).as("dst"))
      .unionByName(pairs.select(col(id2).as("src"), col(id1).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val neighbor = edges
        .join(labels.select(col("id").as("dst"), col("cluster_id")), "dst")
        .select(col("src").as("id"), col("cluster_id"))
      val next = neighbor.unionByName(labels)
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      converged = next
        .join(labels.withColumnRenamed("cluster_id", "old"), "id")
        .filter(col("cluster_id") =!= col("old"))
        .limit(1).isEmpty
      labels = next
      iter += 1
    }
    labels
  }
}
