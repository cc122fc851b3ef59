package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: when one join key carries a large share
  * of the rows, the shuffle sends that key's whole mass to one task.
  * Salting splits each hot key into `saltFactor` sub-keys: the big
  * side gets a deterministic per-row salt, the small side is
  * replicated once per salt value, and the join runs on
  * (keys..., salt) — same result set, `saltFactor`-way parallelism on
  * every key. (AQE's skew-join handles sort-merge cases adaptively;
  * explicit salting also covers aggregations-after-join and engines
  * or shapes AQE won't rewrite.)
  */
object Skew {

  /** Inner equi-join with the big side salted. The salt is derived
    * from a hash of the big side's whole row, so the routing is
    * deterministic and needs no random state; the result equals the
    * unsalted join exactly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*),
        lit(saltFactor.toLong)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    bigSalted.join(smallReplicated, keys :+ "__salt").drop("__salt")
  }
}
