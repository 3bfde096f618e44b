package graft.ext

import org.apache.spark.sql.DataFrame

/** Fault-tolerance-aware materialization fence for iterative operators
  * (connected components, fuzzy-join candidate staging).
  *
  * Iterative plans must cut lineage each round — otherwise the logical
  * plan grows without bound and any recomputation replays every round.
  * The two ways to cut lineage trade durability for speed:
  *
  *  - `checkpoint` (reliable): blocks are written to the configured
  *    checkpoint directory (HDFS/object store on a cluster). Surviving
  *    executor loss is exactly what a multi-round job on a 1000-executor
  *    cluster needs — one preempted executor must not kill round 37.
  *  - `localCheckpoint` (ephemeral): blocks live in executor
  *    storage memory/disk. Fast, but an executor loss permanently
  *    destroys the truncated lineage. Fine on local[n] where "executor
  *    loss" means the whole JVM died anyway.
  *
  * This fence picks reliable checkpointing whenever the session has a
  * checkpoint directory configured (`SparkContext.setCheckpointDir`,
  * the cluster deployment contract) and falls back to localCheckpoint
  * otherwise, so the same operator code is durable on a cluster and
  * fast in local tests.
  */
object Materialize {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)
}
