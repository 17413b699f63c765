package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank rounds, d15
  * label propagation, BPE merge rounds). Iterated plans grow without
  * bound unless each round's result is materialized and its lineage
  * cut; HOW it is cut decides fault tolerance:
  *
  *  - `localCheckpoint()` keeps the blocks on executors with lineage
  *    discarded — fast, but ONE executor loss mid-iteration makes the
  *    job unrecoverable (no lineage to recompute from). Fine on
  *    local[N]; a scale-killer on a 1,000-node preemptible fleet.
  *  - `checkpoint()` writes the blocks to the SparkContext's
  *    checkpoint directory (HDFS/object store on a cluster) — a round
  *    costs a durable write, and any executor loss replays from the
  *    checkpoint instead of killing the job.
  *
  * The contract here follows Spark's own: `df.checkpoint()` requires
  * `sparkContext.setCheckpointDir(...)` to have been called, so that
  * call IS the opt-in. Every graft iterative operator truncates through
  * [[truncate]], which uses the reliable path exactly when a checkpoint
  * dir is configured and falls back to `localCheckpoint` otherwise —
  * cluster jobs set the dir once at session start and every iteration
  * in the library becomes durable, with zero operator-signature churn.
  */
object Lineage {

  /** Materialize `df` and truncate its lineage — reliably if the
    * session has a checkpoint dir configured, in-memory otherwise.
    * Both paths are eager, so callers can count on the upstream plan
    * having executed exactly once when this returns. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
