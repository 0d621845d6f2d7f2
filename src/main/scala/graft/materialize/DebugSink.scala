package graft.materialize

import org.apache.spark.sql.{DataFrame, SaveMode}

/** S9: debug JSONL sink — the reference dumps per-stage diagnostic JSONL
  * next to its checkpoints (checkpoint_decorator debug paths / the loaders'
  * `--debug` dumps). Spark-side this is just a mode on `df.write.json`; the
  * wrapper exists so pipelines name ONE seam for diagnostics and so the
  * single-file convenience (for small stage samples a human reads) is
  * explicit rather than an accidental `coalesce(1)` on a big frame.
  */
object DebugSink {

  /** Write `df` as JSON-lines under `path` (one file per partition). */
  def jsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Single-file JSONL for SMALL diagnostic samples (caller bounds rows —
    * e.g. `df.limit(1000)`); coalesce(1) on an unbounded frame would
    * serialize the stage through one task.
    */
  def jsonlSingle(df: DataFrame, path: String, maxRows: Int = 10000): Unit =
    df.limit(maxRows).coalesce(1).write.mode(SaveMode.Overwrite).json(path)
}
