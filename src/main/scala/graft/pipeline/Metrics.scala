package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import graft.model.MatchType

/** Pipeline counters — the reference's ProcessingStatistics / thread-safe
  * loader counters (src/vlos/models.py:186-210,
  * src/loaders/threading/threaded_loader.py:31-56) as Spark `observe()`
  * named metrics: collected DURING the normal action with zero extra passes
  * or shuffles (vs. the reference's lock-guarded mutable counters).
  */
object Metrics {

  /** Attach link-stage observations. Read `obs.get` after any action on the
    * returned frame: total/exact/fuzzy mention counts + score sum (match
    * rates are derived downstream, models.py:195-210 parity).
    */
  def observeLink(linked: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("link_stats")
    val df = linked.observe(obs,
      count(lit(1)).as("n_linked"),
      sum(when(col("match_type") === MatchType.Exact, 1L).otherwise(0L)).as("n_exact"),
      sum(when(col("match_type") === MatchType.Fuzzy, 1L).otherwise(0L)).as("n_fuzzy"),
      sum(col("score").cast("long")).as("score_sum"))
    (df, obs)
  }

  /** Attach triple-stage observations (emitted-triple counters; observe()
    * only accepts commutative aggregates — no distinct).
    */
  def observeTriples(triples: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("triple_stats")
    val df = triples.observe(obs,
      count(lit(1)).as("n_triples"),
      sum(when(col("pred") === graft.model.Pred.MatchesPersoon, 1L).otherwise(0L))
        .as("n_mention_matches"))
    (df, obs)
  }

  /** Derived rates in permille (ProcessingStatistics properties parity). */
  def matchRatePermille(nMatched: Long, nTotal: Long): Long =
    if (nTotal == 0) 0L else nMatched * 1000 / nTotal
}
