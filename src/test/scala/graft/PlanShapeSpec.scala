package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.extract.Extract
import graft.link.Link
import graft.synth.Dict

/** Physical-plan shape assertions — the 100-TB design claims, checked
  * against `explain` output rather than asserted in prose:
  *
  *  - the extract stage reads ONLY the columns it needs from the parquet
  *    scan (column pruning reaches `ReadSchema`);
  *  - person linking is broadcast-only on the fact side: both the exact
  *    block join and the contains fallback broadcast the dimension, and no
  *    corpus-sized sort-merge join or fact-side exchange appears.
  *
  * Complements MaterializeCheckpointSpec's PartitionFilters assertion on
  * the upsert read path.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val turnsPath = {
    val dir = java.nio.file.Files.createTempDirectory("plan-turns").toString
    Seq(
      ("c1", 0, "member", "De voorzitter geeft het woord aan Anna Jansen", null.asInstanceOf[String], ts(0)),
      ("c1", 1, "member", "Mevrouw Jansen spreekt over dossier 36001 nr. 2", null.asInstanceOf[String], ts(1)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("extract scan prunes columns: ReadSchema excludes unused 'tool'") {
    val p = plan(Extract.speakerMentions(spark.read.parquet(turnsPath)))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty, s"no ReadSchema in plan:\n$p")
    assert(!readSchema.contains("tool"), s"scan reads unused column 'tool': $readSchema")
    assert(readSchema.contains("text") && readSchema.contains("conv_id"))
  }

  test("person linking is broadcast-only: no sort-merge join, no fact-side shuffle join") {
    val p = plan(Link.linkPersons(
      Extract.speakerMentions(spark.read.parquet(turnsPath)), Dict.personsDf(spark)))
    assert(p.contains("Broadcast"), s"no broadcast join in link plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge join in link plan:\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"shuffled join in link plan:\n$p")
  }

  test("graph degrees is join-free: two map-side-combined aggs, two exchanges") {
    val t = Seq(("a", "P", "b"), ("c", "P", "b")).toDF("subj", "pred", "obj")
    val p = plan(graft.analysis.GraphAnalytics.degrees(t))
    assert(!p.contains("Join"), s"join in degrees plan:\n$p")
    // partial aggregation before each exchange (map-side combine)
    assert(p.contains("partial_sum") || p.contains("partial"), s"no partial agg:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"degrees plan has $exchanges exchanges (expect <=2):\n$p")
  }

  test("the WHOLE canonical-triple plan contains no shuffle join (broadcast dims only)") {
    // r3: the discusses derivation is join-free (the co-row zaak link rides
    // the argmax as carry columns), so the only joins left anywhere in the
    // end-to-end canonical plan are broadcast dimension joins — at corpus
    // scale there is NO fact×fact shuffle join in the whole derivation
    val stages = graft.pipeline.Pipeline.build(spark,
      spark.read.parquet(turnsPath))
    val p = plan(stages.canonical)
    assert(p.contains("Broadcast"), s"no broadcast join in canonical plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge join in canonical plan:\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"shuffled join in canonical plan:\n$p")
  }
}
