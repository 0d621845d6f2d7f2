package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}
import graft.extract.Expand
import graft.link.Link
import graft.triples.{RelMap, RelSpec}

/** S2 nested entity model, REL_MAP-declarative edges, J2 actor-priority
  * linking, and the J7 agendapunt zaak-union tier.
  */
class NestedRelSpec extends SparkSpec {
  import spark.implicits._

  private def turnsDf = Seq(
    ("c1", 0, "chair", "Opening van de vergadering", null.asInstanceOf[String]),
    ("c1", 1, "member", "Wij bespreken vandaag het wetsvoorstel in detail", "search"),
    ("c1", 2, "member", "Aan de orde is dossier 36001-II", null.asInstanceOf[String])
  ).map { case (c, i, r, t, tool) => (c, i, r, t, tool, Timestamp.valueOf("2024-01-01 10:00:00")) }
    .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("withAttachments adds a TWO-LEVEL array<struct<…,array<struct>>> child collection") {
    val df = Expand.withAttachments(turnsDf)
    val f = df.schema("attachments")
    assert(f.dataType.isInstanceOf[ArrayType])
    val el = f.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(el.fieldNames.toSeq == Seq("att_id", "kind", "size_bytes", "chunks"))
    val chunkEl = el("chunks").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(chunkEl.fieldNames.toSeq == Seq("chunk_id", "seq", "chunk_bytes"))
  }

  test("flattenChunks double-explodes both levels; attachment-less turns survive") {
    val deep = Expand.flattenChunks(Expand.withAttachments(turnsDf))
    // every input turn appears at least once
    assert(deep.select("conv_id", "turn_idx").distinct().count() == 3)
    // every attachment has size_bytes % 2 + 1 chunks with sequential seq
    val withAtt = deep.where(col("att_id").isNotNull)
    val perAtt = withAtt.groupBy("att_id", "size_bytes")
      .agg(count(lit(1)).as("n"), min("seq").as("lo"), max("seq").as("hi"))
      .collect()
    assert(perAtt.nonEmpty)
    perAtt.foreach { r =>
      val expect = r.getAs[Int]("size_bytes") % Expand.MaxChunks + 1
      assert(r.getAs[Long]("n") == expect)
      assert(r.getAs[Int]("lo") == 0 && r.getAs[Int]("hi") == expect - 1)
    }
    // chunk ids are unique across the corpus
    assert(withAtt.select("chunk_id").distinct().count() == withAtt.count())
  }

  test("RelMap childArray2: HAS_CHUNK edges come from the second nesting level") {
    val parent = Expand.withAttachments(turnsDf)
    val edges = RelMap.edges(parent, RelMap.TurnRels)
    val chunks = edges.where(col("pred") === "HAS_CHUNK")
      .select("subj", "obj").as[(String, String)].collect()
    val deep = Expand.flattenChunks(parent).where(col("chunk_id").isNotNull)
      .select(concat(lit("attachment:"), col("att_id")),
        concat(lit("chunk:"), col("chunk_id")))
      .as[(String, String)].collect()
    assert(chunks.toSet == deep.toSet && chunks.nonEmpty)
  }

  test("flattenAttachments is explode_outer: attachment-less turns survive") {
    val flat = Expand.flattenAttachments(Expand.withAttachments(turnsDf))
    // every input turn appears at least once
    assert(flat.select("conv_id", "turn_idx").distinct().count() == 3)
    // deterministic: same text -> same attachment count on repeat runs
    val c1 = flat.where(col("att_id").isNotNull).count()
    val c2 = Expand.flattenAttachments(Expand.withAttachments(turnsDf))
      .where(col("att_id").isNotNull).count()
    assert(c1 == c2)
  }

  test("RelMap: adding an edge type is a map entry, not new code") {
    val parent = Expand.withAttachments(turnsDf)
    val base = RelMap.edges(parent, RelMap.TurnRels)
    val preds = base.select("pred").distinct().as[String].collect().toSet
    assert(preds == Set("HAS_ATTACHMENT", "HAS_CHUNK", "USED_TOOL", "IN_CONV"))
    // one added spec -> one new edge family, same generic loop
    val extra = RelSpec("SPOKEN_BY_ROLE", "turn", Seq("conv_id", "turn_idx"),
      "role", "role")
    val withExtra = RelMap.edges(parent, RelMap.TurnRels :+ extra)
    assert(withExtra.where(col("pred") === "SPOKEN_BY_ROLE").count() == 3)
    assert(withExtra.count() == base.count() + 3)
    // nested child edges carry the child's key
    val att = base.where(col("pred") === "HAS_ATTACHMENT").select("obj").as[String].collect()
    assert(att.forall(_.startsWith("attachment:")))
  }

  test("J2: actor-tier candidate beats the global dictionary argmax") {
    val mentions = Seq(
      ("c2", 1, "", "Jansen"), // ambiguous surname, actor tier decides
      ("c3", 1, "", "Jansen") // no matching actor -> global argmax P00
    ).toDF("conv_id", "turn_idx", "v_first", "v_last")
    val persons = Seq(
      ("P00", "Anna", "", "Jansen", "Anna Maria", "F00"),
      ("P24", "Anna", "", "Jansen", "Anna Maria", "F06")
    ).toDF("persoon_id", "roepnaam", "tussenvoegsel", "achternaam", "voornamen", "fractie_id")
    val actors = Seq(("c2", "P24"), ("c3", "P05")).toDF("conv_id", "persoon_id")
    val out = Link.linkPersonsPriority(mentions, persons, actors)
      .select("conv_id", "persoon_id", "source").as[(String, String, String)]
      .collect().map { case (c, p, s) => c -> ((p, s)) }.toMap
    assert(out("c2") == ("P24", "actor"))
    assert(out("c3") == ("P00", "global"))
  }

  test("J7: agendapunt tier contributes zaak matches unreachable from text") {
    val textLinked = Seq(
      ("c1", 2, 36001, 1, "Z36001-1", 100, "EXACT")
    ).toDF("conv_id", "turn_idx", "dossier_nr", "stuk_nr", "entity_id", "score", "match_type")
    val accepted = Seq(("c1", 0)).toDF("conv_id", "cand_idx")
    val apZaken = Seq(("c1", 0, 36004, 2)).toDF("conv_id", "cand_idx", "dossier_nr", "stuk_nr")
    val zaken = Seq(
      ("Z36001-1", 36001, 1), ("Z36004-2", 36004, 2)
    ).toDF("zaak_id", "dossier_nr", "stuk_nr")
    val out = Link.linkZakenUnion(textLinked, accepted, apZaken, zaken)
    val bySource = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource == Map("xml" -> 1L, "agendapunt" -> 1L))
    val ap = out.where(col("source") === "agendapunt").head()
    assert(ap.getAs[String]("entity_id") == "Z36004-2")
    assert(ap.getAs[Int]("score") == 100 && ap.getAs[String]("match_type") == "EXACT")
  }
}
