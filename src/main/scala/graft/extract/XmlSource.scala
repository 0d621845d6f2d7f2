package graft.extract

import java.io.ByteArrayInputStream
import javax.xml.parsers.DocumentBuilderFactory
import scala.jdk.CollectionConverters._
import scala.util.Try
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.w3c.dom.Element

/** XML file source (S4) — the production path for the reference's VLOS XML
  * corpus (the `sample_vlos_*.xml` gold files): glob → distributed parse →
  * typed mention/activity/zaak/vote streams aligned with the pipeline's
  * input contracts (Link.linkPersons, ActivityMatch, Link.linkZaken).
  *
  * Distribution model: `spark.read.format("binaryFile")` lists the glob and
  * ships (path, content) rows to executors; a `mapPartitions` DOM parse
  * emits the records. This is a sanctioned per-partition imperative seam —
  * XML parsing has no Catalyst form, each file is an independent parse
  * unit, and the parser factory initializes once per partition (the
  * reference's lxml layer, xml_extractor.py). At corpus scale the files
  * spread across partitions by size (`maxPartitionBytes`), so ingest
  * parallelism is file-granular with zero shuffle.
  *
  * BOM bytes are consumed by the XML parser's own InputStream encoding
  * detection (the samples carry a UTF-8 BOM). DOCTYPE is disallowed —
  * external untrusted content must not trigger entity expansion.
  *
  * Extraction parity (reference xml_extractor.py): speakers :118-192, zaak
  * dossier refs :194-217, fractie votes :219-257, activities
  * vlos_pipeline.py:200-260.
  */
object XmlSource {

  /** (path, content) file rows for a glob under `dir`. */
  def files(spark: SparkSession, dir: String,
      glob: String = "*.xml"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))

  private def convIdOf(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    if (dot > 0) name.substring(0, dot) else name
  }

  private def parseDoc(bytes: Array[Byte]): org.w3c.dom.Document = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def elems(doc: org.w3c.dom.Document, tag: String): Seq[Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def childText(e: Element, tag: String): String = {
    val nl = e.getElementsByTagName(tag)
    if (nl.getLength == 0) "" else nl.item(0).getTextContent.trim
  }

  /** Epoch micros of a VLOS timestamp (local-naive or offset form). */
  private def parseUs(ts: String): Option[Long] =
    Try(java.time.LocalDateTime.parse(ts)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      .orElse(Try(java.time.OffsetDateTime.parse(ts).toInstant
        .toEpochMilli * 1000L))
      .toOption

  private def mapFiles[T: org.apache.spark.sql.Encoder](fileRows: DataFrame)(
      f: (String, org.w3c.dom.Document) => Iterator[T]): org.apache.spark.sql.Dataset[T] =
    fileRows.mapPartitions { rows =>
      rows.flatMap { r =>
        val conv = convIdOf(r.getString(0))
        f(conv, parseDoc(r.getAs[Array[Byte]](1)))
      }
    }(implicitly)

  /** Speaker mentions in the linker's input schema (conv_id, turn_idx,
    * v_first, v_last) — one row per `spreker` element with a surname, in
    * document order (the reference's per-fragment speaker walk).
    */
  def speakerMentions(fileRows: DataFrame): DataFrame = {
    val spark = fileRows.sparkSession
    import spark.implicits._
    mapFiles[(String, Int, String, String)](fileRows) { (conv, doc) =>
      elems(doc, "spreker").iterator.zipWithIndex.collect {
        case (e, i) if childText(e, "achternaam").nonEmpty =>
          (conv, i, childText(e, "voornaam"), childText(e, "achternaam"))
      }
    }.toDF("conv_id", "turn_idx", "v_first", "v_last")
  }

  /** Per-file speaker dictionary (the fixture files are self-resolving: the
    * reference resolves the same objectids against the live TK-API).
    */
  def speakerDict(fileRows: DataFrame): DataFrame = {
    val spark = fileRows.sparkSession
    import spark.implicits._
    mapFiles[(String, String, String, String, String, String)](fileRows) { (_, doc) =>
      elems(doc, "spreker").iterator.collect {
        case e if childText(e, "achternaam").nonEmpty =>
          (e.getAttribute("objectid"), childText(e, "voornaam"), "",
            childText(e, "achternaam"), childText(e, "voornaam"),
            childText(e, "fractie"))
      }
    }.toDF("persoon_id", "roepnaam", "tussenvoegsel", "achternaam",
      "voornamen", "fractie_id").distinct()
  }

  /** Timed activities in ActivityMatch's XML-side schema. */
  def activities(fileRows: DataFrame): DataFrame = {
    val spark = fileRows.sparkSession
    import spark.implicits._
    mapFiles[(String, Int, String, String, Long, Long)](fileRows) { (conv, doc) =>
      elems(doc, "activiteit").iterator.zipWithIndex.flatMap { case (e, i) =>
        for {
          beg <- parseUs(childText(e, "aanvangstijd"))
          end <- parseUs(childText(e, "eindtijd"))
        } yield (conv, i, e.getAttribute("soort"), childText(e, "onderwerp"), beg, end)
      }
    }.toDF("conv_id", "xml_id", "x_soort", "x_topic", "x_beg_us", "x_end_us")
  }

  /** Zaak/dossier references in the zaak linker's mention schema
    * (dossier_nr, toevoeging, stuk_nr — the F5 code split).
    */
  def zaakRefs(fileRows: DataFrame): DataFrame = {
    val spark = fileRows.sparkSession
    import spark.implicits._
    val codeRe = "^(\\d+)(?:[-\\s]?([A-Za-z0-9]+))?$".r
    mapFiles[(String, Int, Int, String, Option[Int])](fileRows) { (conv, doc) =>
      elems(doc, "dossiernummer").iterator.zipWithIndex.flatMap { case (e, i) =>
        val stuk = Option(e.getParentNode).collect {
          case p: Element => childText(p, "stuknummer")
        }.filter(_.nonEmpty).flatMap(s => Try(s.trim.toInt).toOption)
        e.getTextContent.trim match {
          case codeRe(nr, toe) => Iterator((conv, i, nr.toInt, Option(toe).getOrElse(""), stuk))
          case _ => Iterator.empty
        }
      }
    }.toDF("conv_id", "turn_idx", "dossier_nr", "toevoeging", "stuk_nr")
  }

  /** Fractie votes (stemming elements; normalized voor/tegen/onthouding).
    * The sample corpus carries none — the extractor is the production path
    * for corpora that do (reference xml_extractor.py:219-257).
    */
  def voteMentions(fileRows: DataFrame): DataFrame = {
    val spark = fileRows.sparkSession
    import spark.implicits._
    mapFiles[(String, Int, String, String)](fileRows) { (conv, doc) =>
      elems(doc, "stemming").iterator.zipWithIndex.flatMap { case (e, i) =>
        val fractie = Seq(childText(e, "fractie"), childText(e, "fractienaam"))
          .find(_.nonEmpty).getOrElse("")
        val soort = Seq(e.getAttribute("soort"), childText(e, "soort"))
          .find(_.nonEmpty).getOrElse("").toLowerCase
        val norm = soort match {
          case s if s.startsWith("voor") => "voor"
          case s if s.startsWith("tegen") => "tegen"
          case s if s.startsWith("onthoud") => "onthouding"
          case _ => ""
        }
        if (fractie.nonEmpty && norm.nonEmpty) Iterator((conv, i, fractie, norm))
        else Iterator.empty
      }
    }.toDF("conv_id", "turn_idx", "fractie_naam", "vote_norm")
  }
}
