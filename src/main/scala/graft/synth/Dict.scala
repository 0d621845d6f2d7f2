package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Fractie, Person}

/** Deterministic entity dictionaries — the transcript-domain equivalent of
  * the reference's TK-API dimension entities (Persoon, Fractie, Zaak,
  * Kamerstukdossier, Document; SURVEY.md §7.1). These are the broadcast
  * dimensions of the link stage.
  *
  * Single source of truth: the same literal rows are exposed
  *  (a) as Spark DataFrames (for the pipeline), and
  *  (b) as DuckDB `VALUES` CTE text (for the driver's SQL oracle),
  * so the Spark implementation and the oracle can never drift.
  *
  * At production scale these dims stay broadcast-sized (~5k persons, ~50
  * parties — SURVEY.md §2.3), so every dictionary join in the linker is a
  * broadcast hash join: no shuffle of the 10^12-row fact side.
  */
object Dict {

  /** Dictionary content version — part of the checkpoint config snapshot
    * (Checkpoint.configHash): resuming a run against a different dictionary
    * must be refused, not silently mixed. Bump on any row change.
    */
  val Version = "1"

  /** Clean dictionary used by the driver-facing oracle queries: surnames are
    * pairwise distinct and non-near-duplicate, so exact-tier scoring is the
    * unique outcome (near-duplicate/fuzzy cases are exercised in ScalaTest
    * with the adversarial dictionary in test fixtures instead).
    */
  // (idx, persoon_id, roepnaam, tussenvoegsel, achternaam, fractie_id)
  val persons: Seq[(Int, Person)] = Seq(
    ("Anna", "", "Jansen", "F00"),
    ("Pieter", "van der", "Berg", "F01"),
    ("Sophie", "de", "Vries", "F02"),
    ("Thomas", "", "Bakker", "F03"),
    ("Emma", "van", "Dijk", "F04"),
    ("Daan", "", "Visser", "F05"),
    ("Julia", "", "Smit", "F06"),
    ("Lucas", "de", "Boer", "F07"),
    ("Mila", "", "Mulder", "F08"),
    ("Sem", "de", "Groot", "F09"),
    ("Tess", "", "Bos", "F10"),
    ("Finn", "van", "Leeuwen", "F11"),
    ("Sara", "", "Dekker", "F00"),
    ("Ruben", "", "Brouwer", "F01"),
    ("Noor", "van der", "Meer", "F02"),
    ("Jesse", "", "Kok", "F03"),
    ("Eva", "", "Peters", "F04"),
    ("Tim", "", "Hendriks", "F05"),
    ("Lotte", "van", "Dam", "F06"),
    ("Max", "", "Vermeulen", "F07"),
    ("Fleur", "", "Willems", "F08"),
    ("Stijn", "van den", "Heuvel", "F09"),
    ("Roos", "", "Maas", "F10"),
    ("Bram", "", "Verhoeven", "F11")
  ).zipWithIndex.map { case ((roep, tv, naam, fid), i) =>
    (i, Person(f"P$i%02d", roep, tv, naam, s"$roep Maria", fid))
  }

  // (idx, fractie_id, naam, afkorting, zetels)
  val fracties: Seq[(Int, Fractie)] = Seq(
    ("Volkspartij", "VVD", 34),
    ("Democraten 66", "D66", 24),
    ("Partij voor de Vrijheid", "PVV", 17),
    ("Christen Democratisch Appel", "CDA", 14),
    ("Socialistische Partij", "SP", 9),
    ("Partij van de Arbeid", "PvdA", 9),
    ("GroenLinks", "GL", 8),
    ("ChristenUnie", "CU", 5),
    ("Partij voor de Dieren", "PvdD", 6),
    ("Staatkundig Gereformeerde Partij", "SGP", 3),
    ("DENK", "DENK", 3),
    ("Volt", "VOLT", 2)
  ).zipWithIndex.map { case ((naam, afk, zetels), i) =>
    (i, Fractie(f"F$i%02d", naam, afk, zetels))
  }

  /** Zaak dim: dossiers 36000..36049 × stuk 1..7, with every 5th dossier's
    * zaken missing so the tier-2 dossier fallback path is exercised
    * (reference vlos_pipeline.py:286-296 → FALLBACK score 75).
    */
  val DossierBase = 36000
  val NDossiers = 50
  val NStuk = 7
  val Toevoegingen: Seq[String] = Seq("II", "VI", "A", "XV")

  def personsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    persons.map { case (i, p) =>
      (i, p.persoon_id, p.roepnaam, p.tussenvoegsel, p.achternaam, p.voornamen, p.fractie_id)
    }.toDF("idx", "persoon_id", "roepnaam", "tussenvoegsel", "achternaam", "voornamen", "fractie_id")
  }

  /** Extra persons sharing a surname with the base dictionary — the
    * ambiguity the J2 actor-priority tier needs to be observable (reference
    * api_extractor.py:134-155: with a surname-unique dictionary the actor
    * tier can never change the outcome). P24 clones P00's names, so the
    * global argmax resolves "Jansen" to P00 (persoon_id tie-break) while a
    * conversation whose activity actors include P24 resolves to P24.
    */
  val extraPersons: Seq[(Int, Person)] =
    Seq((24, Person("P24", "Anna", "", "Jansen", "Anna Maria", "F06")))

  /** Base ∪ extra persons: the dictionary of the priority-linking queries. */
  def personsExtDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (persons ++ extraPersons).map { case (i, p) =>
      (i, p.persoon_id, p.roepnaam, p.tussenvoegsel, p.achternaam, p.voornamen, p.fractie_id)
    }.toDF("idx", "persoon_id", "roepnaam", "tussenvoegsel", "achternaam", "voornamen", "fractie_id")
  }

  def fractiesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fracties.map { case (i, f) => (i, f.fractie_id, f.naam, f.afkorting, f.zetels_aantal) }
      .toDF("idx", "fractie_id", "naam", "afkorting", "zetels_aantal")
  }

  /** Generated arithmetically (no literals) so the same arithmetic runs as
    * oracle SQL at any dictionary scale. Driver-local rows → `LocalRelation`
    * (like personsDf): a broadcast of a LocalRelation collects on the
    * driver with NO Spark job, while the earlier `spark.range` form paid a
    * near-empty distributed job (scheduling latency only — measured
    * 0.2-0.9 s at 16+ shuffle partitions) per broadcast build per action.
    * Dims stay broadcast-sized by design (SURVEY.md §2.3), so local rows
    * are the right representation at any corpus scale.
    */
  def zakenDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0L until NDossiers.toLong * NStuk)
      .map(i => (DossierBase + (i % NDossiers).toInt, (i / NDossiers).toInt + 1))
      .filter { case (dossierNr, _) => (dossierNr - DossierBase) % 5 != 0 }
      .map { case (dossierNr, stukNr) =>
        (s"Z$dossierNr-$stukNr", dossierNr, "", stukNr,
          s"Onderwerp dossier $dossierNr stuk $stukNr")
      }
      .toDF("zaak_id", "dossier_nr", "toevoeging", "stuk_nr", "onderwerp")
  }

  def dossiersDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0L until NDossiers.toLong)
      .map { i =>
        val dossierNr = DossierBase + i.toInt
        (dossierNr, Toevoegingen((i % 4).toInt), s"Dossier $dossierNr")
      }
      .toDF("dossier_nr", "toevoeging", "titel")
  }

  def documentsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0L until NDossiers.toLong * 3)
      .map(i => (DossierBase + (i % NDossiers).toInt, (i / NDossiers).toInt + 1, s"Stuk $i"))
      .toDF("dossier_nr", "volgnummer", "titel")
  }

  // ---- DuckDB oracle text (same rows, VALUES form) ----

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  val personsSql: String =
    persons.map { case (i, p) =>
      s"($i, ${q(p.persoon_id)}, ${q(p.roepnaam)}, ${q(p.tussenvoegsel)}, ${q(p.achternaam)}, ${q(p.fractie_id)})"
    }.mkString(
      "persons(idx, persoon_id, roepnaam, tussenvoegsel, achternaam, fractie_id) AS (VALUES ",
      ", ", ")")

  val personsExtSql: String =
    (persons ++ extraPersons).map { case (i, p) =>
      s"($i, ${q(p.persoon_id)}, ${q(p.roepnaam)}, ${q(p.tussenvoegsel)}, ${q(p.achternaam)}, ${q(p.fractie_id)})"
    }.mkString(
      "persons_ext(idx, persoon_id, roepnaam, tussenvoegsel, achternaam, fractie_id) AS (VALUES ",
      ", ", ")")

  val fractiesSql: String =
    fracties.map { case (i, f) =>
      s"($i, ${q(f.fractie_id)}, ${q(f.naam)}, ${q(f.afkorting)}, ${f.zetels_aantal})"
    }.mkString(
      "fracties(idx, fractie_id, naam, afkorting, zetels_aantal) AS (VALUES ",
      ", ", ")")

  val zakenSql: String =
    s"""zaken AS (
       |  SELECT 'Z' || CAST(dossier_nr AS VARCHAR) || '-' || CAST(stuk_nr AS VARCHAR) AS zaak_id,
       |         dossier_nr, '' AS toevoeging, stuk_nr,
       |         'Onderwerp dossier ' || CAST(dossier_nr AS VARCHAR) || ' stuk ' || CAST(stuk_nr AS VARCHAR) AS onderwerp
       |  FROM (SELECT CAST($DossierBase + i % $NDossiers AS INT) AS dossier_nr,
       |               CAST(i // $NDossiers + 1 AS INT) AS stuk_nr
       |        FROM (SELECT range AS i FROM range(${NDossiers * NStuk})))
       |  WHERE (dossier_nr - $DossierBase) % 5 <> 0)""".stripMargin

  val dossiersSql: String = {
    val toevCase = "CASE i % 4 " +
      Toevoegingen.zipWithIndex.map { case (t, i) => s"WHEN $i THEN '$t'" }.mkString(" ") +
      " END"
    s"""dossiers AS (
       |  SELECT CAST($DossierBase + i AS INT) AS dossier_nr,
       |         $toevCase AS toevoeging,
       |         'Dossier ' || CAST($DossierBase + i AS VARCHAR) AS titel
       |  FROM (SELECT range AS i FROM range($NDossiers)))""".stripMargin
  }

  val documentsSql: String =
    s"""docs AS (
       |  SELECT CAST($DossierBase + i % $NDossiers AS INT) AS dossier_nr,
       |         CAST(i // $NDossiers + 1 AS INT) AS volgnummer,
       |         'Stuk ' || CAST(i AS VARCHAR) AS titel
       |  FROM (SELECT range AS i FROM range(${NDossiers * 3})))""".stripMargin
}
