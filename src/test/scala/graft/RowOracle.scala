package graft

import graft.functions.FuzzRatio
import graft.synth.Dict

/** Row-at-a-time reference oracle: re-implements the reference pipeline's
  * per-item semantics (mention regexes, name scoring with first-best
  * selection, zaak tier cascade, A→B→A interruption scan, vote extraction,
  * triple emission) in plain Scala collections — an independent code path
  * from BOTH the Spark pipeline and the DuckDB SQL oracle, used to measure
  * P/R of the emitted (subj, pred, obj) set (north rule: ≥ 0.95).
  */
object RowOracle {

  final case class T(conv: String, idx: Int, text: String)

  private val procedural =
    "\\b(opening|sluiting|aanvang|einde vergadering|geschorst)\\b".r
  private val woordAan = "het woord aan (.+)$".r.unanchored
  private val spreekt = "^Mevrouw (.+) spreekt over".r.unanchored
  private val inter = "^De heer (.+) interrumpeert".r.unanchored
  private val reactie = "^(.+) vraagt een reactie".r.unanchored
  private val dossierRe = "dossier (\\d+(?:-[A-Za-z0-9]+)?)".r.unanchored
  private val stukRe = "nr\\. (\\d+)".r.unanchored
  private val voteRe = "^De fractie (.+) stemt ".r.unanchored
  private val voteKindRe = " stemt (voor|tegen|onthouding)$".r.unanchored
  private val dossierSplit = "^(\\d+)(?:[-\\s]?([A-Za-z0-9]+))?$".r

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def nonProcedural(t: T): Boolean =
    procedural.findFirstIn(t.text.toLowerCase).isEmpty

  /** (kind, v_first, v_last) per the extraction priority order. */
  def speakerMention(text: String): Option[(String, String, String)] = {
    val full = woordAan.findFirstMatchIn(text).map(_.group(1))
      .orElse(reactie.findFirstMatchIn(text).map(_.group(1)))
    val kind =
      if (woordAan.findFirstMatchIn(text).isDefined) Some("woord_aan")
      else if (spreekt.findFirstMatchIn(text).isDefined) Some("spreekt")
      else if (inter.findFirstMatchIn(text).isDefined) Some("interrumpeert")
      else if (reactie.findFirstMatchIn(text).isDefined) Some("reactie")
      else None
    kind.flatMap { k =>
      val (vf, vl) = full match {
        case Some(f) if f.nonEmpty =>
          val i = f.indexOf(' ')
          if (i > 0) (f.substring(0, i), f.substring(i + 1)) else ("", "")
        case _ =>
          val sur = spreekt.findFirstMatchIn(text).map(_.group(1))
            .orElse(inter.findFirstMatchIn(text).map(_.group(1))).getOrElse("")
          ("", sur)
      }
      if (vl.nonEmpty) Some((k, vf, vl)) else None
    }
  }

  /** Reference name scoring + deterministic best-of (score desc, id asc). */
  def linkPerson(vFirst: String, vLast: String): Option[(String, String, Int)] = {
    val persons = Dict.persons.map(_._2)
    def full(p: graft.model.Person) =
      (if (p.tussenvoegsel.nonEmpty) p.tussenvoegsel + " " else "") + p.achternaam
    val lastL = vLast.toLowerCase
    val exactBlock = persons.filter(p =>
      lastL == p.achternaam.toLowerCase || lastL == full(p).toLowerCase)
    val pool =
      if (exactBlock.nonEmpty) exactBlock
      else {
        val lastToken = lastL.split("\\s+").last
        persons.filter(p => p.achternaam.toLowerCase.contains(lastToken))
      }
    val scored = pool.map { p =>
      val surname =
        if (lastL == p.achternaam.toLowerCase || lastL == full(p).toLowerCase) 60
        else math.max(math.max(
          FuzzRatio.ratio(lastL, p.achternaam.toLowerCase),
          FuzzRatio.ratio(lastL, full(p).toLowerCase)) - 20, 0)
      val first =
        if (vFirst.isEmpty) 0
        else {
          val best = math.max(
            FuzzRatio.ratio(vFirst.toLowerCase, p.roepnaam.toLowerCase),
            FuzzRatio.ratio(vFirst.toLowerCase, p.voornamen.toLowerCase))
          if (best >= 75) 40 else if (best >= 60) 20 else 0
        }
      (p.persoon_id, p.fractie_id, math.min(surname + first, 100))
    }.filter(_._3 >= 60)
    scored.sortBy { case (id, _, s) => (-s, id) }.headOption
  }

  /** Zaak tier cascade over the Dict-generated dims. */
  def linkZaak(dnr: Int, snr: Option[Int]): Option[(String, String)] = {
    val zaakExists = snr.exists(s =>
      dnr >= Dict.DossierBase && dnr < Dict.DossierBase + Dict.NDossiers &&
        (dnr - Dict.DossierBase) % 5 != 0 && s >= 1 && s <= Dict.NStuk)
    val dossierExists = dnr >= Dict.DossierBase && dnr < Dict.DossierBase + Dict.NDossiers
    val docExists = dossierExists && snr.exists(s => s >= 1 && s <= 3)
    if (zaakExists) Some((s"Z$dnr-${snr.get}", "EXACT"))
    else if (dossierExists) Some((s"D$dnr", "FALLBACK"))
    else if (docExists) Some((s"DOC$dnr-${snr.get}", "FALLBACK"))
    else None
  }

  /** The full expected canonical triple set. */
  def canonicalTriples(turns: Seq[T]): Set[(String, String, String)] = {
    val active = turns.filter(nonProcedural)
    val linked = active.flatMap { t =>
      speakerMention(t.text).flatMap { case (_, vf, vl) =>
        linkPerson(vf, vl).map { case (pid, _, _) => (t.conv, t.idx, pid) }
      }
    }
    val zaken = active.flatMap { t =>
      dossierRe.findFirstMatchIn(t.text).flatMap { m =>
        dossierSplit.findFirstMatchIn(m.group(1)).flatMap { dm =>
          val dnr = dm.group(1).toInt
          val snr = stukRe.findFirstMatchIn(t.text).map(_.group(1).toInt)
          linkZaak(dnr, snr).map { case (eid, mt) => (t.conv, t.idx, eid, mt) }
        }
      }
    }
    val votes = active.flatMap { t =>
      for {
        f <- voteRe.findFirstMatchIn(t.text).map(_.group(1))
        v <- voteKindRe.findFirstMatchIn(t.text).map(_.group(1))
        fid <- Dict.fracties.find(_._2.naam == f).map(_._2.fractie_id)
      } yield (t.conv, t.idx, f, v, fid)
    }

    val spokeIn = linked.map { case (c, _, p) => (s"persoon:$p", "SPOKE_IN", s"conv:$c") }
    val contains = linked.map { case (c, _, p) => (s"conv:$c", "CONTAINS_SPEAKER", s"persoon:$p") }
    val discusses = for {
      (c, i, p) <- linked
      (zc, zi, eid, mt) <- zaken if zc == c && zi == i
    } yield (s"persoon:$p",
      if (mt == "EXACT") "DISCUSSES_ZAAK" else "DISCUSSES_DOSSIER", s"zaak:$eid")
    val containsZaak = zaken.map { case (c, _, eid, _) => (s"conv:$c", "CONTAINS_ZAAK", s"zaak:$eid") }
    val memberOf = Dict.persons.map { case (_, p) =>
      (s"persoon:${p.persoon_id}", "MEMBER_OF", s"fractie:${p.fractie_id}") }
    val voteTriples = votes.flatMap { case (c, i, f, v, fid) =>
      val vk = "vote:" + md5(s"$c|$i|$f|$v")
      Seq((s"conv:$c", "HAS_FRACTIE_VOTE", vk), (vk, "CAST_BY_FRACTIE", s"fractie:$fid"))
    }
    // A→B(→A) interruption scan per conversation
    val interTriples = linked.groupBy(_._1).toSeq.flatMap { case (c, rows) =>
      val seq = rows.sortBy(_._2).map(_._3)
      seq.indices.flatMap { i =>
        if (i == 0 || seq(i - 1) == seq(i)) Nil
        else {
          val withResp = i + 1 < seq.length && seq(i + 1) == seq(i - 1)
          Seq(
            (s"persoon:${seq(i)}", "INTERRUPTED_IN", s"conv:$c"),
            (s"persoon:${seq(i - 1)}", "WAS_INTERRUPTED_IN", s"conv:$c")) ++
            (if (withResp) Seq((s"persoon:${seq(i - 1)}", "RESPONDED_IN", s"conv:$c")) else Nil)
        }
      }
    }
    // canonicalization: every mention cluster contains its entity, so
    // MATCHES_PERSOON edges collapse to dropped self-loops; everything else
    // rewrites to itself
    (spokeIn ++ contains ++ discusses ++ containsZaak ++ memberOf ++
      voteTriples ++ interTriples).toSet
  }
}
