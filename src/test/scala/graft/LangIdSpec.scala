package graft

import org.apache.spark.sql.functions._
import graft.ext.TextStats

/**
 * Trigram language-ID model quality. The driver corpus's `lang` labels
 * are uncorrelated with the document text (every doc draws from the
 * same English-ish vocabulary; the labels are plurality-`en` noise), so
 * accuracy there is meaningless for ANY model — the x_langid_trigram
 * oracle checks the computation exactly, and THIS suite checks model
 * quality on a corpus whose labels are real: generated multilingual
 * text in the five supported languages, split train/held-out.
 */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val langs = Seq("de", "en", "es", "fr", "zh")

  /** Phrase pools per language — ordinary sentences with the
    * characteristic function words and scripts of each language. */
  private val phrases: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "the quick brown fox jumps over the lazy dog",
      "data processing at scale is a hard problem for everyone",
      "she walked to the market and bought fresh bread this morning",
      "it is not clear that the plan will work as intended",
      "most of the students finished the exam before the deadline",
      "the weather in the mountains changes quickly during spring"),
    "de" -> Seq(
      "der schnelle braune fuchs springt über den faulen hund",
      "die verarbeitung großer datenmengen ist ein schweres problem",
      "sie ging zum markt und kaufte frisches brot am morgen",
      "es ist nicht klar dass der plan wie beabsichtigt funktioniert",
      "die meisten studenten beendeten die prüfung vor der frist",
      "das wetter in den bergen ändert sich im frühling schnell"),
    "es" -> Seq(
      "el rápido zorro marrón salta sobre el perro perezoso",
      "el procesamiento de datos a gran escala es un problema difícil",
      "ella fue al mercado y compró pan fresco esta mañana",
      "no está claro que el plan funcione como se pretende",
      "la mayoría de los estudiantes terminaron el examen antes del plazo",
      "el clima en las montañas cambia rápidamente durante la primavera"),
    "fr" -> Seq(
      "le rapide renard brun saute par dessus le chien paresseux",
      "le traitement des données à grande échelle est un problème difficile",
      "elle est allée au marché et a acheté du pain frais ce matin",
      "il n'est pas certain que le plan fonctionne comme prévu",
      "la plupart des étudiants ont terminé l'examen avant la date limite",
      "le temps dans les montagnes change vite au printemps"),
    "zh" -> Seq(
      "敏捷的棕色狐狸跳过了那只懒狗",
      "大规模数据处理是一个困难的问题",
      "她早上去市场买了新鲜的面包",
      "目前还不清楚这个计划是否会按预期进行",
      "大多数学生在截止日期之前完成了考试",
      "山里的天气在春天变化很快"))

  /** 30 docs per language: doc j concatenates 3 rotated phrases, so
    * train (even ids) and held-out (odd ids) see different mixes. */
  private def corpus = {
    val rows = for {
      (lang, li) <- langs.zipWithIndex
      j <- 0 until 30
      pool = phrases(lang)
    } yield {
      val text = (0 until 3).map(k => pool((j + k * 2) % pool.size)).mkString(" ")
      (li * 100L + j, lang, text)
    }
    rows.toDF("doc_id", "lang", "text")
  }

  test("native trigram hashes ≡ xxhash64(concat(c0,c1,c2)) over split-slice-zip") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "The quick brown Fox!"),
      (1L, "ab"),            // < 3 code points: empty
      (2L, ""),
      (3L, "der hund läuft über die straße"),  // non-ASCII BMP chars
      (4L, "aaa")
    ).toDF("doc_id", "text")
    val fused = docs.select($"doc_id", graft.plans.NativeFunctions
        .charTrigramHashes($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sqlSize = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.size(c)
    val cs = split(lower($"text"), "")
    val n = sqlSize(cs) - 2
    val ref = docs.where(sqlSize(cs) >= 3)
      .select($"doc_id", explode(arrays_zip(
        slice(cs, lit(1), n).as("c0"), slice(cs, lit(2), n).as("c1"),
        slice(cs, lit(3), n).as("c2"))).as("z"))
      .select($"doc_id", xxhash64(concat($"z.c0", $"z.c1", $"z.c2")).as("h"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSeq }
    fused(1L) shouldBe empty
    fused(2L) shouldBe empty
    Seq(0L, 3L, 4L).foreach { id => fused(id) shouldBe ref(id) }
  }

  test("trigram langid beats the marker heuristic on a real multilingual held-out half") {
    val docs = corpus
    val train = docs.where($"doc_id" % 2 === 0)
    val tri = TextStats.langIdTrigram(docs, train, langs)
    val joined = docs.select($"doc_id", $"lang",
        TextStats.langId($"text").as("heur_pred"))
      .join(tri, "doc_id")
      .where($"doc_id" % 2 === 1) // held-out half only
      .select($"lang", $"lang_pred", $"heur_pred")
      .collect()
    val n = joined.length
    n shouldBe 75L * 1 // 15 odd ids per language * 5 languages
    val triAcc = joined.count(r => r.getString(1) == r.getString(0)).toDouble / n
    val heurAcc = joined.count(r => r.getString(2) == r.getString(0)).toDouble / n
    withClue(s"trigram=$triAcc heuristic=$heurAcc: ") {
      triAcc should be >= heurAcc
      triAcc should be >= 0.95
    }
  }

  test("trigram langid edge semantics: sub-3-char docs predict und; ties break like the heuristic") {
    val docs = Seq((1L, "xx", "ab"), (2L, "xx", ""), (3L, "en", "the cat sat"))
      .toDF("doc_id", "lang", "text")
    val train = Seq((10L, "en", "the cat sat on the mat"),
      (11L, "de", "der hund ist nicht da"))
      .toDF("doc_id", "lang", "text")
    val out = TextStats.langIdTrigram(docs, train, Seq("de", "en"))
      .orderBy("doc_id").collect()
    out.map(_.getString(2)).toSeq shouldBe Seq("und", "und", "en")
    out.map(_.getLong(1)).toSeq shouldBe Seq(0L, 0L, 9L) // "the cat sat" = 11 chars -> 9 trigrams
  }

  test("fused kernel scoring ≡ scoreLangId, row for row") {
    // the serving-path contract: precomputed-contribution kernel
    // lookup reproduces the explode→join→rollup formulation EXACTLY
    // (same profile, same docs — including und rows and ties), so
    // x_langid_trigram's oracle argument transfers to the fused path
    val docs = corpus.unionByName(
      Seq((9001L, "xx", "ab"), (9002L, "xx", "")).toDF("doc_id", "lang", "text"))
    val profile = TextStats.langIdProfile(docs.where($"doc_id" % 2 === 0), langs)
    val slow = TextStats.scoreLangId(docs, profile, langs)
      .orderBy("doc_id").collect().toSeq
    val fast = TextStats.scoreLangIdFused(docs, profile, langs)
      .orderBy("doc_id").collect().toSeq
    fast shouldBe slow
  }
}
