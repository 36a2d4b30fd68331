package graft

import org.apache.spark.sql.functions._
import graft.ext.PiiScan
import graft.functions.FakeData

/**
 * PII/credential scanner specs: the generator↔detector roundtrip (every
 * fake sensitive-data provider must trip its detector — the engine's
 * two halves agree on what "sensitive" looks like) plus negative cases.
 */
class PiiSpec extends SparkSpec {

  import spark.implicits._

  /** provider -> the detector its output must trip. */
  val providerToDetector: Seq[(String, String)] = Seq(
    "itin" -> "itin",
    "aws_creds" -> "aws_access_key",
    "aws_creds" -> "aws_secret",
    "slack_creds" -> "slack_token",
    "github_creds" -> "github_token",
    "facebook_creds" -> "facebook_secret",
    "cve" -> "cve",
    "iban" -> "iban",
    "ssn" -> "ssn",
    "email" -> "email",
    "phone_number" -> "phone",
    "credit_card_full" -> "credit_card",
    "rsa" -> "private_key",
    "dsa" -> "private_key",
    "ec" -> "private_key",
    "pgp" -> "private_key",
    "profile" -> "ssn",
    "profile" -> "email")

  test("every sensitive provider is caught by its detector (20 seeds each)") {
    for (((provider, detector), i) <- providerToDetector.zipWithIndex) {
      val pat = PiiScan.detectorMap(detector)
      val texts = (0 until 20).map { s =>
        FakeData.generate(provider, new java.util.Random(1000L * i + s))
      }
      val df = texts.toDF("text")
      val misses = df
        .where(PiiScan.matchCount(col("text"), pat) === 0)
        .count()
      withClue(s"$provider -> $detector: sample='${texts.head.take(80)}'") {
        misses shouldBe 0L
      }
    }
  }

  test("clean text does not trip detectors") {
    val clean = Seq(
      "the quick brown fox jumps over the lazy dog",
      "totals 1234 and 99.5 percent growth in 2026",
      "call extension 555 room 1234",
      "version 1.2.3 released")
    val df = PiiScan.scan(clean.toDF("text"))
    // "version 1.2.3" must not look like an IPv4 (only 3 octets)
    df.agg(sum("pii_total")).head().getLong(0) shouldBe 0L
  }

  test("scan counts multiple distinct hits in one document") {
    val doc = "reach me at a.b@example.com or (555) 123-4567, ssn 123-45-6789"
    val row = PiiScan.scan(Seq(doc).toDF("text")).head()
    row.getAs[Long]("pii_email") shouldBe 1L
    row.getAs[Long]("pii_phone") shouldBe 1L
    row.getAs[Long]("pii_ssn") shouldBe 1L
    row.getAs[Long]("pii_total") shouldBe 3L
    row.getAs[Int]("has_pii") shouldBe 1
  }

  test("findings long form emits only firing detectors") {
    val df = Seq(
      (1L, "ssn 123-45-6789 and 987-65-4321"), // 2 ssn... second is itin-space? 9xx-65 => not itin (needs 7x); area 9 excluded from ssn
      (2L, "nothing here")).toDF("doc_id", "text")
    val f = PiiScan.findings(df).collect()
    f.map(_.getLong(0)).distinct shouldBe Array(1L)
    val ssnRow = f.find(_.getString(1) == "ssn").get
    ssnRow.getLong(2) shouldBe 1L // 987-65-4321 matches neither ssn ([0-8]..) nor itin (needs -7x-)
  }

  test("itin space is disjoint from ssn space") {
    val df = Seq("911-70-1234 vs 811-70-1234").toDF("text")
    val row = PiiScan.scan(df).head()
    row.getAs[Long]("pii_itin") shouldBe 1L
    row.getAs[Long]("pii_ssn") shouldBe 1L
  }

  test("redact removes every detector match and leaves clean text intact") {
    val df = Seq(
      (1L, "ssn 123-45-6789 card 1234 5678 9012 3456 mail a.b@example.com"),
      (2L, "perfectly clean sentence")).toDF("doc_id", "text")
    val red = PiiScan.redact(df)
    // re-scanning the redacted text finds nothing: redaction can never
    // create a new match (the token has no digits), and it removed all
    PiiScan.scan(red, "redacted")
      .agg(sum("pii_total")).head().getLong(0) shouldBe 0L
    val r1 = red.where($"doc_id" === 1).head().getAs[String]("redacted")
    r1 should include("[REDACTED:ssn]")
    r1 should include("[REDACTED:credit_card]")
    r1 should include("[REDACTED:email]")
    red.where($"doc_id" === 2).head()
      .getAs[String]("redacted") shouldBe "perfectly clean sentence"
  }
}
