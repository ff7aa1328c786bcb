package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Pii

class PiiSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("luhnValid: known-good and known-bad card numbers") {
    assert(Pii.luhnValid("4532015112830366"))      // Visa test number
    assert(Pii.luhnValid("4532 0151 1283 0366"))   // separators ignored
    assert(Pii.luhnValid("5425233430109903"))      // Mastercard test number
    assert(!Pii.luhnValid("4532015112830367"))     // checksum off by one
    assert(!Pii.luhnValid("1234567890123456"))
    assert(!Pii.luhnValid("123456789012"))         // too short (12 digits)
  }

  test("detect counts each PII type; random digit runs are not cards") {
    val rows = Seq(
      (1L, "contact alice@example.com or bob.smith+tag@mail.co.uk today"),
      (2L, "server at 192.168.0.1 and 8.8.8.8; not 999.1.1.1"),
      (3L, "call +14155550123 or 415-555-0123 now"),
      (4L, "card 4532015112830366 ok, order 1234567890123456 is not"),
      (5L, "clean text with nothing sensitive at all"),
      (6L, null.asInstanceOf[String]))
    val got = Pii.detect(rows.toDF("id", "text"), "id", "text")
      .as[(Long, Int, Int, Int, Int)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 2, 0, 0, 0)))
    assert(got(1) === ((2L, 0, 2, 0, 0)))
    assert(got(2) === ((3L, 0, 0, 2, 0)))
    assert(got(3) === ((4L, 0, 0, 0, 1)))
    assert(got(4) === ((5L, 0, 0, 0, 0)))
    assert(got(5)._1 === 6L)
  }

  test("redact masks everything detect counts, leaves the rest byte-identical") {
    val df = Seq(
      (1L, "mail a@b.io from 10.0.0.7 call +491701234567 card 4532 0151 1283 0366 order 1234567890123456 end"))
      .toDF("id", "text")
    val red = Pii.redact(df, "id", "text").select($"text", $"pii_found")
      .as[(String, Boolean)].head()
    assert(red._2)
    assert(red._1 ===
      "mail <EMAIL> from <IP> call <PHONE> card <CARD> order 1234567890123456 end")
    val clean = Seq((2L, "no pii here")).toDF("id", "text")
    val kept = Pii.redact(clean, "id", "text").select($"text", $"pii_found")
      .as[(String, Boolean)].head()
    assert(kept === (("no pii here", false)))
  }

  test("detection is a shuffle-free stateless map (plan shape)") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val plan = Pii.detect(df, "id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("ipv4 octet bounds: 256+ rejected, 0 and 255 accepted") {
    val got = Pii.detect(Seq((1L, "0.0.0.0 255.255.255.255 256.1.1.1 1.2.3.999"))
      .toDF("id", "text"), "id", "text")
      .select($"ipv4s").as[Int].head()
    assert(got === 2)
  }
}
