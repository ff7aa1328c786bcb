package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.PageGen
import graft.kernel.HtmlStream

/** The native `extract_main_text` Catalyst expression: registered via
  * SparkSessionExtensions (Extraction.configure sets
  * spark.sql.extensions), equal to the kernel on every fixture, null-safe,
  * and codegen'd (the plan stays inside WholeStageCodegen — no
  * CodegenFallback marker).
  */
class FunctionsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val htmls = PageGen.pages(120)
    .filterNot(p => p.html.take(5).sameElements("%PDF-".getBytes))

  test("SQL extract_main_text == kernel over fixtures") {
    val df = htmls.map(p => (p.url, p.html)).toDF("url", "html")
    df.createOrReplaceTempView("pages_f")
    val got = spark.sql(
      "SELECT url, extract_main_text(html) AS t FROM pages_f")
      .as[(String, String)].collect().toMap
    htmls.foreach { p =>
      assert(got(p.url) === HtmlStream.extract(p.html).text, p.url)
    }
  }

  test("null input → null output; non-binary input rejected at analysis") {
    val df = Seq((1, Option.empty[Array[Byte]]),
      (2, Some("<p>hello world of tests with plenty and plenty of words to classify very clearly as a real content block here</p>".getBytes)))
      .toDF("id", "html")
    val out = df.select($"id", expr("extract_main_text(html)").as("t"))
      .as[(Int, Option[String])].collect().toMap
    assert(out(1).isEmpty)
    assert(out(2).exists(_.contains("hello world")))

    val err = intercept[Exception] {
      Seq(1).toDF("x").select(expr("extract_main_text(x)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("binary") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("SQL lang_id == kernel Lang.detect and columnar TextOps.langId; codegen'd") {
    val texts = PageGen.pages(150).map(_.text)
    // keyed compare (repartition reorders rows)
    val df = texts.zipWithIndex.map(_.swap).toDF("i", "text").repartition(2)
    val got = df.selectExpr("i", "lang_id(text)").as[(Int, String)].collect()
      .sortBy(_._1).map(_._2)
    assert(got.toSeq === texts.map(graft.kernel.Lang.detect))
    val columnar = df.select($"i", graft.ops.TextOps.langId($"text"))
      .as[(Int, String)].collect().sortBy(_._1).map(_._2)
    assert(got.toSeq === columnar.toSeq)
    // null-safe + codegen (no CodegenFallback marker in the executed plan)
    val withNull = Seq(Option("the and of to in is that"), None).toDF("text")
    assert(withNull.selectExpr("lang_id(text)").as[Option[String]].collect().toSet
      === Set(Some("en"), None))
    val q = df.selectExpr("lang_id(text) AS l")
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [lang_id("))
  }

  test("SQL bpe_count == kernel Bpe.countTokens, null-safe, codegen'd") {
    val texts = PageGen.pages(80).map(_.text)
    val df = texts.zipWithIndex.map(_.swap).toDF("i", "text").repartition(2)
    val got = df.selectExpr("i", "bpe_count(text)").as[(Int, Int)].collect()
      .sortBy(_._1).map(_._2)
    assert(got.toSeq === texts.map(graft.kernel.Bpe.countTokens))
    val withNull = Seq(Option("the rain in spain"), None).toDF("text")
    assert(withNull.selectExpr("bpe_count(text)").as[Option[Int]].collect().toSet
      === Set(Some(graft.kernel.Bpe.countTokens("the rain in spain")), None))
    val q = df.selectExpr("bpe_count(text) AS n")
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project [bpe_count("))
  }

  test("expression compiles into WholeStageCodegen (no fallback)") {
    // repartition prevents ConvertToLocalRelation from constant-folding
    // the whole query at optimization time
    val df = htmls.take(5).map(p => Tuple1(p.html)).toDF("html").repartition(2)
    val q = df.select(expr("length(extract_main_text(html))"))
    q.collect() // AQE finalizes the plan only at execution
    val plan = q.queryExecution.executedPlan.toString
    // AQE's toString renders WholeStageCodegen nodes as a "*(id)" prefix
    assert(plan.contains("*(1) Project [length(extract_main_text("), plan)
    // filter fusion: a predicate over the expression still collects fine
    val n = df.where(expr("length(extract_main_text(html)) > 0")).count()
    assert(n === 5)
  }

  test("nfc_normalize: composes, is idempotent, zero-copies NFC input, codegen'd") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      "cafe\u0301",          // e + COMBINING ACUTE -> composed e-acute
      "caf\u00e9",           // already composed
      "A\u030aB",            // A + COMBINING RING -> A-ring
      "plain ascii text",
      "s\u0323\u0307",        // multi-mark composition -> s with dot below+above
      "emoji \ud83d\ude00 pass-through").toDF("t").repartition(2)
    val got = rows.selectExpr("nfc_normalize(t) AS n").as[String].collect().toSet
    val want = rows.as[String].collect()
      .map(s => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)).toSet
    assert(got === want)
    assert(got.contains("caf\u00e9") && got.contains("\u00c5B") && got.contains("\u1e69"))
    // idempotence via SQL double application
    val twice = rows.selectExpr("nfc_normalize(nfc_normalize(t)) AS n").as[String].collect().toSet
    assert(twice === want)
    // null propagation
    assert(Seq[Option[String]](None).toDF("t")
      .selectExpr("nfc_normalize(t)").first().isNullAt(0))
    // inside WholeStageCodegen (no fallback)
    val q = rows.selectExpr("length(nfc_normalize(t))")
    q.collect()
    assert(q.queryExecution.executedPlan.toString
      .contains("*(1) Project [length(nfc_normalize("), q.queryExecution.executedPlan.toString)
  }
}
