package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Template

/** Per-host template-line removal (ops/Template.scala). */
class TemplateSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def mkDocs(nHosts: Int, perHost: Int) =
    (0 until nHosts).flatMap { h =>
      (0 until perHost).map { i =>
        val id = (h * perHost + i).toLong
        val body = (0 until 3).map(k => s"unique body $h-$i-$k")
        val lines = Vector(s"NAV host $h menu") ++ body ++
          Vector("", s"(c) host $h footer")
        (id, s"h$h.example", lines.mkString("\n"), body)
      }
    }

  test("template lines removed per host; unique body and blanks survive in order") {
    val docs = mkDocs(3, 10)
    val df = docs.map(d => (d._1, d._2, d._3)).toDF("doc_id", "host", "text")
    val got = Template.removeTemplateLines(df, "doc_id", "host", "text")
      .select($"doc_id", $"clean_text", $"n_removed")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size === docs.size)
    docs.foreach { case (id, _, _, body) =>
      val (_, clean, removed) = got(id)
      assert(clean === body.mkString("\n") + "\n", s"doc $id") // blank kept, footer gone
      assert(removed === 2L, s"doc $id removed count")
    }
  }

  test("sub-threshold repeats survive: minDocs and minDocFrac both gate") {
    // line shared by 2 of 10 docs on one host: passes minDocs=2 but fails frac=0.5
    val docs = (0 until 10).map { i =>
      val extra = if (i < 2) "\nsemi-rare line" else ""
      (i.toLong, "only.host", s"own line $i$extra")
    }
    val df = docs.toDF("doc_id", "host", "text")
    val out = Template.removeTemplateLines(df, "doc_id", "host", "text",
      minDocFrac = 0.5, minDocs = 2)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
    assert(out(0L) === "own line 0\nsemi-rare line")
    assert(out(5L) === "own line 5")
    // now lower frac so 2/10 crosses the bar -> removed
    val out2 = Template.removeTemplateLines(df, "doc_id", "host", "text",
      minDocFrac = 0.2, minDocs = 2)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
    assert(out2(0L) === "own line 0")
  }

  test("within-doc repeats of a template line each count in n_removed") {
    val docs = Seq(
      (1L, "h", "tmpl\nbody a\ntmpl"),
      (2L, "h", "tmpl\nbody b"),
      (3L, "h", "tmpl\nbody c"))
    val df = docs.toDF("doc_id", "host", "text")
    val got = Template.removeTemplateLines(df, "doc_id", "host", "text",
      minDocFrac = 0.5, minDocs = 2)
      .select($"doc_id", $"clean_text", $"n_removed")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === (("body a", 2L)))
    assert(got(2L) === (("body b", 1L)))
  }

  test("same line on different hosts is independent") {
    val docs = Seq(
      (1L, "a", "shared\nx1"), (2L, "a", "shared\nx2"), (3L, "a", "shared\nx3"),
      (4L, "b", "shared\ny1")) // only once on host b -> survives there
    val df = docs.toDF("doc_id", "host", "text")
    val got = Template.removeTemplateLines(df, "doc_id", "host", "text")
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toMap
    assert(got(1L) === "x1")
    assert(got(4L) === "shared\ny1")
  }

  test("plan shape: no broadcast of corpus-scale state, no driver collect") {
    val df = mkDocs(2, 6).map(d => (d._1, d._2, d._3)).toDF("doc_id", "host", "text")
    val plan = Template.removeTemplateLines(df, "doc_id", "host", "text")
      .queryExecution.executedPlan.toString
    // the reassembly aggregate must be an objectHashAggregate/sortAggregate over
    // hash-partitioned data -- i.e. distributed, not a CollectLimit/driver op
    assert(!plan.contains("CollectLimit"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).nonEmpty, plan)
  }
}
