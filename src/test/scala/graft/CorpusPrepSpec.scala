package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Sampling, TextOps}

class CorpusPrepSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------- chunkWindows

  test("chunkWindows: handcrafted chunks, counts, and boundary content") {
    val df = Seq((1L, "abcdefghij")).toDF("id", "text") // len 10
    val got = TextOps.chunkWindows(df, "id", "text", window = 4, overlap = 1)
      .as[(Long, Int, String)].collect().sortBy(_._2)
    // stride 3: ceil((10-4)/3)=2 → 3 chunks at offsets 0,3,6
    assert(got.map(_._3).toSeq === Seq("abcd", "defg", "ghij"))
    // len 11 → 4th chunk is the short tail at offset 9
    val got2 = TextOps.chunkWindows(Seq((1L, "abcdefghijk")).toDF("id", "text"),
        "id", "text", 4, 1)
      .as[(Long, Int, String)].collect().sortBy(_._2)
    assert(got2.map(_._3).toSeq === Seq("abcd", "defg", "ghij", "jk"))
  }

  test("chunkWindows: reassembly property on generated docs") {
    val docs = graft.fixtures.PageGen.pages(40).zipWithIndex
      .map { case (p, i) => (i.toLong, p.text) }
    val window = 100
    val overlap = 25
    val stride = window - overlap
    val chunks = TextOps.chunkWindows(docs.toDF("id", "text"), "id", "text",
        window, overlap)
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    docs.foreach { case (id, t) =>
      val cs = chunks(id)
      // dropping each chunk's trailing overlap and concatenating
      // reconstructs the document exactly
      val rebuilt = cs.init.map(_.take(stride)).mkString + cs.last
      assert(rebuilt === t, s"doc $id")
      // every chunk except the last is exactly window-long
      cs.init.foreach(c => assert(c.length === window))
    }
  }

  test("chunkWindows: short and empty docs yield one chunk; bad params fail") {
    val got = TextOps.chunkWindows(
        Seq((1L, "hi"), (2L, "")).toDF("id", "text"), "id", "text", 10, 2)
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0, "hi"), (2L, 0, "")))
    intercept[IllegalArgumentException](
      TextOps.chunkWindows(Seq((1L, "x")).toDF("id", "text"), "id", "text", 4, 4))
  }

  // --------------------------------------------------------- capPerKey

  test("capPerKey: cap respected, selection deterministic across partitioning") {
    val rows = (0 until 300).map(i => (i.toLong, s"host${i % 5}"))
    val df = rows.toDF("id", "host")
    val a = Sampling.capPerKey(df.repartition(1), "host", "id", 10)
      .select($"id").as[Long].collect().toSet
    val b = Sampling.capPerKey(df.repartition(13), "host", "id", 10)
      .select($"id").as[Long].collect().toSet
    assert(a === b)
    assert(a.size === 50)
    val perHost = Sampling.capPerKey(df, "host", "id", 10)
      .groupBy($"host").count().as[(String, Long)].collect().toMap
    assert(perHost.values.forall(_ == 10L))
    // keys under the cap keep everything
    val small = Seq((1L, "h"), (2L, "h")).toDF("id", "host")
    assert(Sampling.capPerKey(small, "host", "id", 10).count() === 2)
  }

  // --------------------------------------------------------- shardAssign

  test("shardAssign: permutation deterministic, parallelism-invariant, positions dense per shard") {
    val df = (0L until 500L).toDF("id")
    val a = Sampling.shardAssign(df.repartition(1), "id", 8)
      .select($"id", $"shard", $"pos").as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = Sampling.shardAssign(df.repartition(13), "id", 8)
      .select($"id", $"shard", $"pos").as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq, "shuffle must not depend on partitioning")
    // every shard's positions are exactly 0..count-1
    a.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $sh positions not dense")
    }
    // seeded: a different seed is a different permutation
    val c = Sampling.shardAssign(df, "id", 8, seed = 7L)
      .select($"id", $"shard", $"pos").as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(c.toSeq !== a.toSeq)
    // roughly balanced (uniform hash): no shard 3x the mean
    val sizes = a.groupBy(_._2).values.map(_.length)
    assert(sizes.max < 3 * 500 / 8, s"shard skew: $sizes")
  }

  // ------------------------------------------------------ weightedSample

  test("weightedSample: deterministic, parallelism-invariant, weight-proportional") {
    val rows = (0L until 400L).map(i => (i, if (i < 40) 100.0 else 1.0))
    val df = rows.toDF("id", "w")
    val a = Sampling.weightedSample(df.repartition(1), "id", "w", 60)
      .select($"id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", 60)
      .select($"id").as[Long].collect().toSet
    assert(a === b, "sample must not depend on partitioning")
    assert(a.size === 60)
    // 40 heavy items carry 4000/4360 of the mass: they must dominate the
    // sample (expected ~37 of 60; demand a clear majority)
    assert(a.count(_ < 40L) >= 25, s"heavy items under-sampled: ${a.count(_ < 40L)}")
    // different seed, different sample; zero/negative weights never drawn
    val c = Sampling.weightedSample(df, "id", "w", 60, seed = 9L)
      .select($"id").as[Long].collect().toSet
    assert(c !== a)
    val withZero = (rows :+ ((999L, 0.0)) :+ ((998L, -1.0))).toDF("id", "w")
    val d = Sampling.weightedSample(withZero, "id", "w", 402)
      .select($"id").as[Long].collect().toSet
    assert(!d.contains(999L) && !d.contains(998L))
    assert(d.size === 400, "k beyond positive-weight population returns all of it")
  }

  // ----------------------------------------------------- strip_invisible

  test("strip_invisible: removes zero-widths, bidi controls, BOM, soft hyphen") {
    val dirty = "a\u200Bb\u200Cc\u200Dd\u2060e\u202Af\u202Eg\u2066h\u2069i\uFEFFj\u00ADk"
    val df = Seq((1L, dirty), (2L, "clean text"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    df.createOrReplaceTempView("inv_t")
    val got = spark.sql("SELECT id, strip_invisible(text) AS t FROM inv_t")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 === "abcdefghijk")
    assert(got(1)._2 === "clean text")
    assert(got(2)._2 === null)
  }

  test("strip_invisible: trojan-source bidi spoof is neutralized; plan stays codegen'd") {
    // displays as "user@good.com" but encodes a reversed .evil domain
    val spoof = "user@\u202Emoc.live\u202D.com"
    val out = Seq(spoof).toDF("text")
      .selectExpr("strip_invisible(text) AS t").as[String].head()
    assert(!out.contains("\u202E") && out === "user@moc.live.com")
    val plan = Seq("x").toDF("text").selectExpr("strip_invisible(text)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || !plan.contains("Fallback"),
      s"expression fell out of codegen:\n$plan")
  }
}
