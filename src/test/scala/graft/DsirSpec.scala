package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dsir

class DsirSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val dim = 1 << 12

  test("featureLogProbs == naive single-machine reference") {
    val texts = Seq("alpha beta gamma", "beta gamma delta", "alpha alpha beta")
    val df = texts.toDF("text")
    val got = Dsir.featureLogProbs(df, "text", dim, alpha = 0.5)
    // naive: accumulate hashCounts locally
    val acc = new Array[Long](dim)
    texts.foreach { t =>
      val (ix, c) = Dsir.hashCounts(t, dim)
      ix.indices.foreach(i => acc(ix(i)) += c(i))
    }
    val total = acc.sum
    val expected = acc.map(c => math.log(c + 0.5) - math.log(total + 0.5 * dim))
    assert(got.length === dim)
    got.indices.foreach(i => assert(got(i) === expected(i)))
  }

  test("model is bit-identical at 1 vs 7 partitions (exact Long counts)") {
    val texts = graft.fixtures.PageGen.pages(60).map(_.text)
    val a = Dsir.featureLogProbs(texts.toDF("text").repartition(1), "text", dim)
    val b = Dsir.featureLogProbs(texts.toDF("text").repartition(7), "text", dim)
    assert(java.util.Arrays.equals(a, b))
  }

  test("importanceWeights: docs matching the target score higher; resample enriches") {
    val targetVocab = "quantum tensor gradient lattice spinor"
    val proseVocab = "market garden bicycle weather dinner"
    // target corpus: pure target vocab
    val target = (0 until 40)
      .map(i => s"$targetVocab token$i $targetVocab").toDF("text")
    // raw corpus: even ids target-flavored, odd ids prose
    val raw = (0 until 200).map { i =>
      val base = if (i % 2 == 0) targetVocab else proseVocab
      (i.toLong, s"$base filler$i $base common words here")
    }.toDF("doc_id", "text")
    val logT = Dsir.featureLogProbs(target, "text", dim)
    val logR = Dsir.featureLogProbs(raw, "text", dim)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", logT, logR).cache()
    val mean = w.groupBy(($"doc_id" % 2 === 0).as("flavored"))
      .agg(avg($"weight")).as[(Boolean, Double)].collect().toMap
    assert(mean(true) > mean(false),
      s"target-flavored mean ${mean(true)} not above prose ${mean(false)}")
    // resample half: selected set should be mostly target-flavored
    val picked = Dsir.resampleTopK(w, "doc_id", k = 50)
    assert(picked.count() === 50)
    val flavored = picked.where($"doc_id" % 2 === 0).count()
    assert(flavored >= 45, s"only $flavored/50 selected docs are target-flavored")
  }

  test("resampleTopK is deterministic across re-runs and respects temperature") {
    val w = (0 until 100).map(i => (i.toLong, i / 100.0)).toDF("doc_id", "weight")
    val a = Dsir.resampleTopK(w, "doc_id", 10).select("doc_id").as[Long].collect().toSet
    val b = Dsir.resampleTopK(w, "doc_id", 10).select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // near-zero temperature → hard top-k by weight
    val hard = Dsir.resampleTopK(w, "doc_id", 10, temperature = 1e-9)
      .select("doc_id").as[Long].collect().toSet
    assert(hard === (90L until 100L).toSet)
  }

  test("fails loudly: empty corpus, bad dims, bad params") {
    val empty = Seq.empty[String].toDF("text")
    intercept[IllegalArgumentException](Dsir.featureLogProbs(empty, "text", dim))
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", new Array[Double](8), new Array[Double](16)))
    intercept[IllegalArgumentException](
      Dsir.resampleTopK(Seq((1L, 0.0)).toDF("doc_id", "weight"), "doc_id", 0))
  }
}
