package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Kll
import graft.ops.Stats

class KllSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** max over a grid of ranks of |true_rank(estimate) - q| */
  private def maxRankError(sorted: Array[Double], s: Kll): Double = {
    val n = sorted.length
    (1 to 99).map { p =>
      val q = p / 100.0
      val est = s.quantile(q)
      // true normalized rank of the estimate (count <= est)
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (sorted(mid) <= est) lo = mid + 1 else hi = mid
      }
      math.abs(lo.toDouble / n - q)
    }.max
  }

  test("below capacity the sketch is exact") {
    val s = Kll(200)
    val vals = (1 to 150).map(_.toDouble)
    scala.util.Random.shuffle(vals).foreach(s.update)
    assert(s.n === 150L)
    assert(s.quantile(0.0) === 1.0)
    assert(s.quantile(1.0) === 150.0)
    assert(s.quantile(0.5) === 75.0)
    (1 to 99).foreach { p =>
      assert(s.quantile(p / 100.0) === math.ceil(150.0 * p / 100).toDouble)
    }
  }

  test("rank-error bound holds across distributions, including sorted adversaries") {
    val n = 100000
    val rnd = new scala.util.Random(7)
    val uniform = Array.fill(n)(rnd.nextDouble())
    val ascending = Array.tabulate(n)(_.toDouble)
    val descending = ascending.reverse
    val zipfish = Array.fill(n)(math.pow(rnd.nextDouble(), 8) * 1e6)
    val dupes = Array.fill(n)((rnd.nextInt(50) * 10).toDouble)
    for ((name, data) <- Seq("uniform" -> uniform, "ascending" -> ascending,
      "descending" -> descending, "zipfish" -> zipfish, "duplicates" -> dupes)) {
      val s = Kll(200)
      data.foreach(s.update)
      assert(s.n === n.toLong)
      val err = maxRankError(data.sorted, s)
      assert(err <= 0.03, f"$name: rank error $err%.4f exceeds bound for k=200")
    }
  }

  test("merge of shard sketches keeps the bound; weight conserved exactly") {
    val n = 120000
    val rnd = new scala.util.Random(11)
    val data = Array.fill(n)(rnd.nextGaussian() * 100)
    val shards = data.grouped(n / 12).map { chunk =>
      val s = Kll(200); chunk.foreach(s.update); s
    }.toSeq
    val merged = shards.reduceLeft((a, b) => a.merge(b))
    assert(merged.n === n.toLong, "merge must conserve n exactly")
    assert(merged.rank(data.max) === 1.0, "total weight must equal n")
    val err = maxRankError(data.sorted, merged)
    assert(err <= 0.035, f"merged rank error $err%.4f exceeds bound")
  }

  test("deterministic: same insertion sequence -> identical bytes; round-trip preserves answers") {
    val data = (0 until 50000).map(i => (i * 2654435761L % 100000).toDouble)
    val a = Kll(128); data.foreach(a.update)
    val b = Kll(128); data.foreach(b.update)
    assert(a.toBytes.toSeq === b.toBytes.toSeq, "sketch bytes must be deterministic")
    val c = Kll.fromBytes(a.toBytes)
    (1 to 19).foreach { p =>
      assert(c.quantile(p / 20.0) === a.quantile(p / 20.0))
    }
    assert(c.n === a.n)
    intercept[IllegalArgumentException](a.merge(Kll(64)))
    intercept[IllegalArgumentException](a.update(Double.NaN))
  }

  test("Stats: corpus sketch via treeAggregate matches exact within bound; per-key + merge tables") {
    val n = 60000
    val rows = (0 until n).map { i =>
      (i.toLong, if (i % 3 == 0) "en" else "de",
        (math.sin(i * 0.7) * 500 + 500) * (1 + i % 7))
    }
    val df = rows.toDF("id", "lang", "v").repartition(16).cache()
    val s = Stats.kllSketch(df, "v", k = 200)
    assert(s.n === n.toLong)
    val exact = rows.map(_._3).toArray.sorted
    assert(maxRankError(exact, s) <= 0.035)
    // per-key table + quantile expansion
    val byKey = Stats.kllByKey(df, "lang", "v", k = 200).cache()
    assert(byKey.count() === 2)
    val qs = Stats.quantilesFromSketches(byKey, "lang", Seq(0.5, 0.9))
      .as[(String, Long, Double, Double)].collect()
    assert(qs.length === 4)
    val en = rows.filter(_._2 == "en").map(_._3).toArray.sorted
    val enMedian = qs.find(r => r._1 == "en" && r._2 > 0 && r._3 == 0.5).get._4
    val trueRank = en.count(_ <= enMedian).toDouble / en.length
    assert(math.abs(trueRank - 0.5) <= 0.035, s"per-key median drift: $trueRank")
    // incremental: two batch tables merge to the same answer shape
    val (h1, h2) = rows.splitAt(n / 2)
    val t1 = Stats.kllByKey(h1.toDF("id", "lang", "v"), "lang", "v", 200)
    val t2 = Stats.kllByKey(h2.toDF("id", "lang", "v"), "lang", "v", 200)
    val mergedTbl = Stats.mergeSketchTables(t1, t2, "lang")
    val ns = mergedTbl.select($"lang", $"n").as[(String, Long)].collect().toMap
    assert(ns.values.sum === n.toLong, "merged table must conserve n")
    val mq = Stats.quantilesFromSketches(mergedTbl, "lang", Seq(0.5))
      .where($"lang" === "en").select($"value").as[Double].head()
    val mRank = en.count(_ <= mq).toDouble / en.length
    assert(math.abs(mRank - 0.5) <= 0.035, s"merged-table median drift: $mRank")
    df.unpersist()
  }
}
