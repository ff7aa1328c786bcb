package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Cluster, Dedup}

class ClusterSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // three well-separated 8-dim blobs (deterministic): centers at
  // (±20, …) corners, σ = 0.5 — inter-center distance >> intra spread,
  // so the true partition is unambiguous
  private lazy val blobs = {
    val r = new scala.util.Random(11)
    val centers = Array(
      Array.fill(8)(20.0), Array.fill(8)(-20.0),
      Array.tabulate(8)(j => if (j % 2 == 0) 20.0 else -20.0))
    (0 until 240).map { i =>
      val c = i % 3
      val v = centers(c).map(x => (x + 0.5 * r.nextGaussian()).toFloat)
      (i.toLong, c, v)
    }
  }
  private lazy val blobDf = blobs.map { case (id, _, v) => (id, v) }
    .toDF("vec_id", "embedding").cache()

  test("kmeans recovers planted blobs with purity 1.0 and converges") {
    val m = Cluster.kmeansFit(blobDf, "vec_id", "embedding", k = 3, maxIter = 15)
    assert(m.converged, s"did not converge (shift=${m.shift} after ${m.iterations})")
    assert(m.centroids.length === 3)
    val assigned = Cluster.assignClusters(blobDf, "vec_id", "embedding", m.centroids)
      .as[(Long, Int)].collect().toMap
    // purity: each true blob maps to exactly one fitted cluster
    val byTrue = blobs.groupBy(_._2).map { case (tc, rows) =>
      tc -> rows.map(r => assigned(r._1)).distinct
    }
    byTrue.foreach { case (tc, fitted) =>
      assert(fitted.size === 1, s"true blob $tc split across clusters $fitted")
    }
    assert(byTrue.values.flatten.toSet.size === 3, "two blobs merged")
    // each centroid sits within 3σ/√n of its blob's true center
    val trueCenters = Map(
      0 -> Array.fill(8)(20.0), 1 -> Array.fill(8)(-20.0),
      2 -> Array.tabulate(8)(j => if (j % 2 == 0) 20.0 else -20.0))
    byTrue.foreach { case (tc, fitted) =>
      val c = m.centroids(fitted.head)
      val d = math.sqrt(trueCenters(tc).zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d < 1.0, s"centroid for blob $tc off by $d")
    }
  }

  test("kmeans is bit-deterministic across parallelism (1 vs 7 partitions)") {
    val m1 = Cluster.kmeansFit(blobDf.repartition(1), "vec_id", "embedding", k = 3)
    val m7 = Cluster.kmeansFit(blobDf.repartition(7), "vec_id", "embedding", k = 3)
    assert(m1.iterations === m7.iterations)
    m1.centroids.zip(m7.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b),
        "centroids drifted across partitioning - FP fold order is leaking")
    }
  }

  test("kmeans with k > distinct points keeps empty-cluster centroids") {
    val tiny = Seq((1L, Array(1f, 1f)), (2L, Array(1f, 1f)), (3L, Array(9f, 9f)))
      .toDF("vec_id", "embedding")
    val m = Cluster.kmeansFit(tiny, "vec_id", "embedding", k = 2, maxIter = 5)
    // trainCentroids clamps init to sample size; both survive with finite values
    assert(m.centroids.forall(_.forall(x => !x.isNaN && !x.isInfinite)))
  }

  // planted near-identical embedding pairs (the SemDeDup scenario)
  private lazy val dupCorpus = {
    val r = new scala.util.Random(7)
    val base = Seq.tabulate(90)(i => (i.toLong, Array.fill(16)(r.nextGaussian().toFloat)))
    val dups = base.take(30).map { case (id, v) =>
      (1000L + id, v.map(x => x + 0.005f * r.nextGaussian().toFloat))
    }
    (base ++ dups).toDF("vec_id", "embedding").cache()
  }

  test("semanticDupPairs with k=1 equals exact all-pairs cosine") {
    val exact = Dedup.cosinePairsExact(dupCorpus, "vec_id", "embedding", 0.95)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(exact.size >= 30)
    val sem = Cluster.semanticDupPairs(dupCorpus, "vec_id", "embedding", 0.95,
      k = 1, maxCluster = 10000)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(sem === exact, "single-cluster SemDeDup must equal the exact oracle")
  }

  test("semanticDedup: survivors equal exact-cosine CC oracle at k=1; high recall at k=6") {
    val exactPairs = Dedup.cosinePairsExact(dupCorpus, "vec_id", "embedding", 0.95)
    val cc = Dedup.connectedComponents(exactPairs)
    val losers = cc.where($"id" =!= $"cluster").select($"id").as[Long].collect().toSet
    val oracle = dupCorpus.select($"vec_id").as[Long].collect().toSet -- losers

    val k1 = Cluster.semanticDedup(dupCorpus, "vec_id", "embedding", 0.95,
      k = 1, maxCluster = 10000)
      .select($"vec_id").as[Long].collect().toSet
    assert(k1 === oracle)

    val k6 = Cluster.semanticDedup(dupCorpus, "vec_id", "embedding", 0.95,
      k = 6, maxCluster = 10000)
      .select($"vec_id").as[Long].collect().toSet
    // clustered recall: every removed doc is a true duplicate (precision
    // exact by construction), and the split-pair miss rate stays small
    assert(oracle.subsetOf(k6), "SemDeDup must never remove a non-duplicate")
    val missed = k6.size - oracle.size
    info(s"k=6 SemDeDup missed $missed of ${losers.size} duplicates (cluster-split pairs)")
    assert(missed <= losers.size / 5,
      s"cluster-split miss rate too high: $missed of ${losers.size}")
  }

  test("assignment plan is shuffle-free; pair search never goes cartesian") {
    val m = Cluster.kmeansFit(blobDf, "vec_id", "embedding", k = 3)
    val assigned = Cluster.assignClusters(blobDf, "vec_id", "embedding", m.centroids)
    assigned.collect()
    val aPlan = assigned.queryExecution.executedPlan.toString
    assert(!aPlan.contains("Exchange"),
      "nearest-centroid assignment must not shuffle:\n" + aPlan.take(600))
    val pairs = Cluster.semanticDupPairs(dupCorpus, "vec_id", "embedding", 0.95,
      k = 4, maxCluster = 10000)
    val pPlan = pairs.queryExecution.executedPlan.toString
    assert(!pPlan.contains("CartesianProduct") && !pPlan.contains("BroadcastNestedLoop"),
      "within-cluster pairs must stay an equi-join:\n" + pPlan.take(600))
  }

  test("semanticDupPairs fails loudly when a cluster exceeds maxCluster") {
    val e = intercept[IllegalArgumentException] {
      Cluster.semanticDupPairs(dupCorpus, "vec_id", "embedding", 0.95,
        k = 1, maxCluster = 10)
    }
    assert(e.getMessage.contains("maxCluster"))
  }
}
