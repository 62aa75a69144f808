package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Pca
import SparkFixture.{sf, spark}

/** PCA family: exact covariance replay, eigenpair quality, and the
  * projection's variance accounting — the gate for the rows-only
  * emb_pca / emb_pca_project entries (emb_cov is oracle-hashed).
  */
class PcaSpec extends AnyFunSuite {

  private val scale = 16777216.0

  private lazy val vecs: Array[Array[Double]] =
    Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray)

  test("covariance equals the quantized driver-side replay, diag nonneg") {
    val n = vecs.length
    val d = Pca.Dim
    def cell(j: Int, k: Int): Double = {
      val sq = vecs.foldLeft(0L)((a, v) => a + math.floor(v(j) * v(k) * scale).toLong)
      val mj = vecs.foldLeft(0L)((a, v) => a + math.floor(v(j) * scale).toLong)
      val mk = vecs.foldLeft(0L)((a, v) => a + math.floor(v(k) * scale).toLong)
      val raw = sq / scale / n.toDouble -
        (mj / scale / n.toDouble) * (mk / scale / n.toDouble)
      BigDecimal(raw).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Pca.covariance(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size === d * (d + 1) / 2)
    got.foreach { case ((j, k), v) =>
      assert(v === cell(j, k), s"cov($j,$k)")
      if (j == k) assert(v >= -1e-9, s"negative variance at $j")
    }
  }

  test("jacobi eigensolve returns orthonormal eigenpairs, leading first") {
    val comps = Pca.trainComponents(spark, sf)
    assert(comps.length === Pca.PcaK)
    val lambdas = comps.map(_._1)
    assert(lambdas.zip(lambdas.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"eigenvalues not descending: $lambdas")
    assert(lambdas.forall(_ >= -1e-9))
    // orthonormal loadings
    comps.zipWithIndex.foreach { case ((_, v), i) =>
      val nrm = v.map(x => x * x).sum
      assert(math.abs(nrm - 1.0) < 1e-9, s"comp $i norm $nrm")
      comps.drop(i + 1).foreach { case (_, w) =>
        val ip = v.zip(w).map { case (a, b) => a * b }.sum
        assert(math.abs(ip) < 1e-6, s"comp $i not orthogonal: $ip")
      }
    }
    // true eigenpairs of the collected covariance: ||Cv - λv||∞ small
    val d = Pca.Dim
    val c = Array.ofDim[Double](d, d)
    Pca.covariance(spark, sf).collect().foreach { r =>
      c(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      c(r.getInt(1))(r.getInt(0)) = r.getDouble(2)
    }
    val lmax = math.max(comps.head._1, 1e-12)
    comps.foreach { case (lambda, v) =>
      val res = (0 until d).map(i =>
        math.abs((0 until d).map(j => c(i)(j) * v(j)).sum - lambda * v(i))).max
      assert(res < 1e-6 * lmax, s"eigen residual $res at λ=$lambda")
    }
    // explained variance cannot exceed the total
    val trace = (0 until d).map(i => c(i)(i)).sum
    assert(lambdas.sum <= trace + 1e-9)
    // sign pin: the largest-|loading| entry is positive
    comps.foreach { case (_, v) =>
      val piv = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(piv) > 0.0)
    }
  }

  test("projection coordinates carry the component variances") {
    val comps = Pca.trainComponents(spark, sf)
    val proj = Pca.project(spark, sf).collect()
      .map(r => (r.getLong(1).toInt, r.getDouble(2)))
    val byComp = proj.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byComp.keySet === comps.indices.toSet)
    val n = vecs.length
    comps.zipWithIndex.foreach { case ((lambda, _), cIdx) =>
      val xs = byComp(cIdx)
      assert(xs.length === n)
      val mean = xs.sum / n
      val varc = xs.map(x => (x - mean) * (x - mean)).sum / n
      // centered: mean ~ 0 (quantized dot wiggle only)
      assert(math.abs(mean) < 1e-4, s"comp $cIdx mean $mean")
      // coordinate variance reproduces the eigenvalue
      assert(math.abs(varc - lambda) <= 1e-3 * math.max(lambda, 1e-9) + 1e-6,
        s"comp $cIdx variance $varc vs λ $lambda")
    }
    // the pca entry frame mirrors the trained model
    val rows = Pca.pca(spark, sf).collect()
    assert(rows.length === Pca.PcaK * Pca.Dim)
  }
}
