package graft

import graft.operators.Spectral
import org.apache.spark.sql.functions._

/** Pins [[Spectral]]'s covariance against a brute-force local
  * computation and the power iterate's defining properties. The
  * cross-engine bit-parity of the same arithmetic is gated by
  * vs31/vs32's oracles; this spec guards the math itself.
  */
class SpectralSpec extends SparkSuite {

  private val dim = 64

  private lazy val emb: Array[Array[Double]] =
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  private lazy val covUpper =
    Spectral.covarianceUpper(
      spark.read.parquet(s"$sf0001/embeddings.parquet"), "embedding", dim)

  private def localCov(): Array[Array[Double]] = {
    val n = emb.length
    val mean = new Array[Double](dim)
    emb.foreach { v => var i = 0; while (i < dim) { mean(i) += v(i); i += 1 } }
    (0 until dim).foreach(i => mean(i) /= n)
    val c = Array.ofDim[Double](dim, dim)
    emb.foreach { v =>
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { c(i)(j) += (v(i) - mean(i)) * (v(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    for (i <- 0 until dim; j <- i until dim) { c(i)(j) /= n; c(j)(i) = c(i)(j) }
    c
  }

  test("covarianceUpper matches the brute-force covariance within quantization error") {
    val rows = covUpper.collect()
    assert(rows.length === dim * (dim + 1) / 2)
    val ref = localCov()
    // Quantization at 2^14 perturbs each value by < 2^-14; the covariance
    // of perturbed values moves by O(|x| * 2^-14) ≈ 1e-4 at |x| ≤ 1.
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      assert(math.abs(c - ref(i)(j)) < 1e-4,
        s"cov($i,$j)=$c vs brute ${ref(i)(j)}")
    }
    // Diagonal entries are variances: non-negative.
    rows.filter(r => r.getInt(0) == r.getInt(1))
      .foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("sharded covarianceStats merge is bit-identical to the monolithic scan") {
    val full = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // Three-way shard (deliberately not the vs40 two-way split, and with
    // one empty-ish residue class at small n allowed): union of per-shard
    // stats must reproduce the monolithic covariance EXACTLY — the sums
    // are exact integers, so merge order cannot perturb a single bit.
    val stats = (0 until 3).map { r =>
      Spectral.covarianceStats(full.filter(col("vec_id") % 3 === r),
        "embedding", dim)
    }.reduce(_ unionByName _)
    val merged = Spectral.covarianceFromStats(stats)
      .orderBy("i", "j").collect()
    val mono = covUpper.orderBy("i", "j").collect()
    assert(merged.length === dim * (dim + 1) / 2)
    merged.zip(mono).foreach { case (m, o) =>
      assert(m.getInt(0) === o.getInt(0) && m.getInt(1) === o.getInt(1))
      // Bit equality, not tolerance: same integers, same op order.
      assert(java.lang.Double.doubleToLongBits(m.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(o.getDouble(2)),
        s"cov(${m.getInt(0)},${m.getInt(1)}) merged=${m.getDouble(2)} " +
          s"mono=${o.getDouble(2)}")
    }
  }

  test("covarianceStats artifact is d²-bounded with the documented row layout") {
    val full = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val stats = Spectral.covarianceStats(full, "embedding", dim).collect()
    assert(stats.length === dim * (dim + 1) / 2 + dim + 1)
    val n = full.count()
    val cntRows = stats.filter(r => r.getInt(0) == -1 && r.getInt(1) == -1)
    assert(cntRows.length === 1 && cntRows.head.getLong(2) === n)
    assert(stats.count(r => r.getInt(0) >= 0 && r.getInt(1) == -1) === dim)
  }

  test("principalComponent is unit-norm and lifts the Rayleigh quotient monotonically") {
    val ref = localCov()
    def rayleigh(v: Array[Double]): Double = {
      var num = 0.0
      for (i <- 0 until dim; j <- 0 until dim) num += v(i) * ref(i)(j) * v(j)
      num // v is unit norm throughout
    }
    val v0 = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var prev = rayleigh(v0)
    // Power iteration's Rayleigh quotient is non-decreasing in t for a
    // PSD matrix; each checkpoint must dominate the previous one.
    for (t <- Seq(1, 4, 8, 16, 24)) {
      val vt = Spectral.principalComponent(covUpper, dim, iters = t)
      val nrm = math.sqrt(vt.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"iterate $t not unit norm: $nrm")
      val rq = rayleigh(vt)
      assert(rq >= prev - 1e-9, s"Rayleigh dropped at t=$t: $prev -> $rq")
      prev = rq
    }
    // The final quotient must beat the average eigenvalue (= trace/dim),
    // i.e. the iterate points toward the heavy directions.
    val avg = (0 until dim).map(i => ref(i)(i)).sum / dim
    assert(prev > avg, s"final Rayleigh $prev not above mean eigenvalue $avg")
  }

  test("deflated second component is unit-norm, orthogonal, and subdominant") {
    val pcs = Spectral.principalComponents(covUpper, dim, iters = 24, k = 2)
    val Seq(p1, p2) = pcs
    // k=1 of the deflating path reproduces the single-component path
    val single = Spectral.principalComponent(covUpper, dim, iters = 24)
    assert(p1.sameElements(single),
      "principalComponents(k=2) head diverged from principalComponent")
    def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm(p2) - 1.0) < 1e-9, s"PC2 not unit norm: ${nrm(p2)}")
    // Orthogonality: deflation removes PC1's subspace, so PC2 (after 24
    // iterations from a start with a PC1 component) retains only the
    // convergence residual along PC1.
    val dot = (0 until dim).map(i => p1(i) * p2(i)).sum
    assert(math.abs(dot) < 1e-6, s"PC2 not orthogonal to PC1: dot=$dot")
    // Subdominance: PC2's Rayleigh quotient on the ORIGINAL matrix must
    // not exceed PC1's (it targets the second eigenvalue).
    val ref = localCov()
    def rayleigh(v: Array[Double]): Double = {
      var num = 0.0
      for (i <- 0 until dim; j <- 0 until dim) num += v(i) * ref(i)(j) * v(j)
      num
    }
    assert(rayleigh(p2) <= rayleigh(p1) + 1e-9,
      s"PC2 Rayleigh ${rayleigh(p2)} exceeds PC1's ${rayleigh(p1)}")
  }

  test("a zero covariance still yields a distinct orthonormal basis, not k copies") {
    // Degenerate face (constant embedding column → all-zero covariance):
    // power iteration's zero-norm early exit must hand back a vector in
    // the EXTRACTED SET'S COMPLEMENT each time, or every component after
    // the first would be the same non-orthogonal start vector.
    import spark.implicits._
    val d = 4
    val zeroCov = (for (i <- 0 until d; j <- i until d) yield (i, j, 0.0))
      .toList.toDF("i", "j", "cov")
    val pcs = Spectral.principalComponentsWithValues(zeroCov, d, iters = 8, k = 3)
    assert(pcs.length == 3)
    pcs.foreach { case (_, lambda) =>
      assert(math.abs(lambda) < 1e-12, s"zero matrix has eigenvalue $lambda")
    }
    for (a <- pcs.indices; b <- pcs.indices) {
      val dot = (0 until d).map(i => pcs(a)._1(i) * pcs(b)._1(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9,
        s"components $a,$b not orthonormal: dot=$dot")
    }
  }

  test("whitened projections have unit population variance per component") {
    // Var(x·vₖ)/λₖ = vₖᵀCvₖ/λₖ = 1 by construction when λₖ is the
    // extraction-time Rayleigh value — the property whitening is FOR.
    // Tolerance covers the 2^-14 quantization of the distributed C vs
    // the exact local covariance used here.
    val pcs = Spectral.principalComponentsWithValues(covUpper, dim,
      iters = 24, k = 2)
    pcs.zipWithIndex.foreach { case ((v, lam), idx) =>
      assert(lam > 0, s"component $idx has non-positive eigenvalue $lam")
      val proj = emb.map(x =>
        (0 until dim).map(i => x(i) * v(i)).sum / math.sqrt(lam))
      val mean = proj.sum / proj.length
      val variance = proj.map(p => (p - mean) * (p - mean)).sum / proj.length
      assert(math.abs(variance - 1.0) < 1e-3,
        s"component $idx whitened variance $variance != 1")
    }
  }

  test("probeCoefficients recovers an exact planted linear relationship") {
    // y = 3 + 2·q1 − q2 exactly: every sufficient statistic is an exact
    // small integer, the Cramer determinants divide evenly, and IEEE
    // division of exact integers is correctly rounded — so the
    // recovered coefficients are EXACT, not approximate.
    import spark.implicits._
    val rows = Seq((1L, 2L), (4L, -3L), (-2L, 5L), (7L, 1L), (0L, 0L), (3L, 8L))
      .map { case (q1, q2) => (q1, q2, 3L + 2L * q1 - q2) }
    val (b0, b1, b2) = Spectral.probeCoefficients(
      rows.toDF("q1", "q2", "y"))
    assert(b0 == 3.0 && b1 == 2.0 && b2 == -1.0, s"got ($b0, $b1, $b2)")
  }

  test("probeCoefficients satisfies the normal-equation identities on real data") {
    // OLS with an intercept makes residuals orthogonal to every
    // regressor column: Σr = Σr·q1 = Σr·q2 = 0 in exact arithmetic.
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val proj = emb.select(col("vec_id"),
      floor(element_at(col("embedding"), 1).cast("double") * lit(Spectral.Scale)).as("q1"),
      floor(element_at(col("embedding"), 2).cast("double") * lit(Spectral.Scale)).as("q2"),
      col("label").cast("long").as("y"))
    val (b0, b1, b2) = Spectral.probeCoefficients(proj)
    val r = proj.select(
      (col("y").cast("double") -
        ((lit(b0) + lit(b1) * col("q1").cast("double")) +
          lit(b2) * col("q2").cast("double"))).as("r"),
      col("q1").cast("double").as("x1"), col("q2").cast("double").as("x2"))
    val Array(sr, sr1, sr2) = r.agg(sum(col("r")), sum(col("r") * col("x1")),
      sum(col("r") * col("x2"))).head().toSeq.map(_.asInstanceOf[Double]).toArray
    // q-scale features are O(2^14), so the gradient sums carry that
    // scale in their roundoff; normalize per-row per-unit-feature.
    assert(math.abs(sr) < 1e-6, s"sum resid $sr")
    assert(math.abs(sr1) < 1e-2, s"sum resid*q1 $sr1")
    assert(math.abs(sr2) < 1e-2, s"sum resid*q2 $sr2")
  }

  test("probeCoefficients raises named errors on empty and singular input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("q1", "q2", "y")
    val e1 = intercept[IllegalArgumentException](Spectral.probeCoefficients(empty))
    assert(e1.getMessage.contains("empty projection"))
    // q2 constant ⇒ collinear with the intercept ⇒ singular normal eqs.
    val sing = Seq((1L, 5L, 1L), (2L, 5L, 2L), (3L, 5L, 3L))
      .toDF("q1", "q2", "y")
    val e2 = intercept[IllegalArgumentException](Spectral.probeCoefficients(sing))
    assert(e2.getMessage.contains("singular"))
  }

  test("dimensionMeans reads the exact quantized means off the stats artifact") {
    val full = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val stats = Spectral.covarianceStats(full, "embedding", dim)
    val mu = Spectral.dimensionMeans(stats, dim)
    // Local replay: the mean of floor(x * Scale) over all rows, divided
    // back — same int64 sums, same (S/n)/Scale division order, so bit
    // equality, not tolerance.
    val n = emb.length
    (0 until dim).foreach { i =>
      var s = 0L
      emb.foreach { v => s += math.floor(v(i) * Spectral.Scale).toLong }
      assert(mu(i) === (s.toDouble / n.toDouble) / Spectral.Scale,
        s"mean($i) mismatch")
    }
    // And it merges: a RAW 2-way shard union (no pre-aggregation) reads
    // the same means — dimensionMeans re-sums shards itself.
    val sharded = (0 until 2).map { r =>
      Spectral.covarianceStats(full.filter(col("vec_id") % 2 === r),
        "embedding", dim)
    }.reduce(_ unionByName _)
    val muSharded = Spectral.dimensionMeans(sharded, dim)
    assert(muSharded.toSeq === mu.toSeq)
  }

  test("dimensionMeans raises named errors on a count-free or empty artifact") {
    import spark.implicits._
    val noCount = Seq((0, -1, 5L)).toDF("i", "j", "s")
    val e1 = intercept[IllegalStateException](
      Spectral.dimensionMeans(noCount, dim))
    assert(e1.getMessage.contains("no count row"))
    val empty = Seq((-1, -1, 0L)).toDF("i", "j", "s")
    val e2 = intercept[IllegalArgumentException](
      Spectral.dimensionMeans(empty, dim))
    assert(e2.getMessage.contains("empty corpus"))
  }

  test("meanDrift matches the local per-dimension means exactly") {
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = df.filter(col("vec_id") % 2 === 0)
    val b = df.filter(col("vec_id") % 2 === 1)
    val got = Spectral.meanDrift(a, b, "embedding")
      .orderBy("i").collect()
    assert(got.length == dim)
    def localMeans(parity: Int): Array[Double] = {
      val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
        .filter(col("vec_id") % 2 === parity)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)
      val m = new Array[Double](dim)
      rows.foreach { v =>
        var i = 0
        while (i < dim) {
          m(i) += math.floor(v(i).toDouble * Spectral.Scale); i += 1
        }
      }
      (0 until dim).map(i => m(i) / rows.length / Spectral.Scale).toArray
    }
    val (la, lb) = (localMeans(0), localMeans(1))
    got.foreach { r =>
      val i = r.getInt(0)
      assert(math.abs(r.getDouble(1) - la(i)) < 1e-12, s"mean_a dim $i")
      assert(math.abs(r.getDouble(2) - lb(i)) < 1e-12, s"mean_b dim $i")
      assert(math.abs(r.getDouble(3) - (lb(i) - la(i))) < 1e-12, s"drift dim $i")
    }
  }

  test("meanDrift over an empty snapshot is empty, never NaN rows") {
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
    assert(Spectral.meanDrift(df.filter(lit(false)), df, "embedding").count() == 0)
    assert(Spectral.meanDrift(df, df.filter(lit(false)), "embedding").count() == 0)
  }
}
