package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral / second-moment operators over embedding columns: the
  * distributed covariance matrix and the power-iteration principal
  * component on top of it — the PCA / whitening prep step of an
  * embedding-space training-data pipeline (SURVEY.md §2.3 ⊕; the
  * reference has no linear-algebra tier, so this is net-new surface).
  *
  * Determinism contract (oracle parity): per-dimension values are
  * quantized to int64 at 2^14, so every distributed sum is an exact
  * integer that no partial-agg merge order can perturb. The only
  * floating point is exact-int→double casts plus a fixed-order
  * expression both engines evaluate identically (IEEE divisions /
  * multiplies / sqrt). Headroom: with |x| ≤ 1 and d = 64, |q| ≤ 2^14
  * and each cross term ≤ 2^28, so pair sums stay exactly
  * double-castable (< 2^53) to ~3×10^7 rows and overflow-free to
  * ~3×10^10; past that, raise the sums to decimal(38,0) (the q60
  * pattern) and lower the quantization a bit.
  *
  * Scale shape: ONE pass over the corpus generates the d(d+1)/2
  * upper-triangle cross terms per row inside codegen; the hash
  * aggregate combines map-side, so the shuffle is tasks × d² rows —
  * never data-sized. The d×d result is the only thing collected
  * (the centroid-collect pattern: dimension-bounded, not data-bounded).
  */
object Spectral {

  /** Quantization scale (2^14). */
  val Scale = 16384.0

  private def quantized(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(Scale)))

  /** Upper-triangle covariance of a `array<float>` embedding column:
    * one row per (i, j), 0 ≤ i ≤ j < dim, with the population
    * covariance in original (un-quantized) units.
    *
    * cov[i,j] = (S_ij/n − (S_i/n)(S_j/n)) / Scale², every S an exact
    * int64 sum of quantized values — computed via the mergeable
    * sufficient statistics ([[covarianceStats]] → [[covarianceFromStats]]),
    * so the monolithic scan and any sharded/merged computation agree
    * bit for bit.
    */
  def covarianceUpper(corpus: DataFrame, embCol: String, dim: Int): DataFrame =
    covarianceFromStats(covarianceStats(corpus, embCol, dim))

  /** Mergeable covariance sufficient statistics — the artifact tier of
    * the second-moment pipeline. One corpus pass emits exact-int64 rows
    * `(i int, j int, s bigint)`:
    *   - `0 ≤ i ≤ j < dim`: the pair sum Σ qᵢ·qⱼ;
    *   - `(i, −1)`:         the marginal Σ qᵢ;
    *   - `(−1, −1)`:        the row count n.
    * All three are sums of exact integers (values quantized at
    * [[Scale]]), so stats are ASSOCIATIVE: `stats(A) ∪ stats(B)` summed
    * per (i, j) is exactly `stats(A ∪ B)` — yesterday's persisted
    * artifact merges with today's delta scan without rescanning
    * history, the incremental-maintenance twin of the persisted SQ8/PQ
    * codebooks (train-once / update-forever). Scale shape: identical to
    * the monolithic pass — the d(d+1)/2 cross terms per row stay inside
    * codegen, every sum combines map-side, and the artifact itself is
    * d²-bounded (2,145 rows at d = 64), never data-sized. */
  def covarianceStats(corpus: DataFrame, embCol: String, dim: Int): DataFrame = {
    val q = corpus.select(quantized(col(embCol)).as("q"))
    // Upper-triangle cross products: explode i, then the j ≥ i suffix —
    // both explodes stay inside one codegen stage; sums combine map-side.
    val pairs = q
      .select(col("q"), explode(sequence(lit(0), lit(dim - 1))).as("i"))
      .select(col("i"), element_at(col("q"), col("i") + 1).as("qi"),
        posexplode(slice(col("q"), col("i") + 1, lit(dim) - col("i"))).as(Seq("p", "qj")))
      .select(col("i"), (col("i") + col("p")).as("j"),
        (col("qi") * col("qj")).as("qq"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("qq")).as("s"))
    val marg = q
      .select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy(col("i")).agg(sum(col("qi")).as("s"))
      .select(col("i"), lit(-1).as("j"), col("s"))
    val cnt = q.agg(count(lit(1)).as("s"))
      .select(lit(-1).as("i"), lit(-1).as("j"), col("s"))
    pairs.select(col("i"), col("j"), col("s"))
      .unionByName(marg).unionByName(cnt)
  }

  /** Upper-triangle covariance from (possibly unioned) stats rows in
    * [[covarianceStats]]'s layout: one exact integer re-sum per (i, j)
    * merges any number of shards, then the same fixed-order double
    * expression as the monolithic path. The merge agg is d²-bounded;
    * marginals and the count broadcast. */
  def covarianceFromStats(stats: DataFrame): DataFrame = {
    val merged = stats.groupBy(col("i"), col("j")).agg(sum(col("s")).as("s"))
    val cnt = merged.filter(col("i") === -1 && col("j") === -1)
      .select(col("s").cast("double").as("nd"))
    val marg = merged.filter(col("i") >= 0 && col("j") === -1)
      .select(col("i"), col("s"))
    merged.filter(col("i") >= 0 && col("j") >= 0)
      .withColumnRenamed("s", "s_ij")
      .join(broadcast(marg.select(col("i"), col("s").as("s_i"))), Seq("i"))
      .join(broadcast(marg.select(col("i").as("j"), col("s").as("s_j"))), Seq("j"))
      .crossJoin(broadcast(cnt))
      .select(col("i"), col("j"),
        ((col("s_ij").cast("double") / col("nd")
          - (col("s_i").cast("double") / col("nd")) * (col("s_j").cast("double") / col("nd")))
          / lit(Scale) / lit(Scale)).as("cov"))
  }

  /** Dominant eigenvector of the covariance by a fixed number of power
    * iterations from the deterministic all-ones start v₀ = 1/√dim.
    *
    * The d×d matrix (dim(dim+1)/2 rows) is collected to the driver —
    * dimension-bounded, never data-sized, same posture as the IVF
    * centroid collects. Every driver-side op is a fixed-order IEEE
    * double op the SQL oracle replays verbatim: the matrix-vector
    * product folds j ascending from 0.0, the norm folds i ascending
    * from 0.0, then one sqrt and one division per element.
    */
  def principalComponent(covUpper: DataFrame, dim: Int, iters: Int): Array[Double] =
    powerIterate(collectDense(covUpper, dim), dim, iters)

  /** Top-k principal components: power iteration plus PROJECTED
    * Hotelling deflation. After extracting vₖ the dense matrix is
    * deflated C ← C − λₖ vₖ vₖᵀ with λₖ = vₖᵀ(C vₖ), and every iterate
    * of the NEXT chain is additionally re-orthogonalized against the
    * extracted components (w ← w − (w·vₘ)vₘ before normalizing) —
    * matrix deflation alone leaves a residual along a
    * not-fully-converged vₖ of the order of its own convergence error,
    * which the per-iteration projection removes to FP roundoff.
    * Everything past the one d²-bounded collect is driver math in a
    * FIXED op order the SQL oracle replays verbatim: Cv folds j
    * ascending from 0.0, dot products fold i ascending from 0.0, each
    * deflated entry is cov − (λ·vᵢ)·vⱼ, each projection subtracts
    * (d·vᵢ). This is the top-k subspace whitening / drift monitoring
    * needs (see header) — k stays small (2–16), so the cost is k power
    * chains over one collected matrix, never another corpus pass. */
  def principalComponents(covUpper: DataFrame, dim: Int, iters: Int,
                          k: Int): Seq[Array[Double]] =
    principalComponentsWithValues(covUpper, dim, iters, k).map(_._1)

  /** [[principalComponents]] plus each component's eigenvalue estimate
    * λₖ = vₖᵀ(C vₖ) — the Rayleigh quotient at extraction, i.e. exactly
    * the scalar the deflation removes. This is what whitening divides
    * by (x·vₖ / √λₖ has unit population variance by construction) and
    * what drift monitoring tracks over corpus snapshots. */
  def principalComponentsWithValues(covUpper: DataFrame, dim: Int,
      iters: Int, k: Int): Seq[(Array[Double], Double)] = {
    val c = collectDense(covUpper, dim)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
    while (out.length < k) {
      val v = powerIterate(c, dim, iters, ortho = out.map(_._1).toSeq)
      val cv = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        cv(i) = acc
        i += 1
      }
      var lam = 0.0
      var t = 0
      while (t < dim) { lam += v(t) * cv(t); t += 1 }
      i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { c(i)(j) -= lam * v(i) * v(j); j += 1 }
        i += 1
      }
      out += ((v, lam))
    }
    out.toSeq
  }

  /** Closed-form OLS linear probe y ≈ b0 + b1·q1 + b2·q2 — the
    * supervised read-out every embedding-quality audit runs on top of
    * the PCA subspace ("do the top components predict the label?").
    * `proj` must carry exact-integer columns `q1`, `q2` (quantized
    * coordinates, the [[Scale]] convention) and `y` (the long label).
    *
    * One metadata-bounded stats row (9 exact int64 sums — map-side
    * combined, order-insensitive) is collected, then the 3×3 normal
    * equations are solved by Cramer's rule in a FIXED IEEE op order the
    * SQL oracle replays verbatim: each determinant is the first-row
    * cofactor expansion written left to right, then three divisions.
    * Headroom: |q| ≤ 2^17 (unit-ish vectors at 2^14) keeps Σq² exact in
    * int64 to ~2^29 rows; past that raise the sums to decimal(38,0)
    * (the q60 pattern). Returns (b0, b1, b2) in quantized-feature units.
    */
  def probeCoefficients(proj: DataFrame): (Double, Double, Double) = {
    val r = proj.agg(
      count(lit(1)).as("n"),
      sum(col("q1")).as("s1"), sum(col("q2")).as("s2"), sum(col("y")).as("sy"),
      sum(col("q1") * col("q1")).as("s11"),
      sum(col("q1") * col("q2")).as("s12"),
      sum(col("q2") * col("q2")).as("s22"),
      sum(col("q1") * col("y")).as("s1y"),
      sum(col("q2") * col("y")).as("s2y")).head()
    require(r.getLong(0) > 0,
      "probeCoefficients: empty projection — no rows to fit")
    val n = r.getLong(0).toDouble
    val s1 = r.getLong(1).toDouble; val s2 = r.getLong(2).toDouble
    val sy = r.getLong(3).toDouble
    val s11 = r.getLong(4).toDouble; val s12 = r.getLong(5).toDouble
    val s22 = r.getLong(6).toDouble
    val s1y = r.getLong(7).toDouble; val s2y = r.getLong(8).toDouble
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    require(det != 0.0,
      "probeCoefficients: singular normal equations (a feature is " +
        "constant or the two features are collinear)")
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    (b0, b1, b2)
  }

  /** Per-dimension means in original units read off a stats artifact
    * ([[covarianceStats]] layout): μᵢ = (Sᵢ/n)/Scale — the centering
    * vector PCA-based scoring (reconstruction-error OOD, whitening of
    * centered data) consumes. The collect is dim+1 rows
    * (dimension-bounded); the division order matches the SQL oracle's
    * `(CAST(s AS DOUBLE) / nd) / Scale` term for term. Like
    * [[covarianceFromStats]], sharded stats merge by one exact re-sum
    * first, so a raw union of shard artifacts reads correctly — without
    * it a multi-shard union would silently surface ONE shard's count. */
  def dimensionMeans(stats: DataFrame, dim: Int): Array[Double] = {
    val rows = stats.filter(col("j") === -1)
      .groupBy(col("i"), col("j")).agg(sum(col("s")).as("s"))
      .collect()
    val n = rows.collectFirst { case r if r.getInt(0) == -1 => r.getLong(2) }
      .getOrElse(throw new IllegalStateException(
        "dimensionMeans: stats artifact has no count row"))
    require(n > 0, "dimensionMeans: empty corpus — no rows behind the stats")
    val mu = new Array[Double](dim)
    rows.foreach { r =>
      val i = r.getInt(0)
      if (i >= 0) mu(i) = (r.getLong(2).toDouble / n.toDouble) / Scale
    }
    mu
  }

  /** Per-dimension mean drift between two corpus snapshots — the
    * embedding-space drift monitor the covariance tier exists for (see
    * header): Δᵢ = mean_b(i) − mean_a(i) in original units. Each side is
    * one scan producing dim-bounded int64 sums (quantized at [[Scale]],
    * map-side combined), so the result is exact and order-free; the
    * only floating point is the final (S/n)/Scale division chain the
    * oracle replays. Shuffle is tasks × dim rows — never data-sized.
    *
    * An EMPTY snapshot yields an empty result (no dimensions observed
    * on one side → the inner join keeps none): drift over nothing is
    * reported as nothing, never as NaN rows — callers alerting on
    * drift should alert on emptiness too. */
  def meanDrift(a: DataFrame, b: DataFrame, embCol: String): DataFrame = {
    def dimSums(df: DataFrame, s: String, c: String) = df
      .select(posexplode(quantized(col(embCol))).as(Seq("i", "qi")))
      .groupBy(col("i"))
      .agg(sum(col("qi")).as(s), count(lit(1)).as(c))
    val ma = col("sa").cast("double") / col("na").cast("double") / lit(Scale)
    val mb = col("sb").cast("double") / col("nb").cast("double") / lit(Scale)
    dimSums(a, "sa", "na").join(dimSums(b, "sb", "nb"), Seq("i"))
      .select(col("i"), ma.as("mean_a"), mb.as("mean_b"), (mb - ma).as("drift"))
  }

  private def collectDense(covUpper: DataFrame, dim: Int): Array[Array[Double]] = {
    val c = Array.ofDim[Double](dim, dim)
    covUpper.select(col("i"), col("j"), col("cov")).collect().foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val v = r.getDouble(2)
      c(i)(j) = v; c(j)(i) = v
    }
    c
  }

  private def powerIterate(c: Array[Array[Double]], dim: Int, iters: Int,
                           ortho: Seq[Array[Double]] = Nil): Array[Double] = {
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var t = 0
    while (t < iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      ortho.foreach { u =>
        var d = 0.0
        var m = 0
        while (m < dim) { d += w(m) * u(m); m += 1 }
        m = 0
        while (m < dim) { w(m) -= d * u(m); m += 1 }
      }
      var ss = 0.0
      var k = 0
      while (k < dim) { ss += w(k) * w(k); k += 1 }
      val nrm = math.sqrt(ss)
      // A zero (or fully deflated) matrix maps every iterate to 0;
      // dividing would spread NaN corpus-wide. Any unit vector
      // ORTHOGONAL to the already-extracted set is a valid eigenvector
      // (eigenvalue 0) — returning the raw start vector here would hand
      // principalComponentsWithValues the SAME vector for every
      // remaining component (k identical, non-orthogonal "components"),
      // so pick deterministically from the extracted set's complement
      // instead: the ortho-projected start, or the first canonical
      // basis vector with a surviving projection.
      if (nrm == 0.0) return orthoComplementUnit(v, ortho, dim)
      v = w.map(_ / nrm)
      t += 1
    }
    v
  }

  /** A deterministic unit vector orthogonal to `ortho`: the projection
    * of `start` onto the complement if it survives, else the first
    * canonical basis vector eᵢ whose projection does (one must, while
    * fewer than dim vectors are extracted — the projector has rank
    * dim − |ortho| > 0 and the eᵢ span everything). Fixed fold order
    * throughout, like every other driver-side op here. */
  private def orthoComplementUnit(start: Array[Double],
                                  ortho: Seq[Array[Double]],
                                  dim: Int): Array[Double] = {
    def project(x: Array[Double]): Array[Double] = {
      val w = x.clone()
      ortho.foreach { u =>
        var d = 0.0
        var m = 0
        while (m < dim) { d += w(m) * u(m); m += 1 }
        m = 0
        while (m < dim) { w(m) -= d * u(m); m += 1 }
      }
      w
    }
    def norm(x: Array[Double]): Double = {
      var ss = 0.0
      var k = 0
      while (k < dim) { ss += x(k) * x(k); k += 1 }
      math.sqrt(ss)
    }
    val candidates = Iterator(start) ++ (0 until dim).iterator.map { i =>
      val e = new Array[Double](dim); e(i) = 1.0; e
    }
    candidates.map(project)
      .map(w => (w, norm(w)))
      .collectFirst { case (w, n) if n > 1e-12 => w.map(_ / n) }
      .getOrElse(start) // over-extracted past dim: caller asked for k > rank
  }
}
