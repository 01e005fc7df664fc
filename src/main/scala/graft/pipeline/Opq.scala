package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.dotFD

/** Parametric OPQ — Optimized Product Quantization (Ge et al., CVPR
  * 2013, §4 "OPQ_P"): rotate the space with an orthogonal matrix R
  * before the contiguous subspace split so that (a) the second-moment
  * structure is axis-aligned (PCA) and (b) variance is BALANCED across
  * the m subspaces (greedy eigenvalue allocation), then run the
  * unmodified PQ chain ([[Similarity.pqCodebooks]] /
  * [[Similarity.pqEncode]] / [[Similarity.topKPq]]) on the rotated
  * vectors. R is orthogonal, so every dot product and L2 distance is
  * preserved exactly — ground truth for recall is unchanged and ADC
  * distances in the rotated space estimate the SAME distances the
  * un-rotated chain estimates; only the quantization error changes.
  *
  * Scale shape: training is one distributed second-moment pass
  * (map-side-combined to a d×d exchange), a driver-side 64×64
  * eigensolve (microseconds), and a map-only rotation — no extra
  * shuffle anywhere. At 100 TB the moment pass runs on a sample, the
  * same way [[Similarity.kmeansCentroids]] would; the rotation apply
  * is d² FMA per row inside whole-stage codegen (64 [[dotFD]] kernels
  * against literal rows, no higher-order functions).
  *
  * On THIS repo's synthetic embeddings the gain is ≈0 by construction:
  * the vectors are isotropic (per-dim variance uniform, no
  * correlations), so the optimal rotation is no better than identity —
  * the recall table documents that honestly, and the OpqSpec fixture
  * (anisotropic + deliberately mixed by a non-axis-aligned orthogonal
  * matrix) is where the implementation proves it beats plain PQ.
  */
object Opq {

  /** Embedding dimensionality (the corpus contract, as in
    * [[Similarity]]).
    */
  val Dim = 64

  /** The d×d second moment E[x xᵀ] (un-centered: centering would shift
    * vectors and change cosines; an orthogonal rotation of the
    * UN-centered cloud preserves both cosine and L2, which is what the
    * ANN queries score). Distributed as ONE
    * [[graft.functions.secondMomentAgg]] pass (round 18): the
    * aggregation state is the d(d+1)/2 upper-triangle sums + per-pair
    * counts (~33 KB), map-side partials merge elementwise, and the
    * exchange carries one buffer instead of the n·d(d+1)/2 exploded
    * pair rows the previous `posexplode × posexplode(slice) →
    * groupBy(i,j).avg` plan shuffled — ChainScale measured that plan
    * at ~0.5 ms/row (pair-ROW overhead, not arithmetic; 102 cpu-s at
    * 100× sf0.1 — the whole OpqChain bill after MatVecFD), the fused
    * pass at ~6 µs/row. The driver mirrors the triangle. Entries are
    * 6dp-rounded inside the aggregate with Spark `round` semantics
    * (BigDecimal HALF_UP — the repo's cross-run determinism seam:
    * float summation order varies with partitioning; the rotation
    * must not), so the eigensolve input is bit-stable; OpqSpec pins
    * the fused pass against the exploded spelling to one 6dp ulp.
    */
  def secondMoment(embeddings: DataFrame): Array[Array[Double]] = {
    val flat = embeddings
      .agg(graft.functions.secondMomentAgg(col("embedding"), Dim).as("m"))
      .head().getAs[scala.collection.Seq[Double]]("m")
    val m = Array.ofDim[Double](Dim, Dim)
    var idx = 0
    var i = 0
    while (i < Dim) {
      var j = i
      while (j < Dim) {
        m(i)(j) = flat(idx); m(j)(i) = flat(idx); idx += 1; j += 1
      }
      i += 1
    }
    m
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * deterministic fixed sweep order (row-major upper triangle), early
    * exit when the off-diagonal Frobenius mass is numerically zero.
    * Returns (eigenvalues, V) with eigenvectors as COLUMNS of V, so
    * A = V·diag(λ)·Vᵀ. For d=64 a sweep is ~2k rotations — the whole
    * solve is microseconds on the driver, which is why no library
    * dependency is warranted.
    */
  def jacobiEig(mIn: Array[Array[Double]], sweeps: Int = 24): (Array[Double], Array[Array[Double]]) = {
    val n = mIn.length
    val a = mIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    var converged = false
    while (s < sweeps && !converged) {
      var off = 0.0
      for (p <- 0 until n - 1; q <- p + 1 until n) off += a(p)(q) * a(p)(q)
      if (off < 1e-22) converged = true
      else {
        for (p <- 0 until n - 1; q <- p + 1 until n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-16) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
        }
        s += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Ge et al. §4 greedy eigenvalue allocation: eigen-directions in
    * descending-λ order, each assigned to the open bucket (capacity
    * d/m) with the smallest running log-product of eigenvalues — the
    * balanced-variance permutation that makes every subspace carry
    * comparable energy, so no single quantizer is starved of bits.
    * Returns the output-dimension permutation: slot r of the rotated
    * vector is eigen-direction perm(r); slots [b·d/m, (b+1)·d/m) form
    * subspace b.
    */
  def allocate(eig: Array[Double], m: Int): Array[Int] = {
    val n = eig.length
    require(m >= 1 && n % m == 0, s"m=$m must divide $n")
    val cap = n / m
    val order = eig.zipWithIndex.sortBy { case (l, i) => (-l, i) }
    val buckets = Array.fill(m)(Vector.empty[Int])
    val logSum = new Array[Double](m)
    order.foreach { case (l, i) =>
      val b = (0 until m)
        .filter(buckets(_).size < cap)
        .minBy(bi => (logSum(bi), bi))
      buckets(b) = buckets(b) :+ i
      logSum(b) += math.log(math.max(l, 1e-12))
    }
    buckets.flatten.toArray
  }

  /** Rotation as row vectors: row r = eigenvector column perm(r), i.e.
    * x̂ᵣ = v_{perm(r)} · x. Rows are orthonormal because V's columns
    * are.
    */
  def rotationRows(v: Array[Array[Double]], perm: Array[Int]): Array[Array[Double]] =
    perm.map(pi => v.map(_(pi)))

  /** Train the full parametric-OPQ rotation: moment → eigensolve →
    * eigenvalue allocation.
    */
  def trainRotation(embeddings: DataFrame, m: Int = 8): Array[Array[Double]] = {
    val (eig, v) = jacobiEig(secondMoment(embeddings))
    rotationRows(v, allocate(eig, m))
  }

  /** Apply the rotation map-only as ONE fused [[graft.functions.matvecFD]]
    * expression (cast back to float inside, so every downstream PQ
    * stage sees the unchanged (vec_id, embedding: array<float>)
    * contract). Round-18: this replaced the
    * `array(64 × dotFD(e, lit(row)).cast(float))` spelling —
    * numerically identical per element (MatVecFdSpec pins exact
    * equality incl. null/mismatch shapes), but the 64 inlined kernel
    * loops in one generated projection ran past JIT compilation
    * budgets at bytecode-interpreter speed: R18ChainProbe measured the
    * old map at ~1 ms/row (≈15× the cost of 64 separate one-kernel
    * passes), which made the rotate recompute the dominant — and, under
    * wide fan-out, super-linear-reading — bill of every OpqChain build.
    */
  def rotate(embeddings: DataFrame, rows: Array[Array[Double]]): DataFrame = {
    require(rows.length == Dim, s"rotation must be ${Dim}x$Dim")
    require(rows.forall(_.length == Dim),
      s"rotation rows must all be width $Dim — a ragged matrix would silently mis-rotate")
    embeddings.withColumn(
      "embedding", graft.functions.matvecFD(col("embedding"), rows))
  }
}
