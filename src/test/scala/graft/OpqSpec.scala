package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.{Opq, Similarity}

/** Parametric OPQ (Ge et al. 2013): the driver-side eigensolve +
  * allocation math, the distributed moment/rotation plumbing, and the
  * end-to-end claim — on an ANISOTROPIC corpus whose energy directions
  * deliberately straddle the contiguous PQ subspaces, the OPQ-rotated
  * index recalls at least as much as (in this fixture strictly more
  * than) plain PQ at equal m/ksub. The declared queries carry no SQL
  * oracle (the eigensolve has no DuckDB replay), so this spec is their
  * correctness record.
  */
class OpqSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  // ---- deterministic pseudo-randoms (splitmix64 -> uniform in [0,1)) ----
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def unif(seed: Long): Double =
    (mix(seed) >>> 11).toDouble / (1L << 53).toDouble

  /** Deterministic standard normal via Box-Muller. */
  private def gauss(seed: Long): Double = {
    val u1 = math.max(unif(seed * 2 + 1), 1e-12)
    val u2 = unif(seed * 2 + 2)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** A fixed non-axis-aligned orthogonal mixer: the 64×64 Walsh-
    * Hadamard matrix scaled by 1/8 — every output coordinate blends
    * all latent coordinates, so the energy of the few high-variance
    * latents is smeared across EVERY contiguous PQ subspace (the
    * worst case for an unrotated split, Ge et al. §1's motivating
    * figure).
    */
  private def hadamard(i: Int, j: Int): Double = {
    val par = java.lang.Integer.bitCount(i & j) & 1
    (if (par == 0) 1.0 else -1.0) / 8.0
  }

  /** n anisotropic vectors: latent z has 4 dominant dims (std 8) and
    * 60 nuisance dims (std 0.15), observed x = H·z.
    */
  private def anisoVectors(n: Int): Seq[Array[Float]] =
    (0 until n).map { v =>
      val z = Array.tabulate(64) { k =>
        val std = if (k < 4) 8.0 else 0.15
        std * gauss(v.toLong * 131 + k)
      }
      Array.tabulate(64) { i =>
        var acc = 0.0
        var j = 0
        while (j < 64) { acc += hadamard(i, j) * z(j); j += 1 }
        acc.toFloat
      }
    }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def embDf(vs: Seq[Array[Float]]): DataFrame =
    spark.createDataFrame(
      vs.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, v.toIndexedSeq)
      }.asJava,
      embSchema)

  test("jacobiEig reconstructs a symmetric matrix and returns orthonormal V") {
    val n = 8
    // symmetric matrix with a known spread of scales
    val a = Array.tabulate(n, n)((i, j) =>
      math.cos(i * 1.7 + j * 0.9) + math.cos(j * 1.7 + i * 0.9) + (if (i == j) 3.0 * i else 0.0))
    val (eig, v) = Opq.jacobiEig(a)
    // V orthonormal: VᵀV = I
    for (c1 <- 0 until n; c2 <- 0 until n) {
      val dot = (0 until n).map(k => v(k)(c1) * v(k)(c2)).sum
      assert(math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-10,
        s"VtV[$c1][$c2]=$dot")
    }
    // A = V diag(eig) Vᵀ
    for (i <- 0 until n; j <- 0 until n) {
      val rec = (0 until n).map(k => v(i)(k) * eig(k) * v(j)(k)).sum
      assert(math.abs(rec - a(i)(j)) < 1e-9, s"A[$i][$j]: $rec vs ${a(i)(j)}")
    }
  }

  test("eigenvalue allocation balances log-products with capacity d/m") {
    // eigenvalues 8,4,2,1 into m=2 buckets of 2: greedy puts 8 alone
    // first, 4 then 2 into the lighter bucket, 1 backfills -> products
    // {8,1} and {4,2}, both 8.
    val perm = Opq.allocate(Array(8.0, 4.0, 2.0, 1.0), 2)
    assert(perm.length == 4 && perm.toSet == Set(0, 1, 2, 3))
    val b0 = perm.slice(0, 2).map(Array(8.0, 4.0, 2.0, 1.0)(_)).product
    val b1 = perm.slice(2, 4).map(Array(8.0, 4.0, 2.0, 1.0)(_)).product
    assert(b0 == 8.0 && b1 == 8.0, s"bucket products $b0 / $b1")
  }

  test("trained rotation is orthonormal and preserves pairwise dot products") {
    val vs = anisoVectors(80)
    val df = embDf(vs)
    val rows = Opq.trainRotation(df, m = 8)
    // R orthonormal (rows)
    for (r1 <- 0 until 64; r2 <- r1 until 64) {
      val dot = (0 until 64).map(k => rows(r1)(k) * rows(r2)(k)).sum
      assert(math.abs(dot - (if (r1 == r2) 1.0 else 0.0)) < 1e-8)
    }
    // distributed rotate preserves dots within float-cast tolerance
    val rot = Opq.rotate(df, rows)
    val orig = df.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    val rotC = rot.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    for (a <- 0 until 5; b <- 0 until 5) {
      val d0 = (0 until 64).map(k => orig(a)(k).toDouble * orig(b)(k)).sum
      val d1 = (0 until 64).map(k => rotC(a)(k).toDouble * rotC(b)(k)).sum
      assert(math.abs(d0 - d1) < 1e-2 * math.max(1.0, math.abs(d0)),
        s"dot($a,$b): $d0 vs $d1")
    }
  }

  test("composed OPQ+IVF+PQ: ranked per-query top-k, ADC ascending, candidates from probed cells") {
    val df = embDf(anisoVectors(200)).localCheckpoint(true)
    val rot = Opq.rotate(df, Opq.trainRotation(df, m = 8)).localCheckpoint(true)
    val cents = Similarity.kmeansCentroids(rot)
    val books = Similarity.pqCodebooks(rot, m = 8, ksub = 16)
    val out = Similarity.topKIvfPq(rot, cents, books, numQueries = 4, k = 5)
      .orderBy("query_id", "rank").collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      val dists = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adc_dist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
        s"ADC distances must ascend with rank: ${dists.mkString(",")}")
      assert(rows.map(_.getAs[Long]("neighbor_id")).distinct.length == 5)
    }
  }

  test("OPQ beats plain PQ recall on the anisotropic mixed fixture") {
    val df = embDf(anisoVectors(300)).localCheckpoint(true)
    val exact = Similarity.topK(df, numQueries = 8, k = 5)
    val plainBooks = Similarity.pqCodebooks(df, m = 8, ksub = 16)
    val plain = Similarity.topKPq(df, plainBooks, numQueries = 8, k = 5, m = 8)
    val rot = Opq.rotate(df, Opq.trainRotation(df, m = 8)).localCheckpoint(true)
    val opqBooks = Similarity.pqCodebooks(rot, m = 8, ksub = 16)
    val opq = Similarity.topKPq(rot, opqBooks, numQueries = 8, k = 5, m = 8)
    val recalls = Similarity.recallAtK(exact, Seq("pq" -> plain, "opq" -> opq))
      .agg(avg("pq_recall").as("pq"), avg("opq_recall").as("opq"))
      .collect().head
    val (pqR, opqR) = (recalls.getDouble(0), recalls.getDouble(1))
    info(s"mean recall@5: plain PQ $pqR, OPQ $opqR")
    // The 4 dominant latent directions are smeared across every
    // contiguous subspace by the Hadamard mixer; the eigensolve
    // recovers them and the allocation isolates one per subspace, so
    // the gap should be decisive, not marginal.
    assert(opqR > pqR + 0.1, s"expected OPQ ($opqR) > PQ ($pqR) + 0.1")
  }

  test("SecondMomentAgg ≡ the exploded groupBy(i,j).avg spelling to one 6dp ulp") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fused = Opq.secondMoment(e)
    // the retired exploded plan, inlined as the reference spelling:
    // pair rows via chained posexplodes, per-(i,j) avg rounded 6dp.
    // Pre-round float sums accumulate in different orders (hash
    // aggregate vs sequential buffer), so cells may differ by one 6dp
    // rounding step — that seam is the tolerance; anything larger is
    // a real divergence.
    val exploded = e
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
      .select(
        col("i"),
        posexplode(
          org.apache.spark.sql.functions.transform(
            slice(col("embedding"), col("i") + 1, lit(64)),
            xj => xj.cast("double") * col("xi").cast("double")))
          .as(Seq("dj", "p")))
      .groupBy("i", "dj")
      .agg(round(avg(col("p")), 6).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(0) + r.getInt(1)) -> r.getDouble(2))
      .toMap
    var exact = 0
    exploded.foreach { case ((i, j), v) =>
      val d = math.abs(fused(i)(j) - v)
      assert(d <= 1.0000001e-6, s"cell ($i,$j): fused ${fused(i)(j)} vs exploded $v")
      if (d == 0.0) exact += 1
    }
    assert(exact >= exploded.size * 95 / 100,
      s"only $exact/${exploded.size} cells bit-equal — more than rounding drift")
    // symmetry + a PSD witness (diagonal of E[x xᵀ] is E[xᵢ²] ≥ 0)
    (0 until 64).foreach { i =>
      assert(fused(i)(i) >= 0.0)
      (0 until 64).foreach(j => assert(fused(i)(j) == fused(j)(i)))
    }
  }

  test("rotate plan is one matvec_fd; moment plan is one bounded-state agg, no Generate") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val eye = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val rplan = Opq.rotate(e, eye).queryExecution.executedPlan.toString
    assert(rplan.contains("matvec_fd"), "rotate must be the fused kernel")
    assert(!rplan.contains("dot_product_fd"),
      "no per-row kernel array may survive in the rotate plan")
    val mplan = e.agg(graft.functions.secondMomentAgg(col("embedding"), 64))
      .queryExecution.executedPlan.toString
    assert(mplan.contains("second_moment"), "moment must be the bounded-state agg")
    assert(!mplan.contains("Generate"),
      "the n*d(d+1)/2 pair explode must not reappear in the moment plan")
  }

  test("MatVecFD rotate ≡ the 64-kernel array(dotFD) spelling, incl. null shapes") {
    import graft.functions.{dotFD, matvecFD}
    // real vectors + the degenerate shapes: a NULL array, a short
    // array (length mismatch), and an array with one NULL element —
    // each must yield 64 NULL elements, exactly what 64 individually
    // nulled kernels produced
    val spark2 = spark
    import spark2.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val weird = Seq(
      (100000L, null.asInstanceOf[Array[java.lang.Float]]),
      (100001L, Array[java.lang.Float](1.0f, 2.0f)),
      (100002L, Array.tabulate[java.lang.Float](64)(i =>
        if (i == 7) null else java.lang.Float.valueOf(i * 0.5f))))
      .toDF("vec_id", "embedding")
    val df = real.unionByName(weird).localCheckpoint(true)
    val rot = Opq.trainRotation(real)
    val oldSpelling = df.select(col("vec_id"),
      array(rot.map(r => dotFD(col("embedding"), lit(r)).cast("float")).toIndexedSeq: _*)
        .as("e"))
    val fused = df.select(col("vec_id"), matvecFD(col("embedding"), rot).as("e"))
    def dump(d: DataFrame): Map[Long, Seq[Option[Float]]] =
      d.collect().map { r =>
        val a = r.getSeq[Any](1).map(v => Option(v).map(_.asInstanceOf[Float]))
        r.getLong(0) -> a
      }.toMap
    val (o, f) = (dump(oldSpelling), dump(fused))
    assert(o.keySet == f.keySet)
    o.keySet.foreach { k =>
      assert(o(k) == f(k), s"vec $k: fused rotate diverges from the kernel spelling")
    }
    // the degenerate rows all come back as 64 NULL elements
    Seq(100000L, 100001L, 100002L).foreach { k =>
      assert(f(k).length == 64 && f(k).forall(_.isEmpty), s"vec $k null shape")
    }
  }
}
