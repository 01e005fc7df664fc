package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volume amplifiers shared by the scaling instruments ([[ScaleSmoke]]
  * consumers matrix, [[ChainScale]] chain-build tier): union N copies
  * of a real fixture with disjoint id spaces — a pure volume
  * amplifier (more symbols/docs/vectors at the same per-unit density,
  * matching how production data grows), never new synthetic fixtures.
  *
  * Two stances per modality, chosen by what the measured operator
  * does with CROSS-ROW structure:
  *   - plain ([[docs]], [[emb]], [[events]]): copies share content.
  *     Correct for map/agg/fixed-probe paths, where cross-copy
  *     sharing is irrelevant or is itself the linearity under test
  *     (dup groups growing N deep).
  *   - decorrelated ([[docsDistinct]], [[embDecor]]): copies share NO
  *     shingles / have ~0 cross-copy cosine. Correct for PAIRWISE
  *     paths (LSH chains, semantic dedup, NN-descent), where plain
  *     copies would collide across copies and grow candidates ~N² —
  *     measuring the FIXTURE's duplication, not the operator.
  */
object Amplify {

  /** max(id)+1 with an empty-input guard: max() over zero rows is
    * NULL, and `.getLong(0)` on that NULL is an opaque NPE (r18
    * ADVICE). Tools-only blast radius, but the clear message beats
    * the stack trace.
    */
  private def nextId(df: DataFrame, idExpr: org.apache.spark.sql.Column,
      what: String): Long = {
    val row = df.agg(idExpr.cast("long")).head()
    require(!row.isNullAt(0),
      s"Amplify.$what: input frame is empty (max id is NULL) - nothing to amplify")
    row.getLong(0) + 1
  }

  /** Events volume amplifier: disjoint event/user id spaces, per-copy
    * event_type suffix. Offset derived from the data: a hardcoded
    * stride would silently collide id spaces on inputs with larger
    * ids, merging unrelated users/events and corrupting the
    * measurement.
    */
  def events(ev: DataFrame, n: Int): DataFrame = {
    val maxId =
      nextId(ev, greatest(max(col("event_id")), max(col("user_id"))), "events")
    (0 until n).map { i =>
      ev.select(
        (col("event_id") + i * maxId).as("event_id"),
        col("ts"),
        (col("user_id") + i * maxId).as("user_id"),
        concat(col("event_type"), lit(s"_$i")).as("event_type"),
        col("value"))
    }.reduce(_ union _)
  }

  /** Plain docs amplifier: a per-copy suffix TOKEN varies the tail
    * grams; copies still share almost every shingle — fine wherever
    * the measured path has no pairwise (copy-vs-copy) work.
    */
  def docs(d: DataFrame, n: Int): DataFrame = {
    val maxId = nextId(d, max(col("doc_id")), "docs")
    (0 until n).map { i =>
      d.select(
        (col("doc_id") + i * maxId).as("doc_id"),
        concat(col("text"), lit(s" copy$i")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
  }

  /** Docs amplifier for the PAIRWISE paths (LSH chain): every token
    * gets a per-copy suffix, so copies of the same document share NO
    * shingles and cannot LSH-collide across copies — each copy
    * reproduces the corpus's own near-dup structure and candidate
    * volume grows ~Nx, which is exactly the linearity being measured.
    * (The plain text-suffix variant would leave the minhash
    * signatures of copies nearly identical: cross-copy band
    * collisions would grow candidates ~N², measuring the FIXTURE's
    * quadratic duplication, not the operator.)
    */
  def docsDistinct(d: DataFrame, n: Int): DataFrame = {
    val maxId = nextId(d, max(col("doc_id")), "docsDistinct")
    (0 until n).map { i =>
      // fixed-width copy tag: a variable-width "_9" vs "_99" suffix
      // grows every token (so every md5'd shingle) by an extra byte
      // between the 10x and 100x tiers, which reads as a spurious
      // ~1.1-1.2 exponent on hashing-bound stages (round-18 dedup.sigs
      // measurement); %03d keeps per-row bytes identical for n <= 1000
      d.select(
        (col("doc_id") + i * maxId).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "), t => concat(t, lit(f"_$i%03d")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
  }

  /** Plain embeddings amplifier (id-space shift only). */
  def emb(e: DataFrame, n: Int): DataFrame = {
    val maxId = nextId(e, max(col("vec_id")), "emb")
    (0 until n).map { i =>
      e.select((col("vec_id") + i * maxId).as("vec_id"), col("embedding"))
    }.reduce(_ union _)
  }

  /** Embeddings amplifier for the PAIRWISE paths (semantic dedup,
    * NN-descent): each copy is multiplied by its own deterministic ±1
    * diagonal (Rademacher signs), so cross-copy cosines collapse
    * toward 0 — copies reproduce the corpus's own near-dup structure
    * instead of being exact duplicates of each other (the plain
    * [[emb]] would make every cross-copy pair cosine 1.0 and measure
    * the fixture's N² duplication, exactly like the docsDistinct
    * note above).
    */
  def embDecor(e: DataFrame, n: Int): DataFrame = {
    val maxId = nextId(e, max(col("vec_id")), "embDecor")
    (0 until n).map { i =>
      val rnd = new scala.util.Random(i)
      val signs = array(Seq.fill(64)(lit(if (rnd.nextBoolean()) 1.0f else -1.0f)): _*)
      e.select(
        (col("vec_id") + i * maxId).as("vec_id"),
        zip_with(col("embedding"), signs, (x, s) => x * s).as("embedding"),
        col("label"))
    }.reduce(_ union _)
  }
}
