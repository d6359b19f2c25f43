package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Embedding similarity search: brute-force cosine top-k (the exactness
  * baseline), label-blocked (IVF-style) near-dup pairing, and
  * random-hyperplane LSH signatures (the scale path).
  *
  * Determinism: float→double widening is exact and float×double products
  * are exact in double, so an in-order fold (`aggregate` over `zip_with`)
  * produces bit-identical dot products to the oracle's `list_reduce` left
  * fold. LSH hyperplane signs are derived from md5 parity, so both engines
  * generate the same planes with no RNG.
  *
  * Scale: brute-force is O(n) per query and embarrassingly parallel;
  * all-pairs work is bounded by blocking (label cells / LSH buckets)
  * instead of the quadratic full join.
  */
object SimilarityOps {

  /** embedding float array → double array column "v". */
  def asDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** In-order dot product of two double-array columns — the portable
    * higher-order-function formulation (bit-identical to [[graft.functions.DotProduct]]). */
  def dotExpr(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)")

  /** Native codegen'd dot product (requires [[VectorExpressions.register]]). */
  private def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  private def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k neighbors of `queryId` (rounded to 6 dp with
    * vec_id tie-break for a total order). */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    VectorExpressions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), asDoubleVec(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(cosine("v", "qv"), 6).as("cosine"))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
  }

  /** Near-duplicate pairs by cosine within label blocks (IVF cells with
    * given assignments), on a deterministic 1/`modulus` sample. Blocking +
    * sampling bound the pair count at any scale; the full-corpus variant
    * swaps the sample filter for LSH-bucket blocking. */
  def sampledNearDupPairs(embeddings: DataFrame, modulus: Int,
                          threshold: Double): DataFrame = {
    VectorExpressions.register(embeddings.sparkSession)
    val e = embeddings
      .filter(col("vec_id") % modulus === 0)
      .select(col("vec_id"), col("label"), asDoubleVec(col("embedding")).as("v"))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine("a.v", "b.v"), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** ±1 hyperplane components, plane p × dimension j, derived from the
    * parity of md5("p_j")'s first hex digit — an RNG-free construction
    * both engines can reproduce exactly. Evaluated once driver-side and
    * shipped as literals (leaving the md5 in the plan re-derives ~1M
    * constants per input row inside a non-codegen HOF). */
  def planeSigns(planes: Int, dims: Int): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      (0 until dims).map { j =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${p}_$j".getBytes("UTF-8"))
        val firstHex = "%02x".format(digest(0)).charAt(0)
        if (firstHex > '7') 1.0 else -1.0
      }
    }

  /** Random-hyperplane LSH: `planes` sign bits per vector. Shuffle-free
    * per-row computation; bucketing on the signature replaces all-pairs
    * search. */
  def lshSignature(planes: Int): Column = {
    val bits = planeSigns(planes, 64).map { signs =>
      val lit64 = signs.map(s => s"${s}D").mkString("array(", ", ", ")")
      when(expr(s"graft_dot(v, $lit64)") >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** IVF-style ANN with given cell assignments (`label`): centroids are
    * per-label elementwise sums (scale-invariant under cosine, and exact
    * via decimal accumulation → engine-portable), the query probes its
    * nearest centroid's cell only, then brute-forces top-k inside it.
    * At 100 TB this is the standard two-stage ANN shape: the centroid
    * table is tiny and broadcast, and only 1/|cells| of the corpus is
    * scanned per query. */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    VectorExpressions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("label"),
      asDoubleVec(col("embedding")).as("v"))
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sum(col("x").cast("decimal(18,9)")).cast("double").as("s"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, s))), p -> p.s)")
        .as("c"))
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    val best = cent.crossJoin(broadcast(q))
      .orderBy(cosine("c", "qv").desc, col("label"))
      .select("label").limit(1)
    e.join(broadcast(best), "label")
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"), round(cosine("v", "qv"), 6).as("cosine"))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
  }

  /** LSH bucket statistics: signature → vector count + min id. */
  def lshBuckets(embeddings: DataFrame, planes: Int): DataFrame = {
    VectorExpressions.register(embeddings.sparkSession)
    embeddings.select(col("vec_id"), asDoubleVec(col("embedding")).as("v"))
      .select(col("vec_id"), lshSignature(planes).as("signature"))
      .groupBy("signature")
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
  }
}
