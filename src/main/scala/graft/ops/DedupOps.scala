package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.{Caches, Compaction, Skew}

/** Document deduplication for training-data pipelines: exact (hash
  * groups), n-gram Jaccard (shingle self-join), MinHash+LSH (banded
  * signature bucketing), and SimHash sketches.
  *
  * Scale design:
  *  - exact dedup = one hash-aggregate shuffle on the fingerprint;
  *  - Jaccard candidates come from an equi-join on shingle (shuffle by
  *    shingle); unique shingles keep bucket fan-out tiny, and at 100 TB a
  *    `spark.sql.shuffle.partitions` bump + salting of ultra-hot shingles
  *    (stopword-only n-grams) keeps partitions bounded;
  *  - MinHash/LSH replaces the all-pairs comparison with per-band
  *    bucketing: cost is O(docs × k) signature rows, and only
  *    band-colliding pairs are verified — the textbook path to Jaccard
  *    dedup over billions of documents;
  *  - SimHash is shuffle-free: a per-row higher-order-function fold.
  */
object DedupOps {

  /** (doc_id, shingle-array) rows — each doc's distinct word n-gram
    * shingle set as one array (docs below n words drop out).
    *
    * The word array is materialized in its own projection first: Generate
    * (explode) and non-codegen lambdas don't get subexpression
    * elimination, so inlining `normWords` into the shingle lambda would
    * re-tokenize the document once per shingle index (~50× per doc —
    * measured 10× slower). CollapseProject keeps the split because the
    * array is referenced multiple times by a non-cheap expression. */
  def shingleArrays(docs: DataFrame, n: Int): DataFrame =
    // CPU-dense tokenize+shingle kernel: spread the corpus before it
    // (scale-adaptive no-op on multi-split inputs; guide §2.5)
    graft.engine.Tables.kernelSpread(docs, "doc_id")
      .select(col("doc_id"), TextOps.normWords(col("text")).as("w"))
      // guard on the cheap input (|w| ≥ n ⟺ |shs| > 0): a size(shs) filter
      // would be pushed below the projection and re-run the shingle
      // transform inside the filter condition
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), TextOps.shingles(col("w"), n).as("shs"))

  /** Exploded (doc_id, shingle) pairs — the join-key form used for
    * candidate generation. */
  def shingleSets(docs: DataFrame, n: Int): DataFrame =
    shingleArrays(docs, n).select(col("doc_id"), explode(col("shs")).as("shingle"))

  /** Exact duplicate groups keyed on the normalized-vocabulary fingerprint:
    * survivor (min doc_id) + group size. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    TextOps.fingerprint(docs)
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("group_size"))

  /** Score candidate (doc_a, doc_b) pairs with exact Jaccard from the
    * per-doc shingle arrays: |A∩B| via array_intersect — two broadcast-able
    * joins against the array table, no shuffle of an exploded shingle
    * relation. `shl` must carry (doc_id, shs). */
  private def jaccardOf(pairs: DataFrame, shl: DataFrame): DataFrame =
    pairs
      .join(shl.select(col("doc_id").as("doc_a"), col("shs").as("_sa")), "doc_a")
      .join(shl.select(col("doc_id").as("doc_b"), col("shs").as("_sb")), "doc_b")
      .withColumn("i", size(array_intersect(col("_sa"), col("_sb"))).cast("long"))
      .withColumn("jaccard",
        col("i").cast("double") /
          (size(col("_sa")) + size(col("_sb")) - col("i")))
      .drop("_sa", "_sb")

  /** All-pairs n-gram Jaccard near-dup detection: pairs sharing ≥1 shingle,
    * scored |A∩B| / |A∪B|, kept at `threshold`.
    *
    * `saltFactor` > 1 salts the candidate self-join: side a gets one salt
    * from its doc-id hash, side b is replicated once per salt, and the
    * join key becomes (shingle, salt) — a hot shingle (stopword-only
    * n-gram shared by millions of docs) is split across `saltFactor`
    * partitions instead of landing one quadratic bucket on a single task.
    * The pair set is identical to the unsalted join: each qualifying
    * (a, b) pair matches exactly once, at b's replica of a's salt. */
  /** Data-derived salt factor for the candidate self-join: the hottest
    * shingle's document frequency over the per-bucket size a single task
    * should see. A fixed constant is a tuning hazard — right for one
    * corpus, 100× off after a 100× scale-up — while `ceil(maxDf/target)`
    * tracks the skew that actually arrived. One exact (deterministic)
    * max over the shingle df histogram, reusing the cached shingle
    * table; clamped to [1, cap] so a pathological corpus can't explode
    * the replication side of the salted join. Salting never changes the
    * pair set (OpsSpec property), so the derived value needs no oracle
    * twin. */
  def adaptiveSaltFactor(docs: DataFrame, n: Int, targetBucket: Long = 1000L,
                         cap: Int = 64): Int = {
    // session-scoped memo (same contract as the k-means memo: input files
    // stable within a session) — the derived factor is a per-corpus
    // constant, so the histogram pass runs once, not once per query run.
    // Keyed on a weak session id, not the session object: holding the
    // session in a global map would pin every closed session's state in
    // a long-lived JVM (a service spawning per-job sessions leaks them all).
    val key = (Caches.sessionId(docs.sparkSession), Caches.planKey(docs), n,
      targetBucket, cap)
    saltMemo.getOrElseUpdate(key, {
      val shl = Caches.ensureCached(shingleArrays(docs, n))
      val m = shl.select(explode(col("shs")).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("_d"))
        .agg(max(col("_d")).as("m")).head()
      if (m.isNullAt(0)) 1
      else math.min(cap.toLong,
        math.max(1L, (m.getLong(0) + targetBucket - 1) / targetBucket)).toInt
    })
  }

  private val saltMemo = graft.engine.Caches
    .sessionMemo[(String, String, Int, Long, Int), Int]()

  /** [[jaccardPairs]] with the salt factor derived from the corpus's own
    * shingle-df histogram instead of a hand-picked constant. */
  def jaccardPairsAdaptive(docs: DataFrame, n: Int, threshold: Double,
                           targetBucket: Long = 1000L): DataFrame =
    jaccardPairs(docs, n, threshold,
      saltFactor = adaptiveSaltFactor(docs, n, targetBucket))

  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                   saltFactor: Int = 1): DataFrame = {
    // The shingle-array table feeds candidate generation (exploded) and
    // scoring (arrays) — persist it instead of re-tokenizing per consumer.
    // At cluster scale this is the materialized shingle table every LSH
    // pipeline keeps.
    val shl = Caches.ensureCached(shingleArrays(docs, n))
    val sh = shl.select(col("doc_id"), explode(col("shs")).as("shingle"))
    val a = sh.withColumn("_salt", pmod(hash(col("doc_id")), lit(saltFactor)))
    val bRep = sh.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val cand = a.as("a")
      .join(bRep.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a._salt") === col("b._salt") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardOf(cand, shl)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "i", "jaccard")
  }

  /** MinHash signatures via the two-hash construction: each shingle is
    * md5'd ONCE, split into two 40-bit integers (h1, h2), and hash
    * function i is the affine combination h1 + i·h2 (Kirsch–Mitzenmacher)
    * — k minhashes for one digest per shingle instead of k. Fits in a
    * long for k ≤ 8 (2^40 + 7·2^40 < 2^63), and DuckDB reproduces it
    * bit-for-bit via `('0x' || substr(md5(s), …))::BIGINT`.
    *
    * Takes the (persisted) shingle-array table — the cache is the
    * materialization barrier, so each derivation step runs once over
    * stored arrays. (Deriving arrays inline lets the optimizer collapse
    * projections and re-tokenize the document inside nested lambdas —
    * measured 3× slower.) */
  def minhashSignatures(shl: DataFrame, k: Int): DataFrame =
    shl
      .select(col("doc_id"),
        expr("transform(shs, sgl -> md5(sgl))").as("hs"))
      .select(col("doc_id"),
        expr("transform(hs, h -> cast(conv(substr(h, 1, 10), 16, 10) as bigint))").as("a1"),
        expr("transform(hs, h -> cast(conv(substr(h, 11, 10), 16, 10) as bigint))").as("a2"))
      .select(col("doc_id"),
        expr(s"transform(sequence(0, ${k - 1}), i -> array_min(zip_with(a1, a2, (x, y) -> x + i * y)))")
          .as("sig"))

  /** MinHash + LSH near-dup pairs: k minhashes banded `bands` ways; pairs
    * colliding in any band are candidates, then verified with true Jaccard
    * at `threshold`. Identical construction on the oracle side, so results
    * (including LSH misses) are bit-reproducible. */
  def minhashLshPairs(docs: DataFrame, n: Int, k: Int, bands: Int,
                      threshold: Double): DataFrame = {
    require(bands >= 1 && k % bands == 0,
      s"minhashLshPairs: bands ($bands) must divide k ($k) — a remainder " +
        "silently truncates the signature (the caller pays for k but " +
        "gets the recall curve of bands*(k/bands)), and bands > k " +
        "generates an empty band expression")
    val rows = k / bands
    val shl = Caches.ensureCached(shingleArrays(docs, n))
    // persist the (tiny) signature table: posexplode's Generate gets no
    // subexpression elimination, so without a barrier the whole
    // md5→conv→minhash chain is inlined into the band expression and
    // re-derived per band element per join side (measured ~20× the
    // signature cost)
    val sig = Caches.ensureCached(minhashSignatures(shl, k))
    val bandExpr =
      s"transform(sequence(0, ${bands - 1}), b -> md5(concat_ws('_', " +
        (0 until rows).map(r => s"cast(sig[b * $rows + $r] as string)").mkString(", ") + ")))"
    val banded = sig.select(col("doc_id"),
      posexplode(expr(bandExpr)).as(Seq("band", "bh")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardOf(cand, shl)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "i", "jaccard")
  }

  /** Transitive duplicate groups from a near-dup pair relation: connected
    * components of the (doc_a, doc_b) graph, each doc labeled with the
    * minimum doc_id of its component (the canonical survivor). Docs in no
    * pair form singleton groups.
    *
    * Algorithm: distributed min-label propagation with pointer doubling —
    * every doc starts as its own label; each round a doc adopts the
    * minimum label among itself, its neighbors, AND its current label's
    * label (the label-of-label join halves remaining chain lengths, so
    * rounds are O(log diameter), not O(diameter)); stop at the fixpoint
    * (no label changed). The driver only counts changes — labels never
    * leave the cluster.
    *
    * The label table is memoized per (session, docs-plan, pairs-plan):
    * a curation suite consults the SAME group structure from several
    * operators (the group report, survivor selection, filtered exports),
    * and a pipeline materializes components once — re-running the
    * iterative loop per consumer was the engine's one repeated-iterative
    * pattern (same static-input assumption as the k-means memo and
    * Spark's own relation cache).
    *
    * Consumption contract: the returned frame is served from a BOUNDED
    * cache whose eviction releases the checkpoint blocks behind it
    * (lineage is truncated, so evicted labels cannot recompute) — act
    * on a dupGroups result promptly; a lazy handle held across
    * [[MaxGroupMemoEntries]] further distinct-corpus dupGroups calls in
    * one session fails LOUDLY on next use (checkpoint block not found)
    * rather than silently growing executor storage without bound. */
  def dupGroups(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val memo = groupsMemo(docs.sparkSession)
    // entry-count bound: each value pins a localCheckpoint-backed label
    // table in the block manager, and the SoftReference only reacts to
    // DRIVER heap pressure — unbounded entries would accumulate
    // executor storage across many corpora in one service session.
    // A pure cache, so the cheap bound is clear-and-recompute; the
    // evicted values' checkpoint BLOCKS are released explicitly first
    // (unpersist, not GC) — waiting for driver GC + ContextCleaner
    // would leave the dropped tables' executor storage resident
    // indefinitely under driver-heap headroom.
    if (memo.size >= MaxGroupMemoEntries) {
      memo.values.foreach(Caches.releaseCheckpoint)
      memo.clear()
    }
    val labels = memo
      .getOrElseUpdate((Caches.planKey(docs), Caches.planKey(pairs)), {
        labelRuns += 1
        propagateLabels(pairs)
      })
    docs.select("doc_id").join(labels, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"))
  }

  // Weakly keyed BY SESSION, value held via SoftReference. The memo
  // values are DataFrames, which strongly reference their session — a
  // strongly-held value would therefore reference its own weak key, the
  // exact pattern the WeakHashMap javadoc warns prevents key discard
  // (the entry, and the closed session behind it, would be pinned
  // forever). Through the soft indirection the value chain no longer
  // strongly reaches the key: under memory pressure the GC clears the
  // reference, the session becomes collectable, and the memo — a pure
  // cache over `propagateLabels` — is simply recomputed on next use.
  private val MaxGroupMemoEntries = 64

  private val groupsMemos = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.lang.ref.SoftReference[
        scala.collection.concurrent.TrieMap[(String, String), DataFrame]]]())

  private def groupsMemo(s: org.apache.spark.sql.SparkSession)
      : scala.collection.concurrent.TrieMap[(String, String), DataFrame] =
    groupsMemos.synchronized {
      Option(groupsMemos.get(s)).flatMap(r => Option(r.get())) match {
        case Some(m) => m
        case None =>
          val m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
          groupsMemos.put(s, new java.lang.ref.SoftReference(m))
          m
      }
    }

  /** Times the propagation loop actually ran (test hook for the memo). */
  private[graft] var labelRuns = 0

  /** The min-label-propagation loop behind [[dupGroups]]: returns the
    * (doc_id, group_id) label table for every doc touching ≥ 1 pair,
    * backed by its final round's localCheckpoint. */
  private def propagateLabels(pairs: DataFrame): DataFrame = {
    val idType = pairs.schema("doc_a").dataType
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .persist()
    edges.count() // materialize once; reused every round
    // only docs appearing in ≥1 pair can ever change label — iterate over
    // that (small) set and re-attach the singleton majority at the end.
    // At 100 TB this is the difference between propagating labels across
    // the whole corpus and across the near-dup subgraph only.
    //
    // Each round's labels are localCheckpoint'ed (eager), not persisted:
    // a round references the previous labels three times, so without
    // lineage TRUNCATION the logical plan grows ~4× per round and
    // exponential plan trees OOM the driver long before the data does —
    // the standard failure mode of driver-looped iterative algorithms
    // (GraphX checkpoints for the same reason; a cluster deployment
    // would use reliable checkpointing instead of local).
    var labels = edges.select(col("u").as("doc_id")).distinct()
      .withColumn("group_id", col("doc_id")).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      // convergence detection rides the round aggregate: the self branch
      // carries the doc's previous label in `_prev` (exactly one such row
      // per doc), so min(_prev) recovers it next to the new min label and
      // `changed` is a filter-count over the checkpointed result — no
      // separate join-against-previous job per round.
      val viaNeighbors = edges
        .join(labels.select(col("doc_id").as("v"), col("group_id")), "v")
        .select(col("u").as("doc_id"), col("group_id"),
          lit(null).cast(idType).as("_prev"))
      val self = labels.select(col("doc_id"), col("group_id"),
        col("group_id").as("_prev"))
      // pointer doubling: inherit the label of one's label. A no-op in
      // round 1 (labels are still the identity map), so skip it there.
      val withParent =
        if (round == 1) self.unionByName(viaNeighbors)
        else self.unionByName(viaNeighbors).unionByName(
          labels.as("x")
            .join(labels.select(col("doc_id").as("group_id"),
              col("group_id").as("_pg")), "group_id")
            .select(col("doc_id"), col("_pg").as("group_id"),
              lit(null).cast(idType).as("_prev")))
      val next = withParent
        .groupBy("doc_id").agg(min(col("group_id")).as("group_id"),
          min(col("_prev")).as("_prev"))
        .localCheckpoint()
      changed = next.filter(col("group_id") =!= col("_prev")).count()
      // the prior round's checkpoint blocks are dead once `changed` is
      // computed — release them so block-manager usage stays O(1) in the
      // round count (the final round's checkpoint backs the result and
      // is kept)
      Caches.releaseCheckpoint(labels)
      labels = next.select("doc_id", "group_id")
    }
    edges.unpersist()
    labels
  }

  /** 16-bit SimHash sketch from md5 nibbles: dimension d takes the high
    * bit of hex digit d of each word's md5; the sketch bit is the sign of
    * the ±1 sum. Pure per-row fold — no shuffle, scan-speed at any scale.
    * Exact integer arithmetic, so order-independent and oracle-stable. */
  def simhash(docs: DataFrame): DataFrame = {
    val bitExprs = (1 to 16).map { d =>
      s"CASE WHEN aggregate(transform(w, x -> CASE WHEN substr(md5(x), $d, 1) > '7' THEN 1 ELSE -1 END), 0, (acc, x) -> acc + x) >= 0 THEN '1' ELSE '0' END"
    }
    docs.select(col("doc_id"), TextOps.normWords(col("text")).as("w"))
      .select(col("doc_id"),
        expr(s"concat(${bitExprs.mkString(", ")})").as("simhash"))
  }

  /** Transitive duplicate groups by alternating large-star / small-star
    * contraction — the MapReduce connected-components construction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
    * an alternative round step to [[dupGroups]]'s min-label propagation
    * built from the same join primitives.
    *
    * Per round, with the symmetric neighbor relation:
    *  - large-star: every node u links each LARGER neighbor to
    *    m(u) = min(Γ(u) ∪ {u}) — long chains fold toward minima from
    *    every node at once;
    *  - small-star: on the now-downward-pointing edges, every node u
    *    re-links its smaller-or-equal neighbors (and itself) to their
    *    minimum — stars flatten.
    *
    * Converges to per-component stars centered at the component minimum
    * in O(log n) rounds on ANY graph shape — min-label propagation with
    * pointer doubling is O(log diameter) on the LABEL table but its
    * per-round candidate set rides the raw edge relation, so an
    * adversarial long-chain corpus (poisoned near-dup chains) degrades
    * it; star contraction also SHRINKS the edge relation as components
    * fold, so round cost decreases. Crossover guidance in PLANS.md.
    * Same driver discipline as [[dupGroups]]: per-round eager
    * `localCheckpoint` (lineage truncation), only counts collected. */
  def dupGroupsStar(docs: DataFrame, pairs: DataFrame): DataFrame = {
    def canon(e: DataFrame): DataFrame =
      e.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
    var edges = canon(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .localCheckpoint()
    var converged = edges.isEmpty
    while (!converged) {
      val sym = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      // large-star: (v, m(u)) for v ∈ Γ(u), v > u
      val minsL = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(minsL, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star over the downward edges: every (v, m(u)) for the
      // smaller-or-equal neighborhood, plus the center's own link
      val symS = ls.unionByName(ls.select(col("v").as("u"), col("u").as("v")))
      val down = symS.filter(col("v") <= col("u"))
      val minsS = down.groupBy("u").agg(min(col("v")).as("m"))
      val ss = down.join(minsS, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(minsS.filter(col("u") =!= col("m"))
          .select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()
      // fixpoint: the canonical edge set stopped changing (stars map to
      // themselves under both phases)
      converged = ss.count() == edges.count() &&
        ss.join(edges, Seq("u", "v"), "left_anti").isEmpty
      // prior round's checkpoint is dead after the fixpoint check —
      // release its blocks (the final round's backs the result)
      Caches.releaseCheckpoint(edges)
      edges = ss
    }
    docs.select("doc_id")
      .join(edges.select(col("u").as("doc_id"), col("v").as("group_id")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"))
  }

  /** 64-bit SimHash packed into a long — the pairing-grade sketch.
    * Two bit sources per md5 hex digit give 64 dimensions from ONE digest
    * per word: dimension d ≤ 32 takes the high bit of hex digit d
    * (value > 7), dimension d > 32 takes the parity bit of hex digit
    * d−32 (odd value) — independent bits of the same digit. Bit d of the
    * sketch is the sign of the ±1 sum over words, packed big-endian
    * (bit 1 is the long's sign bit — two's-complement on both engines).
    * Single-pass shape: one md5 per word (materialized in its own
    * projection — the Generate/HOF subexpression trap), then ONE fold
    * carrying a 64-wide count vector (64 separate sign-folds would
    * re-iterate the word array 64× per row), then one pack projection.
    * Exact integer arithmetic throughout, so the result is
    * order-independent and bit-identical to the oracle's per-dimension
    * sums. */
  def simhashLong(docs: DataFrame): DataFrame = {
    val countsExpr =
      "aggregate(h, array_repeat(0, 64), (acc, x) -> " +
        "zip_with(acc, sequence(1, 64), (a, d) -> " +
        "a + (CASE WHEN d <= 32 " +
        "THEN (CASE WHEN substr(x, d, 1) > '7' THEN 1 ELSE -1 END) " +
        "ELSE (CASE WHEN substr(x, d - 32, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) END)))"
    val packTerms = (1 to 64).map { d =>
      // d = 1 is the sign bit: 1L << 63 has no positive literal — write
      // Long.MinValue as the overflow-free (-(2^63-1) - 1) on both engines
      val weight = if (d == 1) "(-9223372036854775807L - 1L)"
                   else s"${1L << (64 - d)}L"
      s"(CASE WHEN c[${d - 1}] >= 0 THEN $weight ELSE 0L END)"
    }
    // CPU-dense kernel (per-token md5 + 64-dim fold): spread the corpus
    graft.engine.Tables.kernelSpread(docs, "doc_id")
      .select(col("doc_id"), TextOps.normWords(col("text")).as("w"))
      .select(col("doc_id"), expr("transform(w, x -> md5(x))").as("h"))
      .select(col("doc_id"), expr(countsExpr).as("c"))
      .select(col("doc_id"), expr(packTerms.mkString(" + ")).as("sh"))
  }

  /** SimHash near-duplicate pairs at Hamming distance ≤ `maxDist`: the
    * 64-bit sketch is cut into `bands` bands of `bandBits` bits; by
    * pigeonhole, any pair within distance ≤ bands−1 agrees exactly on at
    * least one band, so the band equi-join generates every qualifying
    * pair (plus a few extra-band collisions), then `bit_count(xor)`
    * verifies the exact distance. This is the banded construction that
    * makes simhash dedup O(docs × bands) at 100 TB — candidates come
    * from hash-bucket joins, never an all-pairs comparison; the sketch
    * rides along the join so verification needs no second lookup. The
    * default 4×16-bit banding gives 65 536 buckets per band (the old
    * 4×8-bit layout capped at 256 — bucket occupancy, and with it the
    * candidate join, grew linearly with corpus size); at larger corpora
    * widen further (e.g. 8 bands × 8 of 16 bits chosen per doc) to keep
    * expected occupancy bounded. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   bands: Int = 4, bandBits: Int = 16): DataFrame =
    hashPairs64(Caches.ensureCached(simhashLong(docs)), "sh",
      maxDist, bands, bandBits)

  /** Near-duplicate pairs over ANY 64-bit signature table — the banded
    * candidate join + exact Hamming verify factored out of
    * [[simhashPairs]], reusable by every 64-bit sketch (text SimHash,
    * image perceptual hash): two rows pair when some `bandBits`-wide
    * band of their signatures matches exactly (recall guaranteed for
    * maxDist < bands by pigeonhole), then the exact `bit_count(xor)`
    * filter keeps real neighbors. O(rows × bands) candidate keys —
    * never an all-pairs join. `sk` must carry (doc_id, `hashCol`). */
  def hashPairs64(sk: DataFrame, hashCol: String, maxDist: Int,
                  bands: Int = 4, bandBits: Int = 16): DataFrame = {
    require(bands * bandBits == 64, "bands × bandBits must tile the 64-bit sketch")
    require(maxDist < bands,
      s"$bands bands guarantee recall only for maxDist <= ${bands - 1}")
    val mask = (1L << bandBits) - 1
    val banded = sk.select(col("doc_id"), col(hashCol).as("_sh"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> shiftright($hashCol, b * $bandBits) & ${mask}L)"))
        .as(Seq("band", "bv")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a._sh").as("_sha"),
        col("b.doc_id").as("doc_b"), col("b._sh").as("_shb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("cast(bit_count(_sha ^ _shb) as bigint)").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** STORED 64-bit-signature index — the incremental-screen lifecycle
    * for [[hashPairs64]]-style sketches (text SimHash, image aHash):
    * where the inline pair join answers "which pairs exist in THIS
    * corpus", the stored index answers the ingestion question "is this
    * NEW item a near-dup of anything ever seen" without touching old
    * data. Layout: one `bands` table of (band, bv, doc_id, sig) rows —
    * `bands`-per-item fan-out, clustered by (band, bv) so a probe's
    * bucket keys co-locate. Merge APPENDS the batch's band rows
    * (O(|batch|·bands), old files untouched, concurrent readers
    * consistent); the probe broadcast-joins the (small) batch against
    * the stored table — the index itself NEVER shuffles, the
    * [[queryFingerprintIndex]] posture. Exact-duplicate band rows left
    * by replayed merges are dropped at candidate level and removed
    * permanently by the `ahash` compaction kind. */
  def buildHashIndex(sk: DataFrame, path: String,
                     bands: Int = 4, bandBits: Int = 16): Unit = {
    val spark = sk.sparkSession
    import spark.implicits._
    require(bands * bandBits == 64, "bands × bandBits must tile the 64-bit sketch")
    Seq((bands, bandBits)).toDF("bands", "band_bits")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    bandRows(sk, bands, bandBits)
      .repartition(col("band"), col("bv"))
      .sortWithinPartitions("band", "bv", "doc_id")
      .write.mode("overwrite").parquet(s"$path/bands")
    Compaction.seedBase(s"$path/bands")
  }

  /** Append one doc-id-disjoint batch — O(|batch|·bands). Fails loudly
    * if any id in the batch carries an unserved tombstone: re-inserting
    * a deleted id before the compaction tick has cleared it would be
    * silently re-screened out by the tombstone ([[tombstoneHashIndex]]);
    * run the tick (physical deletion) first, then re-insert. */
  def mergeHashIndex(skNew: DataFrame, path: String): Unit = {
    val spark = skNew.sparkSession
    val (bands, bandBits) = hashIndexMeta(spark, path)
    Compaction.requireNoTombClash(skNew, path, "doc_id", "mergeHashIndex")
    Compaction.guardedAppend(s"$path/bands") { live =>
      bandRows(skNew, bands, bandBits)
        .coalesce(1).write.mode("append").parquet(live)
    }
  }

  /** DELETE from the banded hash index — the right-to-be-forgotten verb
    * for an append-only store, the LSM way: deletion APPENDS (doc_id)
    * tombstone rows (O(|ids|), old files untouched, a writer verb under
    * the same single-writer schedule as merges). Effect is immediate at
    * the query layer — [[queryHashIndex]] screens candidates against
    * the tombstone set — and physical at the next `ahash` compaction,
    * which rewrites the band table without the tombstoned rows and
    * clears the served tombstones. `ids` carries one id column. */
  def tombstoneHashIndex(ids: DataFrame, path: String): Unit =
    tombstoneIndex(ids, path)

  /** The tombstone WRITE verb both doc-keyed families share (the read
    * side is [[indexTombstones]]) — delegates to the engine-wide
    * protocol verb so a fix lands once, for every tombstoning family
    * (including the vec_id-keyed ANN indexes). */
  private def tombstoneIndex(ids: DataFrame, path: String): Unit =
    Compaction.appendTombstones(ids, path)

  /** The live tombstone set of ANY stored index rooted at `path`, if
    * one exists — shared by the probes (screen), the merges (re-insert
    * guard), and the compactions (physical delete). */
  private[graft] def indexTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] =
    Compaction.pendingTombstones(spark, path)

  /** THE doc-keyed tombstone screen — the one anti-join every
    * doc-indexed read path applies before serving rows, factored out so
    * the probes and the [[PurgeAudit]] certify the SAME code. The
    * broadcast is size-guarded: a mass purge's tombstone set falls back
    * to planner strategy instead of a forced driver broadcast. */
  private[graft] def screenDocTombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String, rows: DataFrame): DataFrame =
    indexTombstones(spark, path) match {
      case Some(t) =>
        rows.join(Skew.maybeBroadcast(t), Seq("doc_id"), "left_anti")
      case None => rows
    }

  /** Screened (tombstone-dropped) band rows of a stored hash index —
    * the audit's view of exactly what [[queryHashIndex]] can match. */
  private[graft] def liveHashBands(spark: org.apache.spark.sql.SparkSession,
                                   path: String): DataFrame =
    screenDocTombstones(spark, path,
      spark.read.parquet(Compaction.resolve(s"$path/bands")))

  /** Screened postings of a stored fingerprint index — exactly what
    * [[queryFingerprintIndex]] can match. */
  private[graft] def liveFingerprintPostings(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    screenDocTombstones(spark, path,
      spark.read.parquet(Compaction.resolve(s"$path/postings")))

  /** Screened sizes table of a stored fingerprint index — the doc-level
    * membership view (one row per indexed doc with ≥ 1 kept
    * fingerprint; replayed merges may duplicate rows exactly). */
  private[graft] def liveFingerprintSizes(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    screenDocTombstones(spark, path,
      spark.read.parquet(Compaction.resolve(s"$path/sizes")))

  /** Screen a batch of signatures against the stored index: candidates
    * from the banded broadcast probe, verified by exact Hamming ≤
    * `maxDist`. Returns (doc_new, doc_old, hamming); candidate-level
    * distinct absorbs both replay-duplicated index rows and multi-band
    * matches. */
  def queryHashIndex(spark: org.apache.spark.sql.SparkSession,
                     batch: DataFrame, path: String,
                     maxDist: Int): DataFrame = {
    val (bands, bandBits) = hashIndexMeta(spark, path)
    require(maxDist < bands,
      s"$bands bands guarantee recall only for maxDist <= ${bands - 1}")
    // tombstone screen: deleted items stop matching IMMEDIATELY, before
    // the compaction makes the deletion physical; the probe broadcast
    // below is size-guarded like the screen's — an oversized replay
    // batch must fall back to planner strategy instead of a forced
    // driver-side broadcast OOM
    val stored = liveHashBands(spark, path)
    val probe = bandRows(batch, bands, bandBits)
      .withColumnRenamed("doc_id", "doc_new")
      .withColumnRenamed("sig", "_sn")
    stored.join(Skew.maybeBroadcast(probe), Seq("band", "bv"))
      .filter(col("doc_id") =!= col("doc_new"))
      .select(col("doc_new"), col("doc_id").as("doc_old"),
        col("_sn"), col("sig"))
      .distinct()
      .select(col("doc_new"), col("doc_old"),
        expr("cast(bit_count(_sn ^ sig) as bigint)").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  private def hashIndexMeta(spark: org.apache.spark.sql.SparkSession,
                            path: String): (Int, Int) = {
    val m = spark.read.parquet(s"$path/meta").head()
    (m.getInt(0), m.getInt(1))
  }

  private def bandRows(sk: DataFrame, bands: Int, bandBits: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    // exactly (doc_id, <signature>): silently picking "the first other
    // column" of a wider frame would index the wrong column with no
    // error — the caller projects before handing the table over
    require(sk.columns.length == 2 && sk.columns.contains("doc_id"),
      s"hash index expects exactly (doc_id, <signature>) columns, " +
        s"got ${sk.columns.mkString("(", ", ", ")")}")
    val hashCol = sk.columns.filterNot(_ == "doc_id").head
    sk.select(col("doc_id"), col(hashCol).as("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> shiftright($hashCol, b * $bandBits) & ${mask}L)"))
        .as(Seq("band", "bv")))
      .select(col("band"), col("bv"), col("doc_id"), col("sig"))
  }

  /** Chunk-level exact dedup — the paragraph-dedup pass (CCNet-style)
    * adapted to a delimiter-free corpus: each doc is cut into
    * non-overlapping `chunkWords`-word windows, each chunk hashed, and a
    * chunk whose hash occurs in more than one document is
    * corpus-duplicated boilerplate. Per doc: chunk count, duplicated
    * chunk count, duplicated ratio.
    *
    * Scale shape: one explode (≤ |words|/chunkWords rows per doc — far
    * below shingling's per-word fan-out), one hash aggregate by chunk
    * hash for the document frequency, and the doc↔chunk-df join rides
    * the same hash partitioning as the aggregate. Everything is linear
    * in corpus size; no self-join exists to go quadratic, which is why
    * paragraph dedup is the pass production pipelines can afford on the
    * FULL corpus before any near-dup candidate generation. */
  def chunkDupStats(docs: DataFrame, chunkWords: Int = 20): DataFrame = {
    val cw = chunkWords
    // words materialized before the chunk transform (same Generate /
    // lambda recompute trap as shingleArrays)
    val words = docs.select(col("doc_id"), TextOps.normWords(col("text")).as("w"))
    // cached: the tokenize+per-chunk-md5 plan feeds BOTH the df
    // aggregate and the join side — uncached, the full scan runs twice
    val chunks = Caches.ensureCached(words.select(col("doc_id"),
      explode(expr(
        s"""transform(sequence(1, cast(ceil(size(w) / ${cw}.0) as int)),
           |  i -> md5(concat_ws(' ', slice(w, (i - 1) * $cw + 1, $cw))))""".stripMargin))
        .as("chunk_hash")))
    val df = chunks.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("_docs"))
    chunks.join(df, "chunk_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_docs") > 1L, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_chunk_ratio",
        col("n_dup_chunks").cast("double") / col("n_chunks"))
  }

  /** Survivor selection over transitive duplicate groups: every doc keeps
    * exactly one flag — `keep = true` for the group's best-quality member
    * (ties broken by lowest doc_id), false for the rest. The downstream
    * "apply" is a trivial `filter(keep)`; emitting the full decision
    * table keeps the operator auditable (which doc won, at what score).
    * One window pass partitioned by group — at 100 TB groups are tiny
    * (near-dup clusters), so the partition-by-group shuffle is balanced
    * by construction. */
  def keepBest(groups: DataFrame, quality: DataFrame,
               scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group_id"))
      .orderBy(col(scoreCol).desc, col("doc_id"))
    groups.join(quality, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("group_id"), col(scoreCol), col("keep"))
  }

  // ── Incremental dedup: stored fingerprint index (build/merge/query) ──
  // The CDC×dedup composition: an arriving change batch is screened for
  // near-duplication against the CORPUS without rescanning it — the
  // third stored-index lifecycle alongside IVF (vectors) and BM25
  // (keywords). Four parquet tables under `path`:
  //   postings (fp, doc_id)  df-capped, repartitioned by fp;
  //   sizes    (doc_id, n)   per-doc kept-fingerprint count (the
  //                          containment denominator, stored so queries
  //                          never re-aggregate the index);
  //   dfs      (fp, df)      per-fingerprint document frequency;
  //   hot      (fp)          fingerprints with df > maxDf at BUILD time.
  // The hot list is FROZEN between rebuilds (same discipline as IVF's
  // frozen centroids): merges drop frozen-hot fingerprints from new
  // postings and update dfs, but never re-derive the cap — a fingerprint
  // that turns hot through merges is a rebuild decision, not a
  // merge-time one.

  private def winnowExploded(docs: DataFrame, k: Int, w: Int): DataFrame =
    TextOps.winnowFps(docs, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))

  /** Build the stored fingerprint index over `docs`. One explode + two
    * hash aggregates — the cost of a word count, linear in corpus size.
    * The build parameters (k, w, maxDf) are persisted in a one-row
    * `meta` table: the hot-list cap is frozen INTO `hot`, so any later
    * drift measurement must use the same cap — with the cap now
    * corpus-derived (adaptiveMaxDf) rather than a constant, a caller
    * cannot re-guess it. */
  def buildFingerprintIndex(docs: DataFrame, path: String, k: Int = 8,
                            w: Int = 4, maxDf: Int = 10): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((k, w, maxDf)).toDF("k", "w", "max_df")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val ex = winnowExploded(docs, k, w)
    ex.groupBy("fp").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/dfs")
    spark.read.parquet(Compaction.resolve(s"$path/dfs"))
      .filter(col("df") > maxDf).select("fp")
      .write.mode("overwrite").parquet(s"$path/hot")
    val kept = ex.join(spark.read.parquet(s"$path/hot"), Seq("fp"), "left_anti")
    kept.repartition(col("fp")).sortWithinPartitions("fp", "doc_id")
      .write.mode("overwrite").parquet(s"$path/postings")
    spark.read.parquet(s"$path/postings")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$path/sizes")
    // freeze the fresh layout's file counts as the compaction trigger's
    // debt baseline: a large build is not debt (Compaction.seedBase)
    Compaction.seedBase(s"$path/postings")
    Compaction.seedBase(s"$path/sizes")
  }

  /** Append a new batch to the index: postings/sizes are APPENDED (old
    * files never rewritten — concurrent readers stay consistent), dfs is
    * re-summed from O(|new|+|vocab|) inputs, the hot list stays frozen.
    * Merge cost is O(|new docs|) regardless of index size. Assumes
    * `newDocs` is doc_id-disjoint from the indexed corpus (the CDC
    * contract: updates arrive as delete + insert).
    *
    * NOT batch-atomic: this is THREE writes (postings append, sizes
    * append, dfs version flip), so a crash anywhere inside leaves a
    * partially applied batch with no ledger row, and the ledger
    * protocol ([[graft.streaming.CdcStream.screenAndAbsorb]]) replays
    * the WHOLE merge on restart. The replay's effects are contained:
    * duplicated postings/sizes rows are exact duplicates that
    * [[queryFingerprintIndex]] drops at candidate level, so screening
    * results are unaffected; dfs can double-count the batch's
    * fingerprints IF the crash hit after the dfs pointer flip, which can
    * only overstate [[hotListDrift]]'s advisory rebuild signal, never a
    * screening answer. True multi-table atomicity would need a
    * manifest/commit-log layer (Delta-style) this engine deliberately
    * doesn't carry. */
  /** DELETE from the fingerprint index — [[tombstoneHashIndex]]'s twin
    * for the flagship dedup family: appended (doc_id) tombstones screen
    * the probe immediately, the forced `fingerprint` compaction drops
    * the ids' postings and sizes rows physically and clears the served
    * tombstones. The `dfs`/`hot` tables are NOT adjusted (they feed
    * only the advisory df caps and the frozen hot list, which may
    * overstate until the next rebuild — the same advisory posture as
    * hotListDrift). */
  def tombstoneFingerprintIndex(ids: DataFrame, path: String): Unit =
    tombstoneIndex(ids, path)

  def mergeFingerprintIndex(newDocs: DataFrame, path: String, k: Int = 8,
                            w: Int = 4): Unit = {
    val spark = newDocs.sparkSession
    // re-insert guard: a tombstoned id must stay gone until the tick
    // serves the deletion, or the tombstone would silently re-screen
    // the fresh rows
    Compaction.requireNoTombClash(newDocs, path, "doc_id",
      "mergeFingerprintIndex")
    val ex = winnowExploded(newDocs, k, w)
    // empty change batch (or all docs below the winnow length floor):
    // leave every artifact untouched instead of rewriting dfs in place
    if (ex.isEmpty) return
    val kept = Caches.ensureCached(
      ex.join(spark.read.parquet(s"$path/hot"), Seq("fp"), "left_anti"))
    // guardedAppend: fail loudly (BEFORE the caller's ledger append, so
    // the batch replays) if a compactor swapped the pointer mid-append —
    // rows written into a superseded version would be vacuumed away
    Compaction.guardedAppend(s"$path/postings") { live =>
      kept.repartition(col("fp")).sortWithinPartitions("fp", "doc_id")
        .write.mode("append").parquet(live)
    }
    Compaction.guardedAppend(s"$path/sizes") { live =>
      kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
        .write.mode("append").parquet(live)
    }
    val mergedDfs = spark.read.parquet(Compaction.resolve(s"$path/dfs"))
      .unionByName(ex.groupBy("fp").agg(count(lit(1)).as("df")))
      .groupBy("fp").agg(sum("df").as("df"))
    // ATOMIC pointer-swap rewrite (Compaction's versioned layout — the
    // plain-dir fallback keeps pre-versioning indexes readable): an
    // in-place overwrite deletes the live dfs before the new files
    // commit, so a crash inside it destroyed dfs and permanently
    // wedged the replay path (every retry read a missing table). With
    // the version flip, a crash before the pointer move leaves the OLD
    // dfs live and the replay recomputes from it; a crash after the
    // move leaves the NEW one — the worst case is back to the
    // documented advisory df double-count, never a wedge. Writing a
    // fresh version dir also reads-while-writing safely, so the
    // localCheckpoint materialization this replaces is unnecessary.
    Compaction.publishVersion(s"$path/dfs") { dir =>
      mergedDfs.write.parquet(dir)
    }
  }

  /** The rebuild signal for the frozen hot list — the dedup analogue of
    * [[graft.ops.SimilarityOps.shouldRetrain]]: merges keep the df table
    * current but never re-derive the cap, so a fingerprint can grow past
    * the cap while still being screened (its candidate bucket quietly
    * re-approaches quadratic). Returns the count of such
    * over-cap-but-not-hot fingerprints from the two tiny meta tables —
    * zero means the frozen list still matches the data; a growing count
    * is the cue to rebuild. Never touches postings.
    *
    * The cap comes from the index's own stored `meta` (the value the
    * hot list was actually frozen with) — pass `maxDf` only to probe a
    * hypothetical cap. Guessing a default here would mis-measure any
    * adaptively-built index: every fingerprint between the guess and
    * the true build cap would read as drift on a fresh index. */
  def hotListDrift(spark: org.apache.spark.sql.SparkSession, path: String,
                   maxDf: Option[Int] = None): Long = {
    val cap = maxDf.getOrElse(
      // indexes persisted before the meta table existed fall back to
      // the old build default rather than failing the health check
      try spark.read.parquet(s"$path/meta").head().getAs[Int]("max_df")
      catch {
        case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" => 10
      })
    spark.read.parquet(Compaction.resolve(s"$path/dfs")).filter(col("df") > cap)
      .join(spark.read.parquet(s"$path/hot"), Seq("fp"), "left_anti")
      .count()
  }

  /** Screen an incoming batch against the stored index: the batch's
    * kept fingerprints (frozen-hot-list filtered, same rule the index
    * applies) probe the postings via a broadcast hash join — the index
    * is scanned columnar but NEVER shuffled, and only the (tiny)
    * candidate aggregate moves afterwards. Broadcasts are size-guarded
    * ([[graft.engine.Skew.maybeBroadcast]]): a steady-state change
    * batch rides the no-index-shuffle fast path, while a backfill-sized
    * batch falls back to planner strategy instead of a forced
    * driver-side broadcast OOM. Emits the audit table a curation
    * pipeline acts on: (doc_new, doc_old, n_shared,
    * containment ≥ `minContainment`), containment = shared / smaller
    * kept-set — the same MOSS ratio as [[TextOps.containmentPairs]]. */
  def queryFingerprintIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, newDocs: DataFrame, k: Int = 8,
                            w: Int = 4,
                            minContainment: Double = 0.5): DataFrame = {
    import graft.engine.Skew.maybeBroadcast
    val feed = Caches.ensureCached(
      winnowExploded(newDocs, k, w)
        .join(spark.read.parquet(s"$path/hot"), Seq("fp"), "left_anti"))
    val feedSizes = feed.groupBy("doc_id").agg(count(lit(1)).as("nn"))
    // tombstone screen (scan-time size-guarded broadcast anti-join, the
    // index never shuffles): deleted docs stop matching before the
    // physical rewrite
    val postings = liveFingerprintPostings(spark, path)
    val cand = postings.as("i")
      .join(maybeBroadcast(feed.as("f")), col("i.fp") === col("f.fp"))
      // candidate-level dedup: (doc, fp) is unique per doc by
      // construction (winnowFps emits a distinct set), so this is a
      // no-op on a healthy index — but a crash mid-merge replayed by
      // the ledger protocol can leave the same posting twice
      // (mergeFingerprintIndex is multi-write, see its doc), and
      // without this the duplicate would inflate n_shared/containment
      // for those docs forever. Runs on the batch-sized join output,
      // never on the index.
      .select(col("f.doc_id").as("doc_new"), col("i.doc_id").as("doc_old"),
        col("i.fp").as("fp"))
      .dropDuplicates("doc_new", "doc_old", "fp")
      .groupBy(col("doc_new"), col("doc_old"))
      .agg(count(lit(1)).as("n_shared"))
      .join(maybeBroadcast(feedSizes.withColumnRenamed("doc_id", "doc_new")),
        "doc_new")
    // candidates are batch-sized: broadcast them against the stored
    // sizes table so the index side never shuffles here either
    spark.read.parquet(Compaction.resolve(s"$path/sizes"))
      .withColumnRenamed("doc_id", "doc_old")
      .join(maybeBroadcast(cand), "doc_old")
      .withColumn("containment",
        col("n_shared").cast("double") / least(col("nn"), col("n")))
      .filter(col("containment") >= minContainment)
      .select("doc_new", "doc_old", "n_shared", "containment")
      // same replay tolerance for the sizes side: a replayed merge
      // appends a doc's (identical) size row twice, which would emit
      // each of its audit rows twice; candidates are batch-sized, so
      // the dedup is cheap and a no-op on a healthy index
      .dropDuplicates("doc_new", "doc_old")
  }
}
