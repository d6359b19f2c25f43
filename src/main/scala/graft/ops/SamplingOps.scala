package graft.ops

import graft.engine.Caches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling, splitting, bucketing, and mixing operators for
  * training-data pipelines. Every operator here must give the SAME answer
  * on every run, on every engine, at any parallelism — so randomness is
  * replaced by key hashing (md5-derived integers, the construction the
  * dedup family already proves engine-portable) and every windowed
  * assignment rides a total order with a unique tie-break.
  *
  * Scale notes: hash splits are narrow per-row projections (no shuffle);
  * stratified sampling shuffles once on the stratum key; packing and
  * bucketing use a single global-order window — at 100 TB those would be
  * range-partitioned by the same order (Spark's window already sorts
  * within partitions after a range exchange), which is the standard
  * sort-based packing shape.
  */
object SamplingOps {

  /** Portable 40-bit integer hash of a key column: the first 10 hex chars
    * of md5(key as string) — deterministic, uniform, and reproduced
    * bit-for-bit by DuckDB's `('0x' || substr(md5(k), 1, 10))::BIGINT`. */
  def keyHash(key: String): Column =
    expr(s"cast(conv(substr(md5(cast($key as string)), 1, 10), 16, 10) as bigint)")

  /** Reproducible train/valid/test split by key hash percentile:
    * hash(key) mod 100 < trainPct → train, < trainPct+validPct → valid,
    * else test. Membership is a pure function of the key — stable under
    * reshuffling, appends, and re-runs (the property row_number-based
    * splits lose the moment the input order changes). */
  def hashSplit(df: DataFrame, key: String,
                trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"hashSplit: train/valid percentages must be non-negative and sum " +
        s"to at most 100, got train=$trainPct valid=$validPct — an " +
        "over-allocated split silently empties the test arm")
    val h = pmod(keyHash(key), lit(100))
    df.withColumn("split",
      when(h < trainPct, "train")
        .when(h < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Deterministic stratified sample: the `perStratum` docs of each
    * stratum with the lowest (hash, key) — every stratum contributes the
    * same pseudo-random subset on every run. One shuffle on the stratum
    * key; the window never sees more than a stratum per task. */
  def stratifiedSample(df: DataFrame, stratum: String, key: String,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(keyHash(key), col(key))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= perStratum)
      .drop("_rn")
  }

  /** Temperature-flattened corpus mixing — the multilingual-LLM sampling
    * rule (weight ∝ share^α, α = ½): big strata are downsampled toward
    * the small ones so low-resource strata aren't drowned. The keep rate
    * works out to `rate_s = sqrt(min_tokens / tokens_s)` — the α = ½
    * flattening normalized so the smallest stratum keeps everything,
    * with the normalizing Σ share^α CANCELLED algebraically. That makes
    * every operand a single correctly-rounded IEEE op (one long→double
    * division, one sqrt — no pow, no order-dependent float summation),
    * so the rate — and therefore every membership decision — is
    * bit-identical across engines and runs. Membership itself is the
    * usual hash threshold: keyHash mod 10⁶ < floor(rate·10⁶) — a pure
    * function of the key, stable under reshuffling and appends.
    * One tiny per-stratum aggregate broadcast back over the corpus; the
    * sampling pass is a narrow per-row projection — no corpus shuffle. */
  def temperatureSample(docs: DataFrame, stratum: String,
                        key: String): DataFrame =
    docs.join(broadcast(temperatureRates(docs, stratum)), stratum)
      .filter(temperatureKeep(key))
      .drop("_rate")

  /** The per-stratum keep-rate table behind [[temperatureSample]] —
    * exposed so report operators ([[Curation]]) can attach the
    * membership BOOLEAN instead of filtering. */
  def temperatureRates(docs: DataFrame, stratum: String): DataFrame = {
    val per = docs
      .groupBy(col(stratum))
      .agg(sum(size(TextOps.normWords(col("text"))).cast("long")).as("_nt"))
    per.crossJoin(broadcast(per.agg(min(col("_nt")).as("_mn"))))
      .select(col(stratum),
        sqrt(col("_mn").cast("double") / col("_nt").cast("double")).as("_rate"))
  }

  /** Membership predicate over a joined `_rate` column. */
  def temperatureKeep(key: String): Column =
    pmod(keyHash(key), lit(1000000L)) <
      floor(col("_rate") * lit(1000000.0)).cast("long")

  /** Fail-loud fallback arm for stratum→weight CASE chains: a stratum
    * absent from the caller's map raises at execution time instead of
    * folding to NaN/null. Cast (`tpe`) so when/otherwise coercion
    * types the chain correctly (raise_error itself is NullType). */
  private def unmappedStratum(op: String, stratum: String,
                              tpe: String = "double"): Column =
    raise_error(concat(
      lit(s"$op: stratum '"), col(stratum).cast("string"),
      lit(s"' has no configured weight"))).cast(tpe)

  /** Range-partitioned global-order scaffold — see
    * [[graft.engine.GlobalOrder.attach]] (factored to the engine so the
    * SCD2 surrogate-key path shares the identical two-pass prefix sum). */
  private def globalOrder(df: DataFrame, order: Seq[Column], sumCol: Column,
                          needCum: Boolean = true): (DataFrame, Long, Long) =
    graft.engine.GlobalOrder.attach(df, order, sumCol, needCum)

  private def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(TextOps.normWords(col("text"))).cast("long").as("n_tokens"))

  /** Deterministic weighted interleave for epoch construction: each
    * row's position key is its uniform key-hash value scaled DOWN by its
    * stratum's mixing weight (`u / w`), so a stratum with twice the
    * weight surfaces twice as densely early in the order — the
    * deterministic, engine-portable cousin of weighted
    * without-replacement orderings (whose `u^(1/w)` keys need `pow`,
    * which is not bit-stable across engines; `u / w` is two
    * single-rounded IEEE divisions the oracle replays exactly). The
    * contiguous epoch position rides the range-partitioned
    * [[globalOrder]] numbering. */
  def weightedInterleave(df: DataFrame, stratum: String, key: String,
                         weights: Map[String, Double]): DataFrame = {
    // unmapped stratum → raise_error, NOT a NaN weight: NaN position
    // keys would silently sort the stratum to the end of the epoch, so
    // a config typo re-orders training data with no signal (the same
    // fail-loud posture as the events timestamp-unit guard)
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      s"weightedInterleave: every stratum weight must be strictly " +
        s"positive, got $weights — a zero weight yields Infinity/NaN " +
        "position keys with engine-dependent ordering, and a negative " +
        "one silently sorts its whole stratum to the FRONT")
    val w = weights.toSeq.sortBy(_._1)
      .foldLeft(unmappedStratum("weightedInterleave", stratum)) {
        case (acc, (k, v)) =>
          when(col(stratum) === lit(k), lit(v)).otherwise(acc)
      }
    val pos = (pmod(keyHash(key), lit(1000000L)).cast("double") /
      lit(1000000.0)) / w
    val keyed = df.select(col(key), col(stratum)).withColumn("pos", pos)
    val (out, _, _) =
      globalOrder(keyed, Seq(col("pos"), col(key)), lit(0L), needCum = false)
    out.withColumn("train_order", col("_rn")).drop("_pid", "_rn", "pos")
  }

  /** Greedy token-budget selection — the curation step that turns "rank
    * by quality" into an actual training corpus of bounded size: keep
    * the highest-quality documents, whole docs only, while the running
    * token total stays within `budget` (ties break by doc_id so the cut
    * is deterministic). The running sum over the global quality order is
    * the range-partitioned [[globalOrder]] prefix sum — never a
    * single-partition window — so the selection scales with executors. */
  def selectTokenBudget(docs: DataFrame, budget: Long): DataFrame = {
    val scored = TextOps.qualityScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val (out, _, _) = globalOrder(scored,
      Seq(col("quality_score").desc, col("doc_id")), col("n_tokens"))
    out.filter(col("_cum") + col("n_tokens") <= budget)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"),
        (col("_cum") + col("n_tokens")).as("cum_tokens"))
  }

  /** PER-GROUP greedy token-budget selection — [[selectTokenBudget]]
    * with a budget per stratum: within each stratum, keep the highest-
    * quality whole documents while the stratum's running token total
    * stays within its budget. The grouped running sum rides ONE
    * [[globalOrder]] pass over (stratum, quality desc, key) — a
    * dominant stratum spreads across range partitions instead of one
    * window task — with per-stratum base offsets from a bounded
    * one-row-per-stratum aggregate (the groupedWeightedCuts shape).
    * Strata missing from `budgets` raise (fail-loud, as everywhere). */
  def selectTokenBudgetByGroup(docs: DataFrame, stratum: String,
                               budgets: Map[String, Long]): DataFrame = {
    val scored = TextOps.qualityScore(docs)
      .join(docs.select("doc_id", stratum), "doc_id")
      .select(col(stratum), col("doc_id"), col("n_tokens"),
        col("quality_score"))
    val (ranked, _, _) = globalOrder(scored,
      Seq(col(stratum), col("quality_score").desc, col("doc_id")),
      col("n_tokens"))
    val base = ranked.groupBy(stratum).agg(min(col("_cum")).as("_base"))
    val bCol = budgets.toSeq.sortBy(_._1).foldLeft(
      unmappedStratum("selectTokenBudgetByGroup", stratum, "bigint")) {
      case (acc, (k, v)) => when(col(stratum) === lit(k), lit(v)).otherwise(acc)
    }
    ranked.join(broadcast(base), stratum)
      .withColumn("_b", bCol)
      .filter(col("_cum") - col("_base") + col("n_tokens") <= col("_b"))
      .select(col(stratum), col("doc_id"), col("n_tokens"),
        col("quality_score"),
        (col("_cum") - col("_base") + col("n_tokens")).as("cum_tokens"))
  }

  /** Largest-remainder split of an integer budget across the keys of a
    * weight map (quotas sum to `budget` exactly; ties by key) — the
    * [[proportionalSample]] arithmetic over WEIGHTS instead of counts,
    * exposed for budget-per-stratum callers. Double products replay
    * bit-for-bit in SQL (single IEEE multiply + floor). */
  def largestRemainderBudgets(budget: Long,
                              weights: Map[String, Double]): Map[String, Long] = {
    val floors = weights.toSeq.sortBy(_._1).map { case (k, w) =>
      val x = budget * w
      (k, math.floor(x).toLong, x - math.floor(x))
    }
    val bonus = (budget - floors.map(_._2).sum).toInt
    // "quotas sum to budget exactly" only holds when the weights are a
    // distribution: Σw < 1 leaves bonus > |strata| (silent under-fill),
    // Σw > 1 drives it negative (take(-n) silently empty) — both are
    // caller bugs this raises on instead of mis-allocating
    require(bonus >= 0 && bonus <= floors.size,
      s"largestRemainderBudgets: weights sum to ${weights.values.sum} " +
        "(must be ~1.0 for quotas to sum to the budget exactly)")
    val bonusSet = floors.sortBy { case (k, _, r) => (-r, k) }
      .take(bonus).map(_._1).toSet
    floors.map { case (k, f, _) =>
      k -> (f + (if (bonusSet(k)) 1L else 0L)) }.toMap
  }

  /** Deterministic global shuffle for training order: a seed-keyed md5
    * over the row key gives a reproducible pseudo-random permutation,
    * and the contiguous 1-based position (`train_order`) comes from the
    * range-partitioned [[globalOrder]] numbering — no single-partition
    * window, so assigning the permutation scales with executors. Same
    * seed → bit-identical epoch order across runs and restarts; a new
    * seed reshuffles without touching the data. */
  def shuffleOrder(df: DataFrame, key: String, seed: String): DataFrame = {
    require(!df.columns.contains("skey"),
      "shuffleOrder: input already has a 'skey' column — the name is " +
        "reserved for the seed-derived shuffle key this operator emits " +
        "(part of its declared output), and would be silently clobbered")
    val keyed = df.withColumn("skey",
      md5(concat_ws(":", lit(seed), col(key).cast("string"))))
    val (out, _, _) =
      globalOrder(keyed, Seq(col("skey"), col(key)), lit(0L), needCum = false)
    out.withColumn("train_order", col("_rn")).drop("_pid", "_rn")
  }

  /** Length-bucketed batching prep: docs ntiled into `n` buckets by token
    * count (total order with key tie-break), reported as per-bucket doc /
    * token ranges. Equal-population buckets are what sequence-length
    * batching wants (minimal padding within a bucket). The bucket id is
    * computed from the [[globalOrder]] row number with SQL ntile's exact
    * assignment rule (first N mod n buckets get the extra row), so
    * results match the oracle's `ntile(n)` while the plan stays
    * range-partitioned. */
  def tokenBuckets(docs: DataFrame, n: Int): DataFrame = {
    val (ordered, total, _) =
      globalOrder(docTokens(docs), Seq(col("n_tokens"), col("doc_id")),
        col("n_tokens"), needCum = false)
    val base = total / n; val rem = total % n; val cut = (base + 1) * rem
    ordered
      .withColumn("bucket",
        when(lit(rem) > 0 && col("_rn") <= cut,
          expr(s"(_rn - 1) div ${base + 1} + 1"))
          .otherwise(expr(s"$rem + (_rn - 1 - $cut) div ${math.max(base, 1L)} + 1"))
          .cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
  }

  /** Concat-and-chunk sequence packing (the GPT-style pretraining
    * construction): documents are laid out in key order as one token
    * stream and cut into fixed `budget`-token windows; a doc's pack is
    * the window its first token lands in. Reports per-pack doc/token
    * counts and how many docs straddle a window boundary (get split
    * across packs). Exact integer arithmetic over the [[globalOrder]]
    * prefix sum — range-partitioned, the same shape the tokenizer
    * sharder runs. */
  def packSequences(docs: DataFrame, budget: Int): DataFrame =
    packSequencesBy(docTokens(docs), Seq(col("doc_id")), budget)

  /** Sequence packing in a CALLER-PROVIDED total order — the composition
    * the curation chain closes with: pack the epoch in TRAIN order
    * ([[weightedInterleave]]'s `train_order`), not doc_id order, so the
    * fixed-budget windows cut the stream the trainer will actually read.
    * `df` must carry `n_tokens`; `order` must be a total order. Same
    * exact integer prefix-sum math as [[packSequences]], same
    * range-partitioned [[globalOrder]] scaffold. */
  def packSequencesBy(df: DataFrame, order: Seq[Column],
                      budget: Int): DataFrame = {
    val (ordered, _, _) = globalOrder(df, order, col("n_tokens"))
    ordered
      // integer division: exact on both engines (budget need not be 2^k)
      .withColumn("pack_id", expr(s"_cum div $budget"))
      .withColumn("_straddle",
        (pmod(col("_cum"), lit(budget.toLong)) + col("n_tokens") > budget)
          .cast("long"))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("_straddle")).as("n_straddlers"))
  }

  /** Epoch materialization — [[corpusMix]]'s dup_factor made executable:
    * each document enters the epoch ⌊f⌋ times, plus one more when its
    * key hash falls under f's fractional part
    * (hash mod 10⁶ < ⌊frac·10⁶⌋) — so a stratum's achieved token mass
    * converges on target·total with NO randomness: the same documents
    * get the extra copy on every run and engine, and the report below
    * shows how close the integerized epoch lands to the target mix.
    * All arithmetic is the single-rounded IEEE chain [[corpusMix]]
    * already oracles (f = target/share) plus exact floor/compare steps.
    * One broadcast factor join over the corpus, one per-stratum
    * aggregate, one broadcast epoch total — no corpus-sized shuffle
    * beyond the stratum aggregate. */
  def epochMaterialize(docs: DataFrame, stratum: String, key: String,
                       targetWeights: Map[String, Double]): DataFrame = {
    val factors = corpusMix(docs, stratum, targetWeights)
      .select(col(stratum), col("dup_factor"))
    val toks = docs.select(col(stratum), col(key),
      size(TextOps.normWords(col("text"))).cast("long").as("n_tokens"))
    val frac = col("dup_factor") - floor(col("dup_factor"))
    val copies = toks.join(broadcast(factors), stratum)
      .withColumn("_copies",
        floor(col("dup_factor")).cast("long") +
          (pmod(keyHash(key), lit(1000000L)) <
            floor(frac * lit(1000000.0)).cast("long")).cast("long"))
    val per = copies.groupBy(stratum)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_copies")).as("n_epoch_docs"),
        sum(col("_copies") * col("n_tokens")).as("n_epoch_tokens"))
    val tot = per.agg(sum(col("n_epoch_tokens")).as("_te"))
    per.crossJoin(broadcast(tot))
      .withColumn("achieved_weight",
        col("n_epoch_tokens").cast("double") / col("_te"))
      .drop("_te")
  }

  /** Shard-export manifest — the handoff artifact between curation and
    * training: documents are laid out in key order and cut into shards
    * of ≈`tokensPerShard` (a doc belongs to the shard its running-total
    * prefix lands in — whole docs only, the [[packSequencesBy]] math on
    * a coarser budget), and each shard row carries exact doc/token
    * counts, its doc-id range, and an md5 CONTENT HASH over the ordered
    * doc-id list — the checksum a trainer (or a re-run) verifies before
    * touching the data, and the diff key between two corpus versions.
    * Everything is exact integer math + one canonical string hash, so
    * two runs over the same corpus produce byte-identical manifests.
    * Scale: the running sum is the range-partitioned [[globalOrder]]
    * prefix — never a one-task window; the per-shard hash aggregates
    * ≈(tokensPerShard / avg-doc-tokens) ids per shard row. */
  def shardManifest(docs: DataFrame, tokensPerShard: Long): DataFrame =
    manifestOf(shardAssignments(docs, tokensPerShard))

  /** The per-document shard assignment behind [[shardManifest]] —
    * (doc_id, n_tokens, shard_id), exposed so the export path and the
    * manifest derive from the SAME layout computation. */
  def shardAssignments(docs: DataFrame, tokensPerShard: Long): DataFrame = {
    val (ordered, _, _) = globalOrder(docTokens(docs),
      Seq(col("doc_id")), col("n_tokens"))
    ordered.withColumn("shard_id", expr(s"_cum div $tokensPerShard"))
      .select("doc_id", "n_tokens", "shard_id")
  }

  /** Manifest aggregate over an assignment table (also applied to
    * RE-READ exported data — the publish-time verification). */
  def manifestOf(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("content_hash"))

  /** Materialize the layout [[shardManifest]] describes: the full
    * documents written as parquet PARTITIONED BY shard_id, so a trainer
    * (or any reader) fetching a shard subset gets partition-pruned
    * scans — the filter lands in PartitionFilters, untouched shard
    * directories are never opened. The production export protocol is
    * write → re-read → [[manifestOf]] → compare against the planning
    * manifest → publish; ExportSpec runs exactly that loop. */
  def writeShards(docs: DataFrame, tokensPerShard: Long,
                  path: String): Unit =
    docs.join(shardAssignments(docs, tokensPerShard)
        .select("doc_id", "n_tokens", "shard_id"), "doc_id")
      .write.partitionBy("shard_id").mode("overwrite").parquet(path)

  /** Per-group quota cap — the "at most N documents per domain" curation
    * rule (web corpora are dominated by a few giant hosts; capping
    * per-source is the standard counter). Keeps each group's top `n`
    * rows under `order` (which must be a total order for determinism),
    * labeled with their 1-based rank.
    *
    * Scale shape: the textbook single `row_number` window partitioned by
    * the group serializes EACH GROUP into one task — at 100 TB a domain
    * with billions of pages hot-spots that task, and AQE's skew
    * splitting does not apply to window exchanges. Two phases instead:
    * phase 1 ranks within (group, salt) — a key-hash salt spreads a huge
    * group across `salts` tasks, and a row ranked > n within its own
    * salt cannot be in the group's true top n, so the per-salt survivors
    * (≤ salts·n rows per group) are a provably safe superset; phase 2
    * re-ranks only the survivors per group, a window whose input is
    * BOUNDED by construction. The same construction the per-group exact
    * percentiles use for skew (ExactPercentile.groupedCuts). */
  def capPerGroup(df: DataFrame, group: String, key: String,
                  order: Seq[Column], n: Int, salts: Int = 16): DataFrame = {
    val w1 = Window.partitionBy(col(group), pmod(keyHash(key), lit(salts)))
      .orderBy(order: _*)
    val survivors = df.withColumn("_lr", row_number().over(w1))
      .filter(col("_lr") <= n).drop("_lr")
    val w2 = Window.partitionBy(col(group)).orderBy(order: _*)
    survivors.withColumn("grp_rank", row_number().over(w2).cast("long"))
      .filter(col("grp_rank") <= n)
  }

  /** Fixed-budget proportional allocation — "give me exactly `budget`
    * documents, split across sources in proportion to their size", the
    * integer-exact companion to the rate-based samplers ([[hashSplit]],
    * [[temperatureSample]] keep a PERCENTAGE; a training-set builder is
    * usually handed a COUNT). Per-stratum quotas use the largest-
    * remainder method: every stratum gets ⌊budget·nₛ/N⌋ and the
    * `budget − Σ⌊·⌋` strata with the largest remainders (ties by stratum
    * name) get one extra — quotas sum to `budget` exactly, all integer
    * arithmetic, so the allocation is bit-reproducible on any engine.
    * Within a stratum the quota is filled by the lowest (key-hash, key)
    * rows — the same pseudo-random-but-deterministic subset rule as
    * [[stratifiedSample]].
    *
    * Scale shape: the per-stratum count table is bounded control-plane
    * data (one row per source/language), so the quota math is a driver-
    * side exact BigInt computation steering the distributed selection —
    * the kmeansCentroids control-flow shape. Selection reuses the
    * [[capPerGroup]] two-phase salted window, so one giant stratum
    * spreads across `salts` tasks instead of serializing into one.
    * `budget` must not exceed the row count (quotas beyond a stratum's
    * population would silently under-fill; we raise instead). */
  def proportionalSample(df: DataFrame, stratum: String, key: String,
                         budget: Long, salts: Int = 16): DataFrame = {
    // bounded-cardinality guard: the quota table is driver-side, so a
    // caller passing a row-key as `stratum` must fail loudly, not OOM
    // the driver — limit(cap+1) bounds the collect itself
    // stratum values travel as STRINGS driver-side (any column type
    // works — an int stratum would otherwise ClassCastException in the
    // collect and a null would NPE the sort); the selection pass
    // compares against the same cast
    val counts = df.groupBy(col(stratum).cast("string").as("_sv"))
      .agg(count(lit(1)).as("_n"))
      .limit(Caches.MaxDriverGroups + 1)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
      .sortBy(_._1)
    require(counts.length <= Caches.MaxDriverGroups,
      s"proportionalSample: over ${Caches.MaxDriverGroups} distinct " +
        s"'$stratum' values — not a stratum column (driver-side quota " +
        "table would not be bounded control-plane data)")
    require(counts.nonEmpty, "proportionalSample: empty input")
    val total = counts.map(_._2).sum
    require(budget <= total,
      s"proportionalSample: budget $budget exceeds corpus size $total")
    // exact integer allocation: BigInt keeps budget·nₛ exact at any scale
    // (long·long overflows past ~3·10⁹ docs × 3·10⁹ budget)
    val floors = counts.map { case (s, n) =>
      val prod = BigInt(budget) * n
      (s, (prod / total).toLong, (prod % total).toLong)
    }
    val bonus = (budget - floors.map(_._2).sum).toInt
    val bonusSet = floors.sortBy { case (s, _, r) => (-r, s) }
      .take(bonus).map(_._1).toSet
    val quota = floors.map { case (s, f, _) =>
      (s, f + (if (bonusSet(s)) 1L else 0L)) }
    // every stratum is mapped by construction (quotas derive from the
    // same input); the raise_error arm guards a concurrent append
    // between the count pass and the selection pass
    val qCol = quota.foldLeft(
      unmappedStratum("proportionalSample", stratum, "bigint")) {
      case (acc, (k, v)) =>
        when(col(stratum).cast("string") <=> k.orNull, lit(v)).otherwise(acc)
    }
    val keyed = df.withColumn("_q", qCol)
    val w1 = Window.partitionBy(col(stratum), pmod(keyHash(key), lit(salts)))
      .orderBy(keyHash(key), col(key))
    val survivors = keyed.withColumn("_lr", row_number().over(w1))
      .filter(col("_lr") <= col("_q")).drop("_lr")
    val w2 = Window.partitionBy(col(stratum)).orderBy(keyHash(key), col(key))
    survivors.withColumn("samp_rank", row_number().over(w2).cast("long"))
      .filter(col("samp_rank") <= col("_q"))
      .drop("_q")
  }

  /** Corpus-mixing report: per-stratum token mass, its share of the
    * corpus, and the duplication (epoch) factor needed to hit a target
    * weight — the bookkeeping behind weighted data mixes. All shares and
    * factors are single IEEE divisions of exact integer counts, so the
    * doubles are bit-identical across engines. */
  def corpusMix(docs: DataFrame, stratum: String,
                targetWeights: Map[String, Double]): DataFrame = {
    val toks = docs.select(col(stratum),
      size(TextOps.normWords(col("text"))).cast("long").as("n_tokens"))
    val per = toks.groupBy(stratum)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val total = per.agg(sum(col("n_tokens")).as("_total"))
    // unmapped stratum → raise_error, NOT a null target: a silent null
    // dup_factor drops the stratum from the mix plan unnoticed
    val target = targetWeights.foldLeft(unmappedStratum("corpusMix", stratum)) {
      case (acc, (k, v)) => when(col(stratum) === k, lit(v)).otherwise(acc)
    }
    per.crossJoin(broadcast(total))
      .withColumn("share", col("n_tokens").cast("double") / col("_total"))
      .withColumn("target_weight", target)
      .withColumn("dup_factor", col("target_weight") / col("share"))
      .drop("_total")
  }
}
