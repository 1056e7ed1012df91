package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs — exact-dedup to one representative per
  * content group, then language and quality gates — emitting the kept
  * document set with its scores. One query proves the operators
  * compose (shared doc_id join keys, no operator-private shuffles
  * fighting each other), not just work in isolation.
  *
  * Scale shape: every join is an equi-join on doc_id; the dedup
  * representative set is a single md5 groupBy (partial-aggregating);
  * language ID's stopword table is a genuine broadcast. Nothing here
  * is O(corpus) on the driver or in a broadcast.
  */
object Curation {

  /** Documents that survive curation: the content-group representative
    * (min doc_id per md5(text)), predicted language in `langs`, and
    * quality >= `minQuality`. Output: (doc_id, pred_lang, quality). */
  def trainingSet(docs: DataFrame, langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5): DataFrame = {
    // keep-one exact dedup: the representative is the smallest doc_id
    // of each content group (same convention as Dedup.exactGroups)
    val reps = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality"))
      .join(reps, Seq("doc_id"), "left_semi")
      .join(TextAnalysis.langId(docs).select(col("doc_id"), col("pred_lang")), Seq("doc_id"))
      .filter(col("pred_lang").isin(langs: _*) && col("quality") >= minQuality)
      .select(col("doc_id"), col("pred_lang"), col("quality"))
  }

  /** Weighted PRIORITY SAMPLE (Duffield, Lund & Thorup, JACM 2007):
    * doc i gets priority q_i = w_i / u_i for weight w_i = n_chars and
    * uniform u_i; the sample is the k highest priorities and the
    * subset-sum estimator weight is max(w_i, tau) with tau the
    * (k+1)-th priority — unbiased for any subset-sum query over the
    * corpus, the sketch a 100 TB lake answers "how many bytes does
    * source X hold" from without a full scan. All arithmetic exact:
    * u_i = (h32+1)/2^32 for 32 md5 bits, so q_i = w_i * 2^32 div
    * (h32+1) is a pure long for any weight under 2^31 — weights are
    * over 2^31−1 short-circuit to priority = Long.MaxValue (ENFORCED,
    * not just documented: under ANSI mode an overflow would abort the
    * whole job), so a pathological multi-GB doc is force-INCLUDED —
    * its inclusion probability is exactly 1, preserving the DLT
    * estimator's exact unbiasedness (a saturated-weight priority
    * could fall below tau and understate inclusion); est_w still uses
    * the true weight, so subset-sum estimates over sampled items stay
    * exact. 32 hash bits keep u's granularity at
    * 2^-32 — ample for any sample size this serves — and every engine
    * replays the same sample. Top-(k+1) is a distributed TakeOrdered
    * (never a global sort); only the k+1 survivors see the
    * constant-partition rank window; tau rides a 1-row broadcast. */
  def prioritySample(docs: DataFrame, k: Int = 100): DataFrame = {
    val top = docs
      .select(col("doc_id"), col("source"), col("n_chars").as("weight"))
      .withColumn("h32",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"))
      .withColumn("priority",
        expr(s"CASE WHEN weight > ${(1L << 31) - 1} THEN ${Long.MaxValue}L " +
          s"ELSE weight * ${1L << 32} div (h32 + 1) END"))
      .orderBy(desc("priority"), asc("doc_id"))
      .limit(k + 1)
    // tau is the (k+1)-th priority; when the sample IS the population
    // (fewer than k+1 rows) DLT defines tau = 0, so est_w = w exactly
    val tau = top.agg(min("priority").as("mn"), count(lit(1)).as("c"))
      .select(when(col("c") < k + 1, lit(0L)).otherwise(col("mn")).as("tau"))
    val wR = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(desc("priority"), asc("doc_id"))
    top
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("est_w", greatest(col("weight"), col("tau")))
      .select(col("doc_id"), col("source"), col("weight"),
        col("priority"), col("rank"), col("est_w"))
  }

  /** Deterministic stratified sampling for training-mix construction:
    * each doc lands in one of 64 hash buckets (first byte of
    * md5(doc_id), mod a power of two — unbiased over the 256 byte
    * values and identical in any engine), and a per-language rate in
    * 64ths keeps bucket < rate. Sampling is a pure function of doc_id:
    * re-runs, retries and engines all pick the same docs — the
    * property a reproducible data mix needs (rand() has none of it).
    * Map-only; the rate table is a handful of literals. */
  def stratifiedSample(docs: DataFrame, rates64: Map[String, Int]): DataFrame = {
    require(rates64.values.forall(r => r >= 0 && r <= 64), "rates are in 64ths")
    val bucket = (
      conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int") % 64
    ).as("bucket")
    val rate = rates64.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs
      .withColumn("bucket", bucket)
      .withColumn("rate", rate)
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"), col("bucket").cast("long").as("bucket"))
  }

  /** Keep-BEST-of-cluster near-dup curation: [[Dedup.components]]
    * clusters the minhash candidate pairs, and each cluster keeps its
    * highest-QUALITY member (ties -> smallest doc_id) instead of the
    * smallest-id representative — the rule a production pipeline
    * actually wants (near-dup groups usually contain one clean copy
    * and several mangled ones; min-id keeps a random one). Docs in no
    * cluster keep themselves. Output: one row per doc —
    * (doc_id, keep_doc, kept).
    *
    * Scale shape: the cluster table is O(docs-in-pairs), the argmax is
    * a max_by hash aggregate on rep_doc (partial-aggregating, no
    * window), and the corpus-wide assembly is two equi-joins on
    * doc_id/rep_doc. */
  def keepBest(docs: DataFrame, k: Int = 3): DataFrame =
    keepBestFromIndex(docs, Dedup.components(Dedup.minhashCandidates(docs, k)))

  /** [[keepBest]] served from a prebuilt cluster map
    * ([[Dedup.nearDupIndex]].clusters) — read-path cost only: the
    * argmax and assembly joins, no LSH or fixpoint. */
  def keepBestFromIndex(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val comp = clusters.select(col("doc_id"), col("rep_doc"))
    val q = TextAnalysis.quality(docs).select(col("doc_id"), col("quality"))
    // (quality ASC, -doc_id ASC) max == quality DESC, doc_id ASC argmax
    val best = comp.join(q, Seq("doc_id"))
      .groupBy("rep_doc")
      .agg(max_by(col("doc_id"), struct(col("quality"), -col("doc_id"))).as("keep_doc"))
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .join(best, Seq("rep_doc"), "left")
      .select(col("doc_id"),
        coalesce(col("keep_doc"), col("doc_id")).as("keep_doc"),
        (coalesce(col("keep_doc"), col("doc_id")) === col("doc_id")).as("kept"))
  }

  /** Temperature-weighted training-mixture construction: per-language
    * sampling weights w_l proportional to (token count)^alpha — the
    * standard upweighting of low-resource languages in multilingual
    * pretraining (alpha = 1 reproduces natural frequencies, alpha -> 0
    * approaches uniform). Output per language: corpus counts, the
    * normalized mixture weight, the token target for a total budget,
    * and the sampling rate (capped at 1 — a language smaller than its
    * target cannot be sampled above itself; real mixes then either
    * epoch it or re-normalize, which is a policy choice left to the
    * caller).
    *
    * Scale shape: ONE partial-aggregating corpus scan (groupBy lang
    * with map-side combine), then all arithmetic happens on the
    * languages-sized table — the normalizer join is a broadcast of a
    * single row. alpha = 0.5 computes via sqrt (correctly rounded in
    * IEEE-754, hence engine-exact); other alphas use pow (within
    * 1 ulp, absorbed by the 6-decimal rounding). */
  def temperatureMixture(docs: DataFrame, alpha: Double = 0.5,
      budgetTokens: Long = 100000L): DataFrame = {
    def weigh(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else pow(c, alpha)
    val perLang = docs
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
    val z = perLang.agg(sum(weigh(col("n_tokens"))).as("z"))
    val w = weigh(col("n_tokens")) / col("z")
    perLang.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(w, 6).as("weight"),
        round(lit(budgetTokens.toDouble) * w).cast("long").as("target_tokens"),
        round(least(lit(1.0), lit(budgetTokens.toDouble) * w / col("n_tokens")), 6).as("rate"))
  }

  /** EXECUTE the temperature mixture: deterministic per-language
    * sampling at [[temperatureMixture]]'s computed rate — the step
    * that turns the mixture TABLE into the mixture CORPUS. Each doc
    * keys on 48 md5 bits mod 1e6 (micro-rate resolution, the
    * [[stratifiedSample]] reproducibility contract at finer grain) and
    * survives iff bucket_q < round(rate·1e6); languages at rate 1 keep
    * everything. Pure function of (doc_id, corpus stats): re-runs,
    * retries and engines agree. Shape: the rate table is
    * languages-sized (broadcast); the filter is map-side; the only
    * corpus passes are the mixture's one aggregate and this scan.
    * Output: (doc_id, lang, bucket_q, rate_q). */
  def mixtureSample(docs: DataFrame, alpha: Double = 0.5,
      budgetTokens: Long = 100000L): DataFrame = {
    val rates = temperatureMixture(docs, alpha, budgetTokens)
      .select(col("lang"), round(col("rate") * 1000000).cast("long").as("rate_q"))
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long") % 1000000L).as("bucket_q")
    docs.select(col("doc_id"), col("lang"), bucket)
      .join(broadcast(rates), Seq("lang"))
      .filter(col("bucket_q") < col("rate_q"))
      .select(col("doc_id"), col("lang"), col("bucket_q"), col("rate_q"))
  }

  /** Sequence packing for training-batch construction: documents are
    * concatenated in a deterministic order and chunked into fixed
    * `packLen`-token packs (the GPT-style pack-then-chunk layout); a
    * document whose tokens straddle a chunk boundary spans packs
    * `[first_pack, last_pack]`. Output per doc: (doc_id, bucket,
    * n_tokens, offset_in_bucket, first_pack, last_pack).
    *
    * Scale shape: docs are first routed to one of `nBuckets` md5
    * buckets (pure function of doc_id — reproducible like
    * [[stratifiedSample]]), and each bucket packs independently, so
    * the running-offset window is PARTITIONED — no global sort, no
    * single-task window. By default nBuckets is DERIVED from the
    * corpus (one cheap partial-aggregating token count):
    * max(16, corpusTokens / [[TargetTokensPerBucket]]), so each
    * window partition holds ~4M tokens no matter the corpus — at
    * 100 TB that is millions of buckets, one bucket ~ one output pack
    * file, never 16 giant single-task windows. All arithmetic is
    * integer — exact in any engine. */
  def packSequences(docs: DataFrame, nBuckets: Int = 0, packLen: Long = 256): DataFrame =
    // split(' ') is the exact tokenizer for this corpus — the same
    // count as TextAnalysis.tokenStats' n_tokens
    packSequencesBy(
      docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens")),
      nBuckets, packLen)

  /** [[packSequences]] over an ARBITRARY per-doc token count table
    * (doc_id, n_tokens) — the real pipeline packs by TOKENIZER counts
    * (e.g. [[TextAnalysis.bpeApply]]'s n_bpe_tokens), since the
    * training budget is measured in model tokens, not whitespace
    * words. Same derived bucketing: max(16, totalTokens /
    * [[TargetTokensPerBucket]]) from one cheap count over the
    * (already corpus-collapsed) counts table. */
  def packSequencesBy(counts: DataFrame, nBuckets: Int = 0, packLen: Long = 256): DataFrame = {
    val buckets =
      if (nBuckets > 0) nBuckets
      else {
        val total = counts.agg(coalesce(sum("n_tokens"), lit(0L)))
          .collect()(0).getLong(0)
        math.max(16L, total / TargetTokensPerBucket).toInt
      }
    // 48 hash bits, not one byte: the derived bucket count reaches the
    // millions at corpus scale, and a 1-byte hash would silently cap
    // distinct buckets at 256
    val bucket = (
      conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10).cast("long") % buckets
    ).as("bucket")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    counts
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"), bucket)
      .withColumn("offset_in_bucket", coalesce(sum("n_tokens").over(w), lit(0L)))
      // integer division on exact longs — floor in both engines
      .withColumn("first_pack", expr(s"offset_in_bucket DIV $packLen"))
      .withColumn("last_pack", expr(s"(offset_in_bucket + n_tokens - 1) DIV $packLen"))
  }

  /** Packing-efficiency audit — "measure, don't guess" applied to the
    * [[packSequences]] layout: one row with total tokens, pack count
    * and capacity, fill rate in basis points, and how many docs a
    * pack boundary CUTS (the pack-then-chunk layout trades zero
    * padding for cut documents; this is the number that trade is
    * judged by before a 100 TB tokenization run commits to it).
    * Per-bucket partial aggregate then a one-row fold. */
  def packEfficiency(docs: DataFrame, packLen: Long = 256): DataFrame =
    packSequences(docs, 0, packLen)
      .groupBy("bucket")
      .agg(
        sum("n_tokens").as("used"),
        (max("last_pack") + 1).as("n_packs"),
        sum(when(col("first_pack") =!= col("last_pack"), 1L).otherwise(0L)).as("n_cut"))
      .agg(
        sum("used").as("total_tokens"),
        sum("n_packs").as("n_packs"),
        sum("n_cut").as("n_cut_docs"))
      .withColumn("capacity", col("n_packs") * packLen)
      .withColumn("fill_bp", expr("total_tokens * 10000 div capacity"))
      .select("total_tokens", "n_packs", "capacity", "n_cut_docs", "fill_bp")

  /** Sliding-window context chunking — the OTHER standard
    * training-batch layout besides [[packSequences]]: each document is
    * cut into windows of `maxLen` tokens starting every `stride`
    * tokens (stride < maxLen ⇒ overlapping windows, the BERT/RAG
    * convention that avoids splitting salient spans at hard
    * boundaries; stride == maxLen ⇒ disjoint chunks). The final
    * window of a doc is shorter when the length is not aligned; every
    * token of every doc lands in at least one chunk.
    *
    * Shape: ROW-LOCAL — window starts are a sequence(1, n, stride)
    * exploded per doc, the chunk text is a slice of the doc's own
    * token array; no shuffle at all (map-only), so it composes with
    * any downstream partitioning at any corpus size. All arithmetic
    * is integer. Output: (doc_id, chunk_id 0-based, start 1-based
    * token offset, chunk_len, text). */
  def contextChunks(docs: DataFrame, maxLen: Int = 64, stride: Int = 48): DataFrame = {
    require(stride >= 1 && maxLen >= stride,
      s"need 1 <= stride <= maxLen, got stride=$stride maxLen=$maxLen")
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"), toks.as("toks"), size(toks).cast("long").as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(1L), col("n"), lit(stride.toLong))).as(Seq("chunk_id", "start")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        col("start"),
        least(lit(maxLen.toLong), col("n") - col("start") + 1).as("chunk_len"),
        array_join(slice(col("toks"), col("start"), lit(maxLen)), " ").as("text"))
  }

  /** Deterministic train/validation/test assignment — the split every
    * training corpus needs, as a pure function of doc_id (the
    * [[stratifiedSample]] reproducibility contract: re-runs, retries
    * and engines all agree; rand() agrees with nothing). The doc's
    * md5 byte (0-255) thresholds into the three fractions; map-only,
    * no shuffle. `trainN`/`valN` are counts of 256ths (defaults
    * 232/12/12 ≈ 90.6/4.7/4.7%). */
  def holdoutSplit(docs: DataFrame, trainN: Int = 232, valN: Int = 12): DataFrame = {
    require(trainN + valN < 256, "train + val fractions must leave room for test")
    val b = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int")
    docs.select(
      col("doc_id"),
      when(b < trainN, "train").when(b < trainN + valN, "val")
        .otherwise("test").as("split"))
  }

  /** Leakage-safe holdout split — [[holdoutSplit]]'s fix for the
    * classic eval-contamination bug: thresholding md5(doc_id) puts
    * near-duplicate docs on BOTH sides of the train/test fence, so
    * the model is scored on paraphrases of its own training data.
    * Here the split keys on the doc's near-dup CLUSTER representative
    * ([[Dedup.components]] over the minhash-LSH candidate graph), so
    * an entire near-dup cluster lands in one split; singletons (docs
    * off the pair graph) fall back to their own doc_id — identical to
    * [[holdoutSplit]] for them.
    *
    * Scale shape: the components fixpoint is the only non-map work
    * (already the dedup plane's scale path: contracted edge list,
    * per-round checkpoints); the cluster table joins back on doc_id
    * (AQE broadcasts iff it fits — near-dup clusters are a small
    * fraction of the corpus) and the threshold stays map-side.
    * Output: (doc_id, group_id, split). */
  def leakFreeSplit(docs: DataFrame, trainN: Int = 232, valN: Int = 12): DataFrame =
    leakFreeSplitFromIndex(docs, Dedup.components(Dedup.minhashCandidates(docs)),
      trainN, valN)

  /** [[leakFreeSplit]] served from a prebuilt cluster map
    * ([[Dedup.nearDupIndex]].clusters) — read-path cost only. */
  def leakFreeSplitFromIndex(docs: DataFrame, clusters: DataFrame,
      trainN: Int = 232, valN: Int = 12): DataFrame = {
    require(trainN + valN < 256, "train + val fractions must leave room for test")
    val comp = clusters.select(col("doc_id"), col("rep_doc"))
    val b = conv(substring(md5(col("group_id").cast("string")), 1, 2), 16, 10).cast("int")
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep_doc"), col("doc_id")).as("group_id"))
      .select(col("doc_id"), col("group_id"),
        when(b < trainN, "train").when(b < trainN + valN, "val")
          .otherwise("test").as("split"))
  }

  /** Deterministic epoch shuffle — the global training-order
    * permutation every epoch needs, WITHOUT `rand()` (which is
    * non-reproducible across runs, retries and engines — the
    * [[holdoutSplit]] contract). Each doc keys on
    * md5(doc_id # epoch): different epochs give independent
    * permutations, the same epoch always gives the same one, and a
    * re-run after an executor loss shuffles identically.
    *
    * Scale shape: the standard "hash-bucket, then sort within bucket"
    * global shuffle — docs route to one of `nShards` shards by 48
    * hash bits (mod a power of two: unbiased), and the position
    * window partitions BY SHARD, so no single task ever sees the
    * whole corpus (a global `orderBy` would). By default the shard
    * count is DERIVED from the corpus ([[autoShards]]: the same one
    * cheap token count [[autoBuckets]] uses, rounded up to a power of
    * two), so each shard's position window stays ~constant-sized as
    * the corpus grows — at 100 TB that is tens of thousands of
    * shards, never 8 giant single-task windows. A training loader
    * reads shards in order, positions within a shard in order — that
    * is a full permutation, with each shard an independently-seekable
    * chunk of it. Output: (doc_id, shard, pos 1-based within shard). */
  def epochShuffle(docs: DataFrame, epoch: Int = 0, nShards: Int = 0): DataFrame = {
    val shards = if (nShards > 0) nShards else autoShards(docs)
    require(shards >= 1 && (shards & (shards - 1)) == 0,
      s"nShards must be a power of two for unbiased hex-hash mod, got $shards")
    val key = md5(concat(col("doc_id").cast("string"), lit("#" + epoch)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(asc("key"), asc("doc_id"))
    docs
      .select(col("doc_id"), key.as("key"))
      .withColumn("shard",
        conv(substring(col("key"), 1, 12), 16, 10).cast("long") % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** The pipeline's END: materialize a curated epoch as
    * shard-partitioned parquet training files. Each doc rides its
    * [[epochShuffle]] (shard, pos) — so readers stream any shard in
    * its deterministic permutation order by a pos sort WITHIN the
    * shard file, never a global sort — and the layout is
    * `dir/shard=N/part-…` via partitionBy: one directory per shard,
    * each a few tens of MB at the derived shard count, the unit a
    * data-loader worker claims. Write is the only action; everything
    * upstream (dedup, gates, shuffle) stays one lazy plan.
    * Returns the shard count. */
  def writeTrainingShards(docs: DataFrame, dir: String,
      epoch: Int = 0, nShards: Int = 0): Int = {
    val shards = if (nShards > 0) nShards else autoShards(docs)
    docs
      .join(epochShuffle(docs, epoch, shards), Seq("doc_id"))
      .select(col("doc_id"), col("shard"), col("pos"), col("text"))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    shards
  }

  /** [[epochShuffle]]'s derived shard count: the smallest power of two
    * >= max(8, corpusTokens / [[TargetTokensPerBucket]]), from the
    * same one partial-aggregating token count as [[autoBuckets]]. The
    * power-of-two rounding keeps the 48-bit-hash mod unbiased; the
    * ratio keeps every shard's position window ~constant-sized at any
    * corpus scale. */
  def autoShards(docs: DataFrame): Int =
    autoShardsFor(docs
      .agg(coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L)))
      .collect()(0).getLong(0))

  /** Pure rounding half of [[autoShards]]: smallest power of two >=
    * max(8, totalTokens / [[TargetTokensPerBucket]]). */
  private[graft] def autoShardsFor(totalTokens: Long): Int = {
    val raw = math.max(8L, totalTokens / TargetTokensPerBucket)
    val h = java.lang.Long.highestOneBit(raw)
    (if (h == raw) raw else h << 1).toInt
  }

  /** CCNet-style language-model bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): per language, docs split into head/middle/tail by exact
    * TERCILES of a language-model score — here
    * [[TextAnalysis.logProb]]'s mean unigram log-prob, 1e4-quantized
    * (higher = more probable = head; CCNet's perplexity ordering,
    * inverted sign). The standard curation move this enables: keep
    * head+middle, drop or down-sample tail.
    *
    * Scale shape: the cutoffs are nearest-rank picks over a per-(lang,
    * score) HISTOGRAM ([[TextAnalysis.lengthQuantiles]]' pattern — one
    * partial-aggregating shuffle, window over the bounded histogram,
    * never a corpus sort); the cutoff table is 2 longs per language,
    * broadcast back. Ties at a cutoff land in the LOWER bucket
    * (nearest-rank convention), integer arithmetic throughout — any
    * engine agrees bit-for-bit. Output: (doc_id, lang, lp_q, bucket).
    */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lp = TextAnalysis.logProb(docs)
      .select(col("doc_id"), round(col("mean_logprob") * 10000).cast("long").as("lp_q"))
    val scored = docs.select(col("doc_id"), col("lang")).join(lp, Seq("doc_id"))
    val hist = scored.groupBy("lang", "lp_q").agg(count(lit(1)).as("cnt"))
    val cdf = hist
      .withColumn("cum", sum("cnt").over(Window.partitionBy("lang").orderBy("lp_q")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("lang")))
    val cuts = cdf.groupBy("lang").agg(
      min(when(col("cum") * 3 >= col("n"), col("lp_q"))).as("t1"),
      min(when(col("cum") * 3 >= col("n") * 2, col("lp_q"))).as("t2"))
    scored.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("lp_q"),
        when(col("lp_q") <= col("t1"), "tail")
          .when(col("lp_q") <= col("t2"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** One-glance corpus card — the summary block a dataset datasheet
    * leads with: doc/token/vocabulary totals, language and source
    * spread, exact-duplicate mass, near-dup pair count, integer-exact
    * mean quality. Every value is a deterministic LONG (mean quality
    * rides 1e4-scaled). `nearDupPairs` is the build-once artifact
    * ([[Dedup.nearDupIndex]].pairs) — the card READS the index, it
    * never re-runs LSH. Shape: four one-row aggregates cross-joined
    * and unpivoted; nothing here exceeds one partial-aggregating pass
    * per input. Output: (metric, value), 9 rows. */
  def corpusCard(docs: DataFrame, nearDupPairs: DataFrame): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(md5(col("text"))).as("n_distinct_content"))
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .agg(countDistinct(col("word")).as("n_vocab"))
    val qual = TextAnalysis.quality(docs)
      .agg(sum(round(col("quality") * 10000).cast("long")).as("sq"),
        count(lit(1)).as("nq"))
      .select(expr("sq div nq").as("mean_quality_q"))
    val pairs = nearDupPairs.agg(count(lit(1)).as("n_neardup_pairs"))
    base.crossJoin(vocab).crossJoin(qual).crossJoin(pairs)
      .selectExpr(
        """stack(9,
          |  'n_docs', n_docs,
          |  'n_tokens', n_tokens,
          |  'n_vocab', n_vocab,
          |  'n_langs', n_langs,
          |  'n_sources', n_sources,
          |  'n_distinct_content', n_distinct_content,
          |  'n_exact_dup_docs', n_docs - n_distinct_content,
          |  'n_neardup_pairs', n_neardup_pairs,
          |  'mean_quality_q', mean_quality_q) AS (metric, value)""".stripMargin)
  }

  /** Per-source corpus profile — the crawl-audit rollup (which feeds
    * are big, which are junk): doc and token counts plus mean quality
    * per source. ONE partial-aggregating shuffle on source; the mean
    * is sum/count (engine-exact under rounding), never avg(). */
  def sourceStats(docs: DataFrame): DataFrame =
    TextAnalysis.quality(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        // sum the 4-decimal quality as exact 1e4-scaled longs: a
        // double sum's value depends on accumulation order, which
        // differs per engine/partitioning — an integer sum does not
        round(sum(round(col("quality") * 10000).cast("long")).cast("double")
          / 10000.0 / count(lit(1)), 4).as("mean_quality"))

  /** Per-source cap — the anti-spam curation rule (one feed must not
    * dominate the mix): keep at most `maxPerSource` docs per source,
    * best quality first, ties to the smallest doc_id. Output:
    * (doc_id, source, quality, rank).
    *
    * Scale shape: the rank window partitions by source, and the
    * rank <= N predicate plans as a WindowGroupLimit (PlanSpec-pinned)
    * — Spark inserts a PARTIAL group-limit before the shuffle, so
    * every map task forwards at most N rows per source and a
    * mega-source never floods one window task with its full row set. */
  def sourceCap(docs: DataFrame, maxPerSource: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(desc("quality"), asc("doc_id"))
    TextAnalysis.quality(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= maxPerSource)
      .select(col("doc_id"), col("source"), col("quality"), col("rank"))
  }

  /** Domain-targeted importance weighting (DSIR-style — Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): each doc scores the mean over its tokens of
    * ln(p_target(tok) / p_corpus(tok)), where p_target is a unigram
    * model of the docs matching `targetLang` and p_corpus of the whole
    * corpus. Docs distributionally close to the target domain get
    * high weights; sampling by weight tilts a generic crawl toward the
    * domain without hard filtering. Both models use add-one smoothing
    * over the SHARED corpus vocabulary, so out-of-target tokens are
    * defined (and penalized) rather than -inf.
    *
    * Shape: the [[TextAnalysis.logProb]] family — two vocabulary-sized
    * unigram tables (one partial-aggregating shuffle each; the target
    * table is a filtered aggregate of the same token stream, not a
    * second corpus scan), an equi-join on token (AQE broadcasts the
    * vocab tables iff they fit), one per-doc hash aggregate. The
    * 4-decimal rounding of a length-normalized mean absorbs ln ulps
    * ([[TextAnalysis.logProb]]'s oracle contract). Output: (doc_id,
    * n_tokens, dsir_weight). */
  def importanceWeights(docs: DataFrame, targetLang: String = "en"): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val uni = toks.groupBy("word").agg(
      count(lit(1)).as("cnt"),
      count(when(col("lang") === targetLang, 1)).as("tcnt"))
    val totals = uni.agg(
      sum("cnt").as("total"),
      sum("tcnt").as("ttotal"),
      count(lit(1)).as("vocab"))
    toks
      .join(uni, Seq("word"))
      .crossJoin(broadcast(totals))
      .withColumn("lr",
        log((col("tcnt") + 1).cast("double") / (col("ttotal") + col("vocab")).cast("double"))
          - log((col("cnt") + 1).cast("double") / (col("total") + col("vocab")).cast("double")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        // + 0.0 normalizes IEEE -0.0 (a mean of ~-1e-17 rounds to
        // NEGATIVE zero, whose sign survives into parquet and hashes
        // differently across engines)
        (round(sum("lr") / count(lit(1)), 4) + lit(0.0)).as("dsir_weight"))
  }

  /** Tokens per pack bucket the default derivation targets (~4M: a
    * window partition of tens of MB at any corpus size; with
    * packLen=256 that is ~16k packs per bucket). */
  val TargetTokensPerBucket = 4L * 1024 * 1024

  /** Derive [[packSequences]]' bucket count from ONE cheap
    * partial-aggregating corpus pass: max(16, corpusTokens /
    * [[TargetTokensPerBucket]]). The floor keeps small corpora off the
    * degenerate 1-bucket global window; the ratio keeps every window
    * partition ~constant-sized as the corpus grows. */
  def autoBuckets(docs: DataFrame): Int = {
    val total = docs
      .agg(coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L)))
      .collect()(0).getLong(0)
    math.max(16L, total / TargetTokensPerBucket).toInt
  }

  /** Row-local language ID — the streaming-safe spelling of
    * [[TextAnalysis.langId]] (no joins, no windows): per-language
    * stopword hits computed with array expressions, winner folded with
    * the same (hits DESC, lang ASC) tie-break (candidates are visited
    * lang-ascending and a later one must be STRICTLY better to win). */
  private def predLang(toks: Column): Column = {
    val langs = TextAnalysis.stopwords.map(_._1).distinct.sorted
    val cands = langs.map { l =>
      val words = TextAnalysis.stopwords.filter(_._1 == l).map(_._2)
      struct(
        size(filter(toks, t => t.isin(words: _*))).cast("long").as("hits"),
        lit(l).as("lang"))
    }
    cands.reduceLeft((a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)).getField("lang")
  }

  /** Row-local minhash of family `s` — the same arithmetic as
    * [[Dedup.minhashSignatures]] (8-hex slices of two md5 digests over
    * the doc's distinct k=3 shingles), spelled as array expressions so
    * a STREAMING row can compute it with no join or aggregation
    * (asserted equal to the batch aggregate in StreamingSpec). */
  private def rowLocalMinhash(s: Int): Column = {
    val sh = array_distinct(Dedup.shingleArray(3))
    val digest = (x: Column) => if (s < 4) md5(x) else md5(concat(lit("x|"), x))
    array_min(transform(sh, x => substring(digest(x), 1 + 8 * (s % 4), 8)))
  }

  /** The LIVE half of [[Dedup.incrementalDedup]]: a document stream
    * screened against a STATIC base corpus. The exact tier drops
    * byte-identical re-crawls (stream-static left_anti on the content
    * hash against the base's distinct hash set); the near tier drops a
    * doc whose ANY minhash band signature collides with a base doc's
    * (one left_anti per band against the base's distinct per-band
    * signature set — the band signatures are row-local expressions, so
    * the stream side needs no aggregation). Every join is
    * stream-static and STATELESS: Append-safe, no watermark state.
    * Anti joins are membership tests — no pair blowup, so no bucket
    * cap is needed on this path (contrast
    * [[Dedup.incrementalDedup]]'s reporting join). Base docs too short
    * to shingle have no band signatures and are caught by the exact
    * tier only; short STREAM docs fall back to a `short:`-prefixed
    * content hash that never collides with real 16-hex band
    * signatures. Output: the surviving (doc_id, text).
    *
    * The base-side tables (hash set + per-band signature sets) are
    * computed ONCE and persisted: without this, every micro-batch
    * re-ran the base's shingle-explode + 8-min signature aggregation
    * once PER BAND — ~4 full passes over the standing corpus per
    * batch, which dominates everything at a realistic base size. The
    * cost is snapshot semantics: a refreshed base parquet is picked up
    * on query RESTART, not mid-query (the contract a daily-refresh
    * ingest pipeline wants anyway). The snapshot belongs to the MOST
    * RECENT query: a new streamingIncremental call unpersists the
    * previous snapshot (persisted plans are strongly held by Spark's
    * CacheManager, so without this a restart loop leaks one base
    * snapshot per restart; an older still-running query keeps working
    * — its plan just recomputes the base uncached). Stopping the
    * stream and unpersisting [[lastBaseCache]]'s entries (or
    * SparkSession.catalog.clearCache) frees the current one. */
  def streamingIncremental(stream: DataFrame, base: DataFrame): DataFrame = {
    lastBaseCache.foreach(_.unpersist())
    val nBands = Dedup.NumHashes / Dedup.BandRows
    val baseHashes = base.select(md5(col("text")).as("h")).distinct().persist()
    // ONE signature pass feeds all bands: (band, sig) distinct pairs
    val baseSig = Dedup.minhashSignatures(base)
    val bandCols = (0 until nBands).map(b =>
      struct(lit(b).as("band"), concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("sig")))
    val baseBands = baseSig
      .select(explode(array(bandCols: _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"))
      .distinct().persist()
    lastBaseCache = Seq(baseHashes, baseBands)
    val gated = (0 until nBands).foldLeft(
      stream.withColumn("h", md5(col("text")))
        .join(baseHashes, Seq("h"), "left_anti")) { (df, b) =>
      df.withColumn(s"band$b",
          coalesce(concat(rowLocalMinhash(2 * b), rowLocalMinhash(2 * b + 1)),
            concat(lit("short:"), col("h"))))
        .join(baseBands.filter(col("band") === b).select(col("sig").as(s"band$b")),
          Seq(s"band$b"), "left_anti")
    }
    gated.select(col("doc_id"), col("text"))
  }

  /** The persisted base-snapshot tables behind the most recent
    * [[streamingIncremental]] plan — unpersist after stopping the
    * query to free the snapshot. */
  @volatile private[graft] var lastBaseCache: Seq[DataFrame] = Seq.empty

  /** The LIVE half of [[trainingSet]]: streaming document ingestion
    * with watermark-TTL'd exact dedup (content hash), a NEAR-dup gate
    * on the minhash band-0 signature (semantic tier: catches re-crawls
    * and light edits that break byte identity but keep the band — drop
    * probability for a pair at Jaccard J is ~J^2 per the 2-row band;
    * the full 4-band sweep stays a batch job, this is the in-stream
    * tier), and the same language/quality gates — all row-local,
    * Append-mode safe, both dedup states watermark-TTL'd. Documents
    * too short to shingle fall back to their content hash as the band
    * key, so distinct short docs never collapse together. The
    * representative convention differs from batch by design: streaming
    * keeps the FIRST ARRIVAL of each group (arrival order is the only
    * order a stream has), batch keeps the min doc_id. `docs` must
    * carry (doc_id, text) plus an event-time `ts_utc`. */
  def streamingIngest(docs: DataFrame, watermark: String = "1 hour",
      langs: Seq[String] = Seq("en"), minQuality: Double = 0.5): DataFrame = {
    val toks = split(col("text"), " ")
    val enStop = TextAnalysis.stopwords.filter(_._1 == "en").map(_._2)
    val nTok = size(toks).cast("long")
    val stopHits = size(filter(toks, t => t.isin(enStop: _*))).cast("long")
    // same arithmetic as TextAnalysis.quality (asserted equal in spec)
    val quality = round(
      least(
        lit(1.0),
        lit(0.5) * least(nTok.cast("double") / 50.0, lit(1.0)) +
          lit(0.5) * least(stopHits.cast("double") * 4.0 / nTok, lit(1.0))),
      4)
    docs
      .withWatermark("ts_utc", watermark)
      .withColumn("h", md5(col("text")))
      .dropDuplicatesWithinWatermark("h")
      .withColumn("band_sig",
        coalesce(concat(rowLocalMinhash(0), rowLocalMinhash(1)),
          concat(lit("short:"), col("h"))))
      .dropDuplicatesWithinWatermark("band_sig")
      .withColumn("pred_lang", predLang(toks))
      .withColumn("quality", quality)
      .filter(col("pred_lang").isin(langs: _*) && col("quality") >= minQuality)
      .select(col("doc_id"), col("pred_lang"), col("quality"))
  }

  /** Small-files COMPACTION — the lake-maintenance op every long-lived
    * 100 TB table needs: streaming ingest and per-day partitions leave
    * thousands of KB-sized parquet files whose per-file open/footer
    * cost eventually dwarfs the data read; compaction rewrites them
    * into files sized to `targetBytes`.
    *
    * The file count is derived from the ACTUAL on-disk byte size of
    * the input layout (listing, not sampling), so the output sizing is
    * exact for any compression ratio; `repartition(n)` round-robins
    * rows for near-equal output sizes. This is the rewrite-all form —
    * the production refinement rewrites only files below a size floor
    * and leaves already-right-sized ones in place (same sizing
    * arithmetic, a file-list filter on top); bin-packing by input file
    * is deliberately NOT done row-wise here because round-robin gives
    * tighter size variance than concatenating whole input files.
    *
    * Returns the output file count. Content preservation is gated by
    * pipeline_compact (count + order-independent 48-bit content XOR,
    * overflow-free at any corpus size); output sizing is pinned by
    * PipelineSpec. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val totalBytes = parquetBytes(inDir)
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** PARTITION-PRESERVING compaction (Delta/Iceberg OPTIMIZE, the
    * form a partitioned fact table actually needs — [[compact]]'s
    * global round-robin would collapse the directory layout and lose
    * partition pruning): rewrite every `part=value` directory's small
    * files to ~targetBytes WITHOUT changing the layout, in ONE Spark
    * job. Per-directory file counts n_i come from each directory's
    * listed bytes (same exact-listing discipline as [[compact]]); a
    * salt column `pmod(hash(all columns), n_i)` splits each
    * partition's rows into its n_i target files, the broadcast-sized
    * (directory count) day→n_i map rides a literal CASE expression,
    * and one `repartition(Σn_i, part, salt)` + `partitionBy(part)`
    * write lands everything — no per-partition job loop, so the same
    * plan holds at thousands of directories. Hash collisions between
    * (part, salt) groups can only MERGE two target files of the same
    * directory (the writer emits one file per partition value per
    * task), so per-file size stays bounded near target and the
    * directory layout is preserved exactly. Returns Σn_i. */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, partCol: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dirs = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(inDir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith(partCol + "="))
          .toVector.sortBy(_.toString)
      } finally s.close()
    }
    require(dirs.nonEmpty, s"no $partCol= directories under $inDir")
    // directory-count-sized driver work: one (value, n_i) pair per dir
    val plan = dirs.map { d =>
      val value = d.getFileName.toString.stripPrefix(partCol + "=")
      val n = math.max(1L, (parquetBytes(d.toString) + targetBytes - 1) / targetBytes).toInt
      (value, n)
    }
    val nOf = plan.tail.foldLeft(
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col(partCol).cast("string") === plan.head._1,
        plan.head._2)) { case (acc, (v, n)) =>
      acc.when(org.apache.spark.sql.functions.col(partCol).cast("string") === v, n)
    }.otherwise(1)
    val t = spark.read.parquet(inDir)
    val dataCols = t.columns.filterNot(_ == partCol).map(org.apache.spark.sql.functions.col)
    val total = plan.map(_._2).sum
    t.withColumn("__salt", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(dataCols: _*), nOf))
      .repartition(total, org.apache.spark.sql.functions.col(partCol),
        org.apache.spark.sql.functions.col("__salt"))
      .drop("__salt")
      .write.partitionBy(partCol).mode("overwrite").parquet(outDir)
    total
  }

  /** Sum of data-file bytes under a parquet dir (skips _SUCCESS etc.).
    * Walks RECURSIVELY: a partitioned layout keeps its data files in
    * subdirectories, and the flat-listing form summed those to 0 — so
    * compact() would silently coalesce a partitioned input into one
    * file instead of sizing to targetBytes (ADVICE round-10). */
  def parquetBytes(dir: String): Long = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size)
        .sum
    } finally s.close()
  }
}
