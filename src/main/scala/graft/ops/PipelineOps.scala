package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators a training-data pipeline needs around the
  * cleaning tiers (dedup/similarity/text analysis): deterministic splits,
  * sampling, and pattern scrubbing.
  *
  * Everything here is driven by [[TextOps.portableHash56]] over the row's
  * OWN id — no RNG state, no `rand()`:
  *   - reproducible anywhere (the same row lands in the same split on a
  *     laptop, a 1000-executor cluster, or DuckDB replaying the oracle SQL);
  *   - stable under re-partitioning, retries, and incremental reruns —
  *     `rand()`-based splits silently reshuffle rows between train and test
  *     whenever a task retries, which leaks test data into training;
  *   - stateless per row, so split/sample filters are codegen'd predicates
  *     that stack UNDER the parquet scan's column pruning (no shuffle, no
  *     driver coordination — the only split shape that works at 100 TB).
  */
object PipelineOps {

  /** Hash bucket in [0, buckets) for a row id, salted so independent
    * pipeline stages (split vs sample) draw independent buckets.
    */
  def hashBucket(idCol: Column, salt: String, buckets: Int = 100): Column =
    pmod(TextOps.portableHash56(concat(idCol.cast("string"), lit("|" + salt))), lit(buckets.toLong))

  /** Deterministic train/val/test-style split assignment.
    *
    * `fractions` are (name, weight) pairs summing to 1.0; weights are
    * resolved to integer percent thresholds (so 0.9/0.05/0.05 → buckets
    * [0,90) / [90,95) / [95,100)). Adding a `bucket` column alongside the
    * label keeps the assignment auditable and lets a later re-split (say
    * 95/5 → 90/10) keep every existing train row in train.
    */
  def splitAssignments(
      df: DataFrame,
      idCol: String = "doc_id",
      salt: String = "split",
      fractions: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    val pcts = fractions.map { case (n, f) => (n, math.round(f * 100).toInt) }
    require(pcts.map(_._2).sum == 100, s"fractions must sum to 1.0 in whole percents: $fractions")
    val bucket = hashBucket(col(idCol), salt)
    val cumulative = pcts.scanLeft(0)(_ + _._2).tail
    val label = pcts.zip(cumulative).init.foldRight(lit(pcts.last._1)) {
      case (((name, _), upper), rest) => when(bucket < upper, name).otherwise(rest)
    }
    df.withColumn("bucket", bucket).withColumn("split", label)
  }

  /** Stateless fractional sample: keep a row iff its hash bucket (of 1000)
    * falls under `fraction`. A pure filter — no shuffle, no count, no
    * coordination; prunes at the scan on a 100 TB table. Salting the hash
    * per stage makes repeated sampling draws independent.
    */
  def sampleFraction(
      df: DataFrame,
      fraction: Double,
      idCol: String = "doc_id",
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.where(hashBucket(col(idCol), salt, 1000) < math.round(fraction * 1000).toInt)
  }

  /** Stratified cap-N sample: at most `cap` rows per stratum, chosen by
    * hash order (deterministic "random" rank, ties broken by id). One
    * shuffle on the stratum key; per-stratum state is a streaming top-N
    * inside the window sort. For FRACTIONAL stratified sampling prefer
    * [[sampleFraction]] with the stratum folded into the salt — that form
    * needs no shuffle at all.
    */
  def sampleCapPerStratum(
      df: DataFrame,
      strataCol: String,
      cap: Int,
      idCol: String = "doc_id",
      salt: String = "sample"): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(hashBucket(col(idCol), salt, 1 << 30), col(idCol))
    df.withColumn("rn", row_number().over(w).cast("bigint")).where(col("rn") <= cap)
  }

  /** Mixture (per-stratum weighted) sampling: keep each row with its
    * stratum's probability — how a run hits a target domain mix (web 50 %,
    * code 25 %, …) without a shuffle, a count, or per-stratum jobs.
    * `fractionCol` is any per-row expression in [0,1] (a `when`-chain over
    * sources, arithmetic on a source attribute, a joined-in weight
    * column). The stratum value is folded into the hash salt so draws are
    * independent across strata: a row kept for one source assignment would
    * be an independent coin flip under another. Like [[sampleFraction]]
    * this is a stateless codegen'd scan predicate — the only mixture-
    * sampling shape that costs nothing extra at 100 TB.
    */
  def mixtureSample(
      df: DataFrame,
      strataCol: String,
      fractionCol: Column,
      idCol: String = "doc_id",
      salt: String = "mix"): DataFrame = {
    val b = pmod(
      TextOps.portableHash56(
        concat(col(idCol).cast("string"), lit("|" + salt + "|"), col(strataCol).cast("string"))),
      lit(1000L))
    df.where(b < round(fractionCol * 1000).cast("long"))
  }

  /** Training-sequence packing: assign every document a deterministic
    * shard, an order within the shard, and the token offset at which its
    * text starts when the shard's documents are concatenated —
    * `seq_id = floor(start_offset / budget)` is then the fixed-size
    * training sequence the document starts in (GPT-style chunked
    * concatenation, where documents may cross sequence boundaries).
    *
    * Sharding and ordering both derive from one salted portable hash, so
    * the packing is reproducible anywhere and stable under repartitioning;
    * each shard packs independently (one window sort per shard — shards
    * ARE the parallelism unit, the way a 100 TB packing run fans out), and
    * the running-offset window is the only shuffle.
    */
  def packSequences(
      df: DataFrame,
      tokenCol: String,
      idCol: String = "doc_id",
      budget: Int = 256,
      shards: Int = 8,
      salt: String = "pack"): DataFrame = {
    val h = TextOps.portableHash56(concat(col(idCol).cast("string"), lit("|" + salt)))
    val w = Window.partitionBy("shard").orderBy("h", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("start_offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("start_offset") / lit(budget.toDouble)))
      .drop("h")
  }

  /** Redacts every match of `pattern` with `token` — the PII/number-scrub
    * pass (emails, phone numbers, ids) run before a corpus ships to
    * training. Pure codegen'd string expression: stateless, partition-
    * parallel, no UDF. Keep `pattern` in the regex subset shared by Java
    * and RE2 so the oracle replays it unchanged.
    */
  def redact(c: Column, pattern: String, token: String = "<REDACTED>"): Column =
    regexp_replace(c, pattern, token)

  /** Count of characters matching `charClass` (a single-char regex class):
    * length delta against a strip — portable to engines without
    * regexp_count.
    */
  def charClassCount(c: Column, charClass: String): Column =
    (length(c) - length(regexp_replace(c, charClass, ""))).cast("bigint")

  /** Per-entity temporal holdout (leave-last-N-out): the newest `holdout`
    * rows of each entity become the test set, everything earlier trains —
    * the split that respects causality for recommender/forecast
    * evaluation, where a RANDOM split leaks the future into training.
    * Ties on the timestamp break by `tieBreakCol` so the assignment is
    * deterministic. One ranking window per entity; only (entity, ts, id)
    * ordering state is involved, no global sort.
    */
  def temporalSplit(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      tieBreakCol: String,
      holdout: Int = 1): DataFrame = {
    require(holdout > 0, s"holdout must be positive, got $holdout")
    val w = Window.partitionBy(entityCol)
      .orderBy(col(tsCol).desc, col(tieBreakCol).desc)
    df.withColumn("__recency", row_number().over(w))
      .withColumn("split",
        when(col("__recency") <= holdout, lit("test")).otherwise(lit("train")))
      .drop("__recency")
  }

  /** Deterministic negative sampling for implicit/contrastive training:
    * for every user in `positives`, draw `candidatesPerUser` pseudo-random
    * item indices from the salted hash of (user, draw-number), map them to
    * items, anti-join the user's positives, and keep the first `k` per
    * user (ordered by draw number, then item for tie-stability). The
    * standard label-construction pass for recommender / embedding
    * training, without `rand()`: every negative is reproducible from
    * (user, salt), invariant to partitioning and re-runs.
    *
    * Scale shape: candidates are `users × candidatesPerUser` rows of
    * (user, 8-byte index) — independent of the item-universe size; the
    * item mapping is an equi-join against the (small, dimension-sized)
    * item table and the positives anti-join shuffles only key pairs. No
    * cross product anywhere. `candidatesPerUser` needs slack over `k`
    * only for draws that collide with that user's positives or repeat.
    *
    * `items` must carry a dense `item_idx` in [0, numItems) plus the
    * item-id column named `itemCol`.
    */
  def negativeSamples(
      positives: DataFrame,
      items: DataFrame,
      numItems: Long,
      k: Int,
      candidatesPerUser: Int,
      userCol: String = "user_id",
      itemCol: String = "item_id",
      salt: String = "neg"): DataFrame = {
    require(candidatesPerUser >= k, s"need candidatesPerUser >= k, got $candidatesPerUser < $k")
    val users = positives.select(col(userCol)).distinct()
    val draws = users
      .select(col(userCol), explode(sequence(lit(1), lit(candidatesPerUser))).as("j"))
      .withColumn("item_idx",
        pmod(
          TextOps.portableHash56(
            concat_ws("|", col(userCol), col("j"), lit(salt))),
          lit(numItems)))
      // the same index can be drawn twice for one user: keep the earliest draw
      .groupBy(col(userCol), col("item_idx"))
      .agg(min(col("j")).as("j"))
    val mapped = draws.join(items, "item_idx")
      .select(col(userCol), col(itemCol), col("j"))
    val negs = mapped.join(
      positives.select(col(userCol), col(itemCol)),
      Seq(userCol, itemCol), "left_anti")
    val w = Window.partitionBy(userCol).orderBy(col("j"), col(itemCol))
    negs
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(userCol), col(itemCol), col("rk").cast("bigint").as("rk"))
  }

  /** Equi-width histogram of a numeric column — the distribution-audit
    * pass a pipeline runs on lengths, quality scores, and token counts
    * before choosing filter thresholds. Values below `lo` clamp into the
    * first bucket, values at/above `hi` into the last, so the histogram
    * is total. One map-side-combined hash aggregate over `nBins` keys:
    * the cheapest possible distributed shape (empty buckets are simply
    * absent).
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"need nBins > 0 and hi > lo, got [$lo,$hi)x$nBins")
    val width = (hi - lo) / nBins
    val bucket = least(
      greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("bigint")
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("bucket"),
        (lit(lo) + col("bucket") * lit(width)).as("bucket_lo"),
        (lit(lo) + (col("bucket") + 1) * lit(width)).as("bucket_hi"),
        col("n"))
  }

  /** Overlapping-window document chunking: sliding token windows of
    * `window` words advancing by `stride` — the context-window shaping
    * step for RAG indexing and long-document training, where `window -
    * stride` tokens of overlap keep boundary-spanning content intact in
    * at least one chunk. Every document emits at least one chunk (short
    * docs emit themselves); the last window clamps at the document end.
    * Output: `(id, chunk_id, chunk_tokens, chunk_text)`.
    *
    * One narrow pass per document — no shuffle, no UDF; the window plan
    * stays inside whole-stage codegen, so this runs at scan speed on an
    * arbitrarily large corpus.
    */
  def chunkDocuments(
      documents: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      window: Int = 32,
      stride: Int = 16): DataFrame = {
    require(stride > 0 && window >= stride, s"need 0 < stride <= window, got window=$window stride=$stride")
    val ws = split(col(textCol), " ")
    val nWindows = ceil(greatest(size(ws) - window, lit(0)) / lit(stride.toDouble))
      .cast("int") + 1
    val chunks = transform(
      sequence(lit(0), nWindows - 1),
      i => slice(ws, i * stride + 1, lit(window)))
    documents
      .select(col(idCol).as("id"), posexplode(chunks).as(Seq("chunk_id", "cw")))
      .select(
        col("id"),
        col("chunk_id").cast("bigint").as("chunk_id"),
        size(col("cw")).cast("bigint").as("chunk_tokens"),
        concat_ws(" ", col("cw")).as("chunk_text"))
  }

  /** Size-targeted output layout plan — the small-files answer for a
    * partitioned 100 TB corpus sink. Per partition-key group: row count,
    * estimated bytes (from a caller-chosen per-row size column — e.g.
    * `n_chars`, or a serialized-size estimate), and the target file count
    * `max(1, ceil(est_bytes / targetBytes))`. A pure pre-aggregated plan:
    * one row per partition key, so it broadcasts into [[compactTo]] and
    * audits as a table (which partitions are fragmenting, which are
    * skewed) without touching file-system metadata.
    */
  def compactionPlan(
      df: DataFrame,
      groupCols: Seq[String],
      bytesCol: Column,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("rows"),
        sum(bytesCol).cast("bigint").as("est_bytes"))
      .withColumn("target_files",
        greatest(lit(1L),
          ceil(col("est_bytes") / lit(targetBytes.toDouble)).cast("bigint")))
  }

  /** Rewrite shape for the plan: each row joins its group's target file
    * count (broadcast — the plan is one row per partition key) and lands
    * in a deterministic shard `portableHash56(id) % target_files`, then
    * the frame is hash-repartitioned on (groupCols, shard) so a
    * `writer.partitionBy(groupCols)` write emits ~target_files files per
    * partition directory. Deterministic end to end (same row → same shard
    * on any cluster/retry); per-group file counts are bounded above by
    * the plan and approach it as rows ≫ files (hash placement, the same
    * collision regime as any `repartition(n, cols)` write). `numShuffle`
    * caps the exchange width like any production write job.
    */
  def compactTo(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      bytesCol: Column,
      targetBytes: Long,
      numShuffle: Int = 0): DataFrame = {
    val plan = compactionPlan(df, groupCols, bytesCol, targetBytes)
      .select(groupCols.map(col) :+ col("target_files"): _*)
    val sharded = df
      .join(broadcast(plan), groupCols)
      .withColumn("__shard",
        pmod(TextOps.portableHash56(col(idCol).cast("string")), col("target_files")))
    val keys = groupCols.map(col) :+ col("__shard")
    val out =
      if (numShuffle > 0) sharded.repartition(numShuffle, keys: _*)
      else sharded.repartition(keys: _*)
    out.drop("target_files", "__shard")
  }

  /** Morton (Z-order) key for a 2-D data layout: interleaves the low 16
    * bits of two non-negative bucket columns (bit 2i = x's bit i, bit
    * 2i+1 = y's bit i), so sorting by the key clusters rows that are
    * close in BOTH dimensions — the multi-column locality a min/max-
    * pruned scan needs when queries filter on either column (a single-
    * column sort gives perfect pruning on one dimension and none on the
    * other).
    *
    * Built from the classic magic-number bit spread with BUILT-IN
    * shift/mask functions only — no UDF, no custom expression: ~10 long
    * ops per column, whole-stage codegen'd, and bit-for-bit replayable
    * in any SQL engine with `&`/`|`/`<<` (the oracle does exactly that).
    * Callers quantize raw columns to 16-bit buckets first ([[hashBucket]],
    * `histogram`-style width bucketing, or a plain `& 0xFFFF`).
    */
  def zOrderKey(xBucket: Column, yBucket: Column): Column = {
    def spread16(c: Column): Column = {
      // 0x0000ffff -> x[i] lands at bit 2i; masks open one gap per step
      val s0 = c.cast("bigint").bitwiseAND(lit(0xFFFFL))
      val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
      (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
    }
    spread16(xBucket).bitwiseOR(shiftleft(spread16(yBucket), 1))
  }
}
