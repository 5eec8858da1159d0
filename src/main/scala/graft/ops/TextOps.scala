package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data-pipeline use over the `documents`
  * table: tokenization/counting, quality scoring, language identification,
  * and document fingerprinting.
  *
  * All operators are pure Spark SQL builtin expressions (no UDFs) so they
  * stay inside whole-stage codegen and scale linearly — each is a narrow map
  * over the documents scan; only the explicitly-aggregating entry points
  * shuffle.
  */
object TextOps {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. Also computable as pure char arithmetic (see
    * `tokenCountArith`) for engines without array functions.
    */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Token count via character arithmetic only: #spaces + 1. Useful as the
    * cross-engine-deterministic form (identical in any SQL dialect).
    */
  def tokenCountArith(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", ""))) + lit(1)

  /** BPE-ish subword count estimate: words are split on transitions and long
    * words cost extra tokens (≈ len/4 like common BPE vocabularies).
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, w) => acc + greatest(lit(1L), ceil(length(w).cast("double") / 4.0).cast("long")))

  private val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for")

  /** Fraction of tokens that are stopwords, in DOUBLE. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, w => w.isInCollection(stopwords))
    size(stops).cast("double") / size(toks).cast("double")
  }

  /** Mean token length in DOUBLE (single IEEE division). */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, w) => acc + length(w).cast("long")).cast("double") /
      size(toks).cast("double")
  }

  /** Gopher/C4-style RULE filter: hard keep/drop per document with the
    * first failing rule as the reason — the form a pretraining pipeline
    * actually gates on (the composite [[qualityScore]] is for ranking;
    * thresholded rules are for filtering, and the recorded reason drives
    * the per-rule drop-rate dashboards a 100 TB curation run lives by).
    *
    * Every feature is a stateless codegen'd expression over the row (no
    * shuffle, filter-pushdown-friendly) and every formula is chosen to be
    * replayable verbatim in ANSI-ish SQL for the oracle:
    * `mean_tok_len` uses the exact identity Σ len(tok) = len(text) −
    * (n_tokens − 1) for a single-char separator, avoiding a per-token
    * aggregation in both engines.
    */
  def qualityFlags(
      documents: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minTokens: Int = 10,
      maxTokens: Int = 1000,
      minMeanTokLen: Double = 2.0,
      maxMeanTokLen: Double = 12.0,
      maxTokLen: Int = 30,
      minStopwordRatio: Double = 0.02): DataFrame = {
    val toks = tokens(col(textCol))
    val nTokens = size(toks).cast("bigint")
    val meanTokLen =
      (length(col(textCol)).cast("bigint") - nTokens + lit(1L)).cast("double") /
        nTokens.cast("double")
    val maxTok = array_max(transform(toks, w => length(w))).cast("bigint")
    val nStop = size(filter(toks, w => w.isInCollection(stopwords))).cast("bigint")
    val stopRatio = nStop.cast("double") / nTokens.cast("double")
    documents.select(
      col(idCol),
      nTokens.as("n_tokens"),
      meanTokLen.as("mean_tok_len"),
      maxTok.as("max_tok_len"),
      stopRatio.as("stop_ratio"),
      when(nTokens < minTokens || nTokens > maxTokens, "n_tokens")
        .when(meanTokLen < minMeanTokLen || meanTokLen > maxMeanTokLen, "mean_tok_len")
        .when(maxTok > maxTokLen, "long_token")
        .when(stopRatio < minStopwordRatio, "low_stopword")
        .otherwise("ok").as("reason"))
      .withColumn("keep", col("reason") === "ok")
  }

  /** Punctuation-character ratio (over total chars), in DOUBLE. */
  def punctRatio(text: Column): Column =
    (length(text) - length(translate(text, ".,;:!?'\"()-", ""))).cast("double") /
      length(text).cast("double")

  /** Composite quality score in [0,1]: rewards mid-length docs, penalizes
    * extreme punctuation and stopword-free (keyword-stuffed) text. A
    * heuristic scorer of the kind used for pretraining-data filtering.
    *
    * Rounded to 6 decimals via explicit `floor(x·10⁶ + 0.5)/10⁶` (half-up)
    * rather than `round(x, 6)`: engines disagree on round()'s tie rule
    * (half-up vs banker's half-even), while the floor form is plain IEEE
    * arithmetic every engine evaluates identically — it is what lets
    * `text_analyze` be hash-checked against the DuckDB oracle.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / 50.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    floor((lengthScore * 0.5 + punctScore * 0.25 + stopScore * 0.25) * 1e6 + 0.5) / lit(1e6)
  }

  /** Per-language marker-word profiles for the n-gram/keyword language-ID
    * heuristic. Deterministic, dictionary-free, executor-local.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to", "a", "in", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "una", "por", "con"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"))

  /** Heuristic language ID: the language whose marker set overlaps the
    * document's token set the most (ties broken by fixed language order,
    * "und" when nothing matches).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = langMarkers.map { case (lang, markers) =>
      struct(
        size(array_intersect(toks, array(markers.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = aggregate(
      array(scored: _*),
      struct(lit(-1).as("score"), lit("und").as("lang")),
      (acc, s) => when(s.getField("score") > acc.getField("score"), s).otherwise(acc))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Polynomial rolling-hash fingerprint of the full text, mod 1e9+7:
    * `h = (h*31 + code(char)) mod p`, left-to-right — deterministic and
    * expressible identically in any engine with a fold.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, c) => (acc * 31L + ascii(c).cast("long")) % 1000000007L)

  /** Cross-engine-portable 56-bit hash: the first 14 hex chars of md5,
    * parsed big-endian (`('0x' || substr(md5(s),1,14))::BIGINT` in DuckDB).
    * Slower than xxhash64 (md5 + string conv) — use it where a DuckDB
    * oracle must replicate hash values exactly; default production paths
    * keep xxhash64.
    */
  def portableHash56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** Winnowing fingerprints (Schleimer et al.'s local document
    * fingerprinting): hash the k-gram shingles, slide a window of `w`
    * hashes, keep each window's minimum, dedup. Guarantees any shared run
    * of ≥ w+k-1 tokens between two documents yields at least one shared
    * fingerprint — the positional robustness plain MinHash lacks.
    *
    * DataFrame-level on purpose: an expression form
    * (`transform(windows, j -> array_min(slice(hs, ...)))`) re-evaluates
    * the entire shingle-hash array inside every window lambda — O(len²)
    * string work per document. This shape is posexplode + one windowed
    * `min` + a frame filter: codegen'd, one sort per doc, linear.
    * Output: (idCol, fingerprints ARRAY<BIGINT> sorted ascending).
    */
  def winnowFingerprints(
      documents: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleSize: Int = 3,
      window: Int = 4,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val hs = Parallelism.widen(documents)
      .select(col(idCol), posexplode(shingles(col(textCol), shingleSize)).as(Seq("pos", "s")))
      .select(col(idCol), col("pos"), hashFn(col("s")).as("h"))
    val perDoc = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
    val frame = perDoc.orderBy("pos").rowsBetween(0, window - 1)
    hs
      .withColumn("m", min(col("h")).over(frame))
      .withColumn("n", count(lit(1)).over(perDoc))
      // full windows only; a doc shorter than the window keeps its single
      // (truncated-frame = whole-array) minimum at pos 0
      .where(col("pos") <= greatest(col("n") - window, lit(0)))
      .groupBy(idCol)
      .agg(array_sort(collect_set(col("m"))).as("fingerprints"))
  }

  /** Word n-gram shingles (default 3) for MinHash/Jaccard dedup. Documents
    * shorter than n words contribute their full text as one shingle.
    *
    * A native codegen expression ([[graft.functions.ShinglesExpr]]):
    * the former `transform(sequence)`/`concat_ws(slice(split))` HOF
    * composition evaluated interpreted — the dedup tier's last
    * non-codegen island and its cold-JIT noise source. [[shinglesHof]]
    * keeps the declarative form as the spec's equality oracle.
    */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.ShinglesExpr(
        org.apache.spark.sql.GraftSqlShims.expression(text), n))

  /** The higher-order-function form of [[shingles]] — semantically
    * identical, interpreted; retained as the independent oracle
    * ShinglesExprSpec checks the codegen kernel against.
    */
  private[graft] def shinglesHof(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(text)).otherwise(
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Gopher-style within-document repetition metrics: duplicate-n-gram
    * fraction for n=2 and n=3 plus the most-frequent-bigram share. High
    * values mark boilerplate, templated spam, and looping generations —
    * the repetition gates a pretraining filter stack applies next to
    * [[qualityFlags]].
    *
    * Shape: explode n-grams → two chained hash aggregates (both codegen'd
    * with map-side partial combine). The per-doc group never materializes
    * an n-gram list, so a pathological 1 GB document costs memory
    * O(distinct grams per partition), not O(doc length) — the property
    * that keeps the pass safe on an unfiltered 100 TB crawl.
    */
  def repetitionStats(
      documents: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def stats(n: Int, pfx: String) = {
      val counts = Parallelism.widen(documents)
        .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("c"))
      counts.groupBy("id").agg(
        sum(col("c")).as(s"n_$pfx"),
        count(lit(1)).as(s"d_$pfx"),
        max(col("c")).as(s"m_$pfx"))
    }
    stats(2, "2").join(stats(3, "3"), "id")
      .select(
        col("id").as(idCol),
        col("n_2").as("n_2grams"),
        ((col("n_2") - col("d_2")).cast("double") / col("n_2").cast("double"))
          .as("dup_2gram_frac"),
        (col("m_2").cast("double") / col("n_2").cast("double")).as("top_2gram_frac"),
        ((col("n_3") - col("d_3")).cast("double") / col("n_3").cast("double"))
          .as("dup_3gram_frac"))
  }

  /** Full per-document analysis projection over a documents DataFrame. */
  /** `ARRAY<STRING>` of all character trigrams of `text` (positions
    * 1..len−2; empty below 3 chars — `sequence` would count DOWNWARD on a
    * negative span, so the short-text case is guarded explicitly).
    */
  private def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      transform(sequence(lit(1), length(text) - 2),
        i => text.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** Corpus-trained character-trigram vocabulary: the `topK` most frequent
    * trigrams, ties at the cut broken by trigram (binary collation — the
    * same rule DuckDB's `ORDER BY c DESC, tri` applies). One exploded
    * count pass; the result is ≤ topK rows, the broadcastable "model".
    */
  def trigramVocab(
      documents: DataFrame,
      textCol: String = "text",
      topK: Int = 512): DataFrame =
    Parallelism.widen(documents)
      .select(explode(charTrigrams(col(textCol))).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("tri"))
      .limit(topK)
      .select("tri")

  /** Language-model-flavored quality signal without a language model: how
    * much of a document is made of trigrams the corpus itself considers
    * common. Train = one count pass + top-K cut ([[trigramVocab]]); score =
    * explode each doc's trigrams, membership-check against the BROADCAST
    * vocab, partial-count per doc — the explode and the join are map-side,
    * so only (doc_id, count) rows ever shuffle, at any corpus size.
    * Outputs are integers plus one single-division rate (both bit-identical
    * across engines — no float-sum ordering hazard), so the whole op is
    * DuckDB-oracle-checkable. Docs shorter than 3 chars have no trigrams
    * and drop out, matching the oracle's empty `range`.
    */
  def oovScore(
      documents: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      topK: Int = 512): DataFrame = {
    val vocab = trigramVocab(documents, textCol, topK)
    Parallelism.widen(documents)
      .select(col(idCol), explode(charTrigrams(col(textCol))).as("tri"))
      .join(broadcast(vocab.withColumn("known", lit(1))), Seq("tri"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("oov_trigrams"))
      .withColumn("oov_rate",
        col("oov_trigrams").cast("double") / col("n_trigrams"))
  }

  def analyze(documents: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    Parallelism.widen(documents)
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpe", bpeTokenEstimate(t))
      .withColumn("avg_token_len", avgTokenLen(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
