package graft.ops

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineOpsSpec extends AnyFunSuite with SparkFixture {

  private def docs(n: Int): DataFrame = {
    import spark.implicits._
    (0L until n.toLong)
      .map(i => (i, if (i % 3 == 0) "en" else "fr", s"doc number $i with some words"))
      .toDF("doc_id", "lang", "text")
  }

  test("splitAssignments is deterministic, exhaustive, and near the requested fractions") {
    val d = docs(2000)
    val a = PipelineOps.splitAssignments(d).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = PipelineOps.splitAssignments(d.repartition(7)).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.size == 2000)
    val bySplit = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 1600 && bySplit("train") < 1950)
    assert(bySplit("val") > 40 && bySplit("val") < 180)
    assert(bySplit("test") > 40 && bySplit("test") < 180)
  }

  test("splitAssignments rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      PipelineOps.splitAssignments(docs(5), fractions = Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("sampleFraction keeps ~fraction, is stable, and independent across salts") {
    val d = docs(2000)
    val s1 = PipelineOps.sampleFraction(d, 0.2, salt = "s1").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s1b = PipelineOps.sampleFraction(d, 0.2, salt = "s1").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = PipelineOps.sampleFraction(d, 0.2, salt = "s2").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s1b, "same salt must redraw the same sample")
    assert(s1.size > 300 && s1.size < 500)
    // independent draws overlap on ~fraction² of rows, not ~fraction
    val overlap = (s1 & s2).size.toDouble / 2000
    assert(overlap < 0.08, s"salted draws should be near-independent, overlap=$overlap")
    // growing the fraction only ADDS rows (nested samples — the property
    // that lets a pipeline scale a sample up without resampling)
    val bigger = PipelineOps.sampleFraction(d, 0.5, salt = "s1").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(bigger))
  }

  test("sampleCapPerStratum caps every stratum and ranks deterministically") {
    val d = docs(300)
    val got = PipelineOps.sampleCapPerStratum(d, "lang", cap = 25)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.forall(_ == 25))
    val again = PipelineOps.sampleCapPerStratum(d.repartition(5), "lang", cap = 25)
    assert(
      got.select("lang", "doc_id", "rn").collect().map(_.toString).sorted.toSeq ==
        again.select("lang", "doc_id", "rn").collect().map(_.toString).sorted.toSeq)
    // a stratum smaller than the cap survives whole
    val tiny = PipelineOps.sampleCapPerStratum(docs(10), "lang", cap = 25)
    assert(tiny.count() == 10)
  }

  test("redact and charClassCount scrub and count pattern matches") {
    import spark.implicits._
    val df = Seq(
      (1L, "call 555-1234 or 555-9999"),
      (2L, "no digits here"),
      (3L, "{\"k\": 42}")).toDF("id", "s")
    val got = df.select(
      col("id"),
      PipelineOps.redact(col("s"), "[0-9]+", "<NUM>").as("r"),
      PipelineOps.charClassCount(col("s"), "[0-9]").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, "call <NUM>-<NUM> or <NUM>-<NUM>", 14L),
      (2L, "no digits here", 0L),
      (3L, "{\"k\": <NUM>}", 2L)))
  }

  test("qualityFlags applies rules in order with the first failing reason") {
    import spark.implicits._
    val df = Seq(
      (1L, "too short"),                                           // n_tokens < 10
      (2L, ("the quick brown fox jumps over a lazy dog " * 3).trim), // ok
      (3L, "a b c d e f g h i j k l m n o p"),                     // mean_tok_len < 2
      (4L, "the of and a verylongtokenthatgoesonforevermorethan30chars x y z q w e r t"), // long_token
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")) // low_stopword
      .toDF("doc_id", "text")
    val got = TextOps.qualityFlags(df)
      .select("doc_id", "reason", "keep")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ("n_tokens" -> false))
    assert(got(2L) == ("ok" -> true))
    assert(got(3L) == ("mean_tok_len" -> false))
    assert(got(4L) == ("long_token" -> false))
    assert(got(5L) == ("low_stopword" -> false))
  }

  test("mixture sampling follows per-stratum fractions, deterministically") {
    val spark2 = spark
    import spark2.implicits._
    val df = (0L until 1000L)
      .map(i => (i, if (i % 2 == 0) "all" else "half"))
      .toDF("doc_id", "source")
    val frac = when(col("source") === "all", 1.0).otherwise(0.5)
    val kept = PipelineOps.mixtureSample(df, "source", frac)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // fraction 1.0 keeps the whole stratum
    assert(kept.count(_._2 == "all") == 500)
    // fraction 0.5 keeps roughly half (binomial 500 @ 0.5, generous band)
    val halfKept = kept.count(_._2 == "half")
    assert(halfKept > 180 && halfKept < 320, s"halfKept=$halfKept")
    // deterministic under rerun and under repartitioning
    val again = PipelineOps.mixtureSample(df.repartition(7), "source", frac)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSet == kept.toSet)
    // fraction 0 drops the stratum entirely
    val none = PipelineOps.mixtureSample(df, "source",
      when(col("source") === "all", 0.0).otherwise(1.0))
      .collect().map(_.getString(1))
    assert(!none.contains("all") && none.length == 500)
  }

  test("packSequences matches a plain-Scala replay of the packing rule") {
    val spark2 = spark
    import spark2.implicits._
    def h56(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(14)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = (0L until 50L).map(i => (i, i % 7 + 1))
    val got = PipelineOps.packSequences(
      docs.toDF("doc_id", "n_tokens").repartition(5), "n_tokens", budget = 16, shards = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("start_offset"), r.getAs[Long]("seq_id"))))
      .toMap
    // replay: shard/order by the same salted hash, prefix-sum offsets
    val expected = docs
      .map { case (id, n) => (id, n, h56(s"$id|pack")) }
      .groupBy(_._3 % 4)
      .flatMap { case (shard, rows) =>
        var off = 0L
        rows.sortBy { case (id, _, h) => (h, id) }.map { case (id, n, _) =>
          val r = (id, (shard, off, off / 16)); off += n; r
        }
      }.toMap
    assert(got == expected)
  }

  test("packSequences offsets are contiguous within every shard") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (0L until 200L).map(i => (i, i % 11 + 1)).toDF("doc_id", "n_tokens")
    val rows = PipelineOps.packSequences(docs, "n_tokens", budget = 64, shards = 8).collect()
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("start_offset"))
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(b.getAs[Long]("start_offset") ==
          a.getAs[Long]("start_offset") + a.getAs[Long]("n_tokens"))
      }
    }
  }

  test("chunkDocuments windows cover every token with the requested overlap") {
    val spark2 = spark
    import spark2.implicits._
    val words = (1 to 75).map(i => s"w$i")
    val d = Seq((1L, words.mkString(" ")), (2L, "a b c")).toDF("doc_id", "text")
    val rows = PipelineOps.chunkDocuments(d, window = 32, stride = 16)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("chunk_tokens"), r.getAs[String]("chunk_text")))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // 75 tokens, window 32, stride 16 -> ceil((75-32)/16)+1 = 4 windows
    assert(doc1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(doc1.map(_._3).toSeq == Seq(32L, 32L, 32L, 27L)) // last clamps at doc end
    // window i starts at token i*stride; consecutive windows overlap by window-stride
    doc1.foreach { case (_, cid, n, text) =>
      val expect = words.slice((cid * 16).toInt, (cid * 16).toInt + 32)
      assert(text == expect.mkString(" ") && n == expect.length)
    }
    // short doc: one chunk = the doc itself
    val doc2 = rows.filter(_._1 == 2L)
    assert(doc2.toSeq == Seq((2L, 0L, 3L, "a b c")))
  }

  test("temporalSplit holds out the newest rows per entity with stable ties") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      (1L, 10L, 100L), (2L, 10L, 300L), (3L, 10L, 200L),
      (4L, 20L, 500L), (5L, 20L, 500L), // timestamp tie -> higher id is newer
      (6L, 30L, 700L))                  // single-row entity: all test
    val d = rows.toDF("event_id", "user_id", "ts")
    val got = PipelineOps.temporalSplit(d, "user_id", "ts", "event_id", holdout = 1)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("split")).toMap
    assert(got == Map(
      1L -> "train", 2L -> "test", 3L -> "train",
      4L -> "train", 5L -> "test",
      6L -> "test"))
  }

  test("negativeSamples never emits a positive, is deterministic, and fills k per user") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(7L)
    val positives = (for {
      u <- 0L until 50L; i <- 0L until 100L if rng.nextDouble() < 0.1
    } yield (u, i)).toDF("user_id", "item_id")
    val items = (0L until 100L).map(i => (i, i)).toDF("item_idx", "item_id")
    val negs = PipelineOps.negativeSamples(
      positives, items, numItems = 100L, k = 5, candidatesPerUser = 20)
    val rows = negs.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val posSet = positives.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall { case (u, i, _) => !posSet.contains((u, i)) },
      "a sampled negative collided with a positive")
    // every user gets exactly k (universe 100, positives ~10, draws 20)
    val perUser = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perUser.values.forall(_ == 5))
    assert(perUser.size == positives.select("user_id").distinct().count())
    // ranks are 1..k and the draw is invariant to input partitioning
    assert(rows.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    val again = PipelineOps.negativeSamples(
      positives.repartition(13), items, numItems = 100L, k = 5, candidatesPerUser = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == rows.toSet)
  }

  test("histogram clamps out-of-range values into edge buckets and is total") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 100.0, 250.0)
      .toDF("v")
    val got = PipelineOps.histogram(d, "v", lo = 0.0, hi = 100.0, nBins = 10)
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Double]("bucket_lo"), r.getAs[Double]("bucket_hi"), r.getAs[Long]("n"))))
      .toMap
    assert(got(0L) == ((0.0, 10.0, 3L)))  // -5 clamps in; 0.0 and 9.9 fall in
    assert(got(1L) == ((10.0, 20.0, 1L))) // 10.0 is the second bucket's lo edge
    assert(got(5L) == ((50.0, 60.0, 1L)))
    assert(got(9L) == ((90.0, 100.0, 3L))) // 99.9 plus clamped 100.0 and 250.0
    assert(got.values.map(_._3).sum == 8L) // total: every row lands somewhere
  }

  test("chunkDocuments rejects a stride larger than the window") {
    val spark2 = spark
    import spark2.implicits._
    intercept[IllegalArgumentException] {
      PipelineOps.chunkDocuments(Seq((1L, "x")).toDF("doc_id", "text"), window = 8, stride = 9)
    }
  }

  test("compactionPlan sizes each partition key to ceil(bytes/target), min 1") {
    val spark2 = spark
    import spark2.implicits._
    // group a: 10 rows x 100 bytes = 1000 -> 4 files at target 256
    // group b: 3 rows x 10 bytes = 30 -> 1 file (floor at 1)
    val df = ((0 until 10).map(i => (i.toLong, "a", 100L)) ++
      (10 until 13).map(i => (i.toLong, "b", 10L))).toDF("id", "grp", "sz")
    val plan = PipelineOps.compactionPlan(df, Seq("grp"), col("sz"), 256L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(plan("a") == ((10L, 1000L, 4L)))
    assert(plan("b") == ((3L, 30L, 1L)))
  }

  test("compactTo round-trips rows and bounds per-group file counts by the plan") {
    val spark2 = spark
    import spark2.implicits._
    val df = (0 until 400).map(i => (i.toLong, if (i % 4 == 0) "a" else "b", 64L))
      .toDF("id", "grp", "sz")
    val out = PipelineOps.compactTo(df, Seq("grp"), "id", col("sz"), 1024L, numShuffle = 32)
    // rows survive untouched (same ids, same columns)
    assert(out.columns.toSet == Set("id", "grp", "sz"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == (0L until 400L))
    // written partitionBy(grp), each dir holds at most target_files files
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    out.write.partitionBy("grp").mode("overwrite").parquet(dir.toString)
    val plan = PipelineOps.compactionPlan(df, Seq("grp"), col("sz"), 1024L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    for ((g, target) <- plan) {
      val files = new java.io.File(s"$dir/grp=$g")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files >= 1 && files <= target,
        s"group $g wrote $files files, target $target")
    }
    // determinism: the shard assignment is a pure hash, so a second run
    // produces an identical row->partition layout
    val again = PipelineOps.compactTo(df, Seq("grp"), "id", col("sz"), 1024L, numShuffle = 32)
    val layout = (d: DataFrame) => d.rdd.mapPartitionsWithIndex { (p, it) =>
      it.map(r => (r.getAs[Long]("id"), p))
    }.collect().toMap
    assert(layout(out) == layout(again))
  }

  test("zOrderKey matches a bit-by-bit reference interleave") {
    val spark2 = spark
    import spark2.implicits._
    def ref(x: Long, y: Long): Long = {
      var k = 0L
      for (i <- 0 until 16) {
        k |= ((x >> i) & 1L) << (2 * i)
        k |= ((y >> i) & 1L) << (2 * i + 1)
      }
      k
    }
    val rng = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (0xFFFFL, 0xFFFFL), (1L, 0L), (0L, 1L), (0xFFFFL, 0L)) ++
      Seq.fill(100)((rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), PipelineOps.zOrderKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts)
      assert(got((x, y)) == ref(x, y), s"($x,$y)")
  }

  test("zOrderKey sort beats a single-column sort on cross-dimension locality") {
    val spark2 = spark
    import spark2.implicits._
    // 4096 points on a 64x64 grid; chunk each layout into 16 "files" and
    // measure the summed per-file Y-SPAN — what a min/max-pruned scan
    // filtering on y consults. An x-sorted layout gives every file the
    // full y range (no file skipped for any y); the z-order layout bounds
    // each file to a 16-row y band, so a point filter on y prunes 3/4 of
    // the files.
    val pts = (0 until 4096).map(i => (i.toLong % 64, i.toLong / 64)).toDF("x", "y")
    def ySpan(sorted: DataFrame): Long =
      sorted.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("ord", "x", "y")))
        .withColumn("file", ((col("rn") - 1) / 256).cast("int"))
        .groupBy("file")
        .agg((max("y") - min("y") + 1).as("span"))
        .agg(sum("span")).head().getLong(0)
    val zSpan = ySpan(pts.withColumn("ord", PipelineOps.zOrderKey(col("x"), col("y"))))
    val xSpan = ySpan(pts.withColumn("ord", col("x")))
    assert(xSpan == 16L * 64)                    // every file spans all of y
    assert(zSpan <= xSpan / 4, s"z=$zSpan x=$xSpan") // 16-row bands (16*16)
  }
}
