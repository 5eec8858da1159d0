package graft.als

import graft.SparkFixture
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-serving parity: the blocked cosine top-k kernel behind
  * `itemNeighbors` must agree with the exact crossJoin+window baseline
  * (`Similarity.bruteForceTopK`) — same neighbors, same order, same scores
  * (up to float-normalization rounding).
  */
class GraftALSServingSpec extends AnyFunSuite with SparkFixture {

  private def syntheticFactors(n: Int, dim: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      // one all-zero vector exercises the zero-norm (cosine = 0) path
      val f =
        if (i == 7) Array.fill(dim)(0f)
        else Array.fill(dim)(rng.nextFloat() * 2f - 1f)
      FactorRow(i.toLong, f)
    }
    spark.createDataFrame(rows)
  }

  test("blocked itemNeighbors matches bruteForceTopK (neighbors, ranks, cosines)") {
    val dim = 6
    val factors = syntheticFactors(n = 120, dim = dim, seed = 5L)
    val model = GraftALSModel(rank = dim, userFactors = factors, itemFactors = factors)

    val blocked = model.itemNeighbors(3, blockSize = 32)
      .select(col("item_id"), col("rank"), col("neighbor_item_id"), col("cosine"))
    val brute = Similarity.bruteForceTopK(factors, factors, k = 3,
      idCol = "id", vecCol = "features")
      .select(col("query_id").as("item_id"), col("rank"),
        col("neighbor_id").as("b_neighbor"), col("cosine").as("b_cosine"))

    val joined = blocked.join(brute, Seq("item_id", "rank"), "full").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(4),
        s"row present on only one side: $r")
      val (nbr, cos) = (r.getLong(2), r.getDouble(3))
      val (bNbr, bCos) = (r.getLong(4), r.getDouble(5))
      // identical neighbor, or a genuine cosine tie broken differently by
      // float-normalization rounding (normalize-then-dot vs dot-over-norms)
      assert(nbr == bNbr || math.abs(cos - bCos) < 1e-6,
        s"item ${r.getLong(0)} rank ${r.getInt(1)}: $nbr(cos=$cos) vs $bNbr(cos=$bCos)")
      if (nbr == bNbr)
        assert(math.abs(cos - bCos) < 1e-5,
          s"cosine drift for item ${r.getLong(0)}: $cos vs $bCos")
    }
    // every item with a non-self match gets exactly k=3 rows on both sides
    assert(blocked.count() == brute.count())
  }

  test("IVF-routed itemNeighborsApprox reaches >=0.8 recall@10 vs the exact kernel") {
    val dim = 8
    val factors = syntheticFactors(n = 400, dim = dim, seed = 11L)
      .where(col("id") =!= 7) // keep the zero vector out of a recall metric
    val model = GraftALSModel(rank = dim, userFactors = factors, itemFactors = factors)
    val k = 10
    def truth = model.itemNeighbors(k, blockSize = 64)
    def approx = model.itemNeighborsApprox(k, nProbe = 6, numCells = 16)
    val exactSet = truth.select("item_id", "neighbor_item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approxPairs = approx.select("item_id", "neighbor_item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hit = approxPairs.count(exactSet.contains)
    val recall = hit.toDouble / exactSet.size
    assert(recall >= 0.8, s"recall@$k=$recall (${hit}/${exactSet.size})")
    // sub-quadratic candidate generation: every emitted rank is within k
    assert(approx.agg(max("rank")).head().getInt(0) <= k)
  }

  test("MIPS-routed recommendForAllUsersApprox reaches >=0.8 recall@10 vs exact") {
    val dim = 8
    // distinct seeds: users and items are different entity spaces; keep the
    // zero vector on the item side so the augmented norm path sees it
    val users = syntheticFactors(n = 150, dim = dim, seed = 21L)
    val items = syntheticFactors(n = 300, dim = dim, seed = 22L)
    val model = GraftALSModel(rank = dim, userFactors = users, itemFactors = items)
    val k = 10
    val exactSet = model.recommendForAllUsers(k, blockSize = 64)
      .select("user_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = model.recommendForAllUsersApprox(k, nProbe = 6, numCells = 16)
    val approxPairs = approx.select("user_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val recall = approxPairs.count(exactSet.contains).toDouble / exactSet.size
    assert(recall >= 0.8, s"recall@$k=$recall")
    // scores must be true dot products, not cosines: spot-check one row
    val row = approx.orderBy("user_id", "rank").head()
    val uf = users.where(col("id") === row.getLong(0)).head().getSeq[Float](1)
    val vf = items.where(col("id") === row.getLong(1)).head().getSeq[Float](1)
    val expected = uf.zip(vf).map { case (a, b) => a.toDouble * b }.sum
    assert(math.abs(row.getDouble(3) - expected) < 1e-6)
  }

  test("sharded approx serve: union over shards equals the full serve row-for-row") {
    val dim = 8
    val users = syntheticFactors(n = 150, dim = dim, seed = 21L)
    val items = syntheticFactors(n = 300, dim = dim, seed = 22L)
    val model = GraftALSModel(rank = dim, userFactors = users, itemFactors = items)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val full = rows(model.recommendForAllUsersApprox(5, nProbe = 6, numCells = 16))
    val shards = (0 until 4).map(sh => rows(
      model.recommendForAllUsersApprox(5, nProbe = 6, numCells = 16,
        userShard = Some((sh, 4)))))
    // shards are disjoint (deterministic id partition) and their union is
    // EXACTLY the full serve — per-user results are independent of which
    // other users share the job, so N shard jobs replace one full job
    assert(shards.map(_.size).sum == full.size)
    assert(shards.reduce(_ ++ _) == full)
  }

  test("sharded item-neighbors serve: union over shards equals the full serve row-for-row") {
    val dim = 8
    val items = syntheticFactors(n = 300, dim = dim, seed = 23L)
    val model = GraftALSModel(rank = dim, userFactors = items, itemFactors = items)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val full = rows(model.itemNeighborsApprox(5, nProbe = 6, numCells = 16))
    val shards = (0 until 4).map(sh => rows(
      model.itemNeighborsApprox(5, nProbe = 6, numCells = 16,
        itemShard = Some((sh, 4)))))
    // the corpus, assignment and codebook are shard-invariant; only the
    // query side is partitioned, so the shard union IS the full serve
    assert(shards.map(_.size).sum == full.size)
    assert(shards.reduce(_ ++ _) == full)
  }

  test("serving CellIndex footprint is measurable and unpersist frees the storage") {
    val dim = 6
    val factors = syntheticFactors(n = 300, dim = dim, seed = 23L)
    val model = GraftALSModel(rank = dim, userFactors = factors, itemFactors = factors)
    val sc = spark.sparkContext
    // build + materialize both serving spaces (cosine and MIPS)
    model.servingItemCellIndex().materialize()
    model.servingMipsCellIndex().materialize()
    val ids = model.servingIndexRddIds
    assert(ids.size == 2)
    ids.foreach(id => assert(sc.getPersistentRDDs.contains(id),
      s"serving index RDD $id not registered as persistent"))
    // the memory contract: the measured footprint is visible and at least
    // the raw data size n*(8 id + 4*d matrix + 8 norm) for the cosine space
    val bytes = model.servingIndexBytes
    assert(bytes >= 300L * (8 + 4 * dim + 8),
      s"servingIndexBytes $bytes below the raw-data floor")
    // unpersist must actually free the executor storage, not just drop refs
    model.unpersist()
    ids.foreach(id => assert(!sc.getPersistentRDDs.contains(id),
      s"serving index RDD $id still persistent after model.unpersist()"))
    assert(model.servingIndexBytes == 0L)
  }

  test("auto IVF sizing scales cells as sqrt(n) and respects explicit overrides") {
    val dim = 4
    val factors = syntheticFactors(n = 300, dim = dim, seed = 31L)
    val model = GraftALSModel(rank = dim, userFactors = factors, itemFactors = factors)
    // auto path must produce full k rows per query (no stranded queries)
    // and stay deterministic across invocations
    val a = model.itemNeighborsApprox(3).collect()
    val b = model.itemNeighborsApprox(3).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // 299 non-zero vectors + the zero vector (cosine 0 to everything) all
    // emit exactly k rows
    assert(a.length == 300 * 3, s"got ${a.length}")
    // explicit override still honored (16 cells -> same result shape)
    val c = model.itemNeighborsApprox(3, nProbe = 6, numCells = 16)
    assert(c.count() == 300 * 3)
  }

  test("foldInUsers reproduces trained user factors from the training ratings") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic low-rank-ish ratings: 40 users x 25 items, ~60% density
    val rng = new scala.util.Random(11L)
    val ratings = (for {
      u <- 0 until 40; i <- 0 until 25
      if rng.nextDouble() < 0.6
    } yield (u.toLong, i.toLong, (1.0 + 4.0 * rng.nextDouble()).toFloat))
      .toDF("user", "item", "rating")
    val reg = 0.1
    val model = GraftALS(
      rank = 4, maxIter = 4, regParam = reg,
      numUserBlocks = 2, numItemBlocks = 2,
      userCol = "user", itemCol = "item", ratingCol = "rating", seed = 3L)
      .fit(ratings)
    // explicit training ends on the user half-step, so one fold-in pass
    // over the same ratings against the final item factors must land on
    // the trained user factors (up to accumulation-order float noise)
    val trained = model.userFactors.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    val folded = model.foldInUsers(ratings, regParam = reg).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    assert(folded.keySet == trained.keySet)
    folded.foreach { case (u, f) =>
      val t = trained(u)
      assert(f.length == t.length)
      f.zip(t).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-4 * (1.0 + math.abs(b)),
          s"user $u: folded ${f.toSeq} vs trained ${t.toSeq}")
      }
    }
    // a genuinely NEW user folds in from their ratings alone and scores
    val newUser = Seq((999L, 0L, 5.0f), (999L, 1L, 4.5f), (999L, 2L, 1.0f))
      .toDF("user", "item", "rating")
    val nf = model.foldInUsers(newUser, regParam = reg).collect()
    assert(nf.length == 1 && nf.head.getLong(0) == 999L)
    val feat = nf.head.getAs[scala.collection.Seq[Float]](1)
    assert(feat.length == 4 && feat.exists(_ != 0f))
    // ratings on items unknown to the model carry no signal at all
    val unknownOnly = Seq((1000L, 9999L, 5.0f)).toDF("user", "item", "rating")
    assert(model.foldInUsers(unknownOnly, regParam = reg).isEmpty)
  }

  test("foldInItems solves exact regularized least squares given user factors") {
    val spark2 = spark
    import spark2.implicits._
    // hand-built model: 3 users with KNOWN factors, rank 2
    val uf = spark.createDataFrame(Seq(
      FactorRow(0L, Array(1.0f, 0.0f)),
      FactorRow(1L, Array(0.0f, 1.0f)),
      FactorRow(2L, Array(1.0f, 1.0f))))
    val itf = spark.createDataFrame(Seq(FactorRow(100L, Array(0.5f, 0.5f))))
    val model = GraftALSModel(rank = 2, userFactors = uf, itemFactors = itf)
    // one new item rated by all three users
    val ratings = Seq((0L, 7L, 4.0f), (1L, 7L, 2.0f), (2L, 7L, 5.0f))
      .toDF("user", "item", "rating")
    val reg = 0.1
    val got = model.foldInItems(ratings, regParam = reg).collect()
    assert(got.length == 1 && got.head.getLong(0) == 7L)
    val f = got.head.getAs[scala.collection.Seq[Float]](1).toArray
    // local oracle: solve (AtA + lambda*n*I) x = Atb for A = user factors
    // AtA = [[2,1],[1,2]], Atb = [4+5, 2+5] = [9, 7], n = 3, lambda*n = 0.3
    val (a11, a12, a22) = (2.0 + 0.3, 1.0, 2.0 + 0.3)
    val (b1, b2) = (9.0, 7.0)
    val det = a11 * a22 - a12 * a12
    val x1 = (b1 * a22 - b2 * a12) / det
    val x2 = (b2 * a11 - b1 * a12) / det
    assert(math.abs(f(0) - x1) < 1e-5, s"got ${f.toSeq}, want ($x1, $x2)")
    assert(math.abs(f(1) - x2) < 1e-5, s"got ${f.toSeq}, want ($x1, $x2)")
  }

  test("foldInUsersImplicit reproduces trained implicit user factors") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new scala.util.Random(23L)
    // implicit interactions: positive counts with ~70% sparsity
    val ratings = (for {
      u <- 0 until 30; i <- 0 until 20
      if rng.nextDouble() < 0.3
    } yield (u.toLong, i.toLong, (1 + rng.nextInt(5)).toFloat))
      .toDF("user", "item", "rating")
    val (reg, alpha) = (0.05, 2.0)
    val model = GraftALS(
      rank = 4, maxIter = 4, regParam = reg,
      implicitPrefs = true, alpha = alpha,
      numUserBlocks = 2, numItemBlocks = 2,
      userCol = "user", itemCol = "item", ratingCol = "rating", seed = 9L)
      .fit(ratings)
    val trained = model.userFactors.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    val folded = model.foldInUsersImplicit(ratings, regParam = reg, alpha = alpha)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    assert(folded.keySet == trained.keySet)
    folded.foreach { case (u, f) =>
      f.zip(trained(u)).foreach { case (x, t) =>
        assert(math.abs(x - t) <= 1e-4 * (1.0 + math.abs(t)),
          s"user $u: folded ${f.toSeq} vs trained ${trained(u).toSeq}")
      }
    }
  }

  test("withCompactIds transform is bit-identical to the LONG-key path") {
    val spark2 = spark
    import spark2.implicits._
    val dim = 4
    val users = syntheticFactors(n = 40, dim = dim, seed = 31L)
    val items = syntheticFactors(n = 25, dim = dim, seed = 32L)
    val model = GraftALSModel(rank = dim, userFactors = users, itemFactors = items,
      userCol = "user", itemCol = "item")
    // scoring input includes unseen ids AND a long id whose Int wrap
    // (2^32 + 3 -> 3) collides with a REAL user — the compact path's
    // range guard must treat it as a cold-start miss, not user 3
    val wrapId = (1L << 32) + 3L
    val scoreIn = (Seq((wrapId, 5L), (999L, 3L)) ++
      (for (u <- 0L until 40L; i <- 0L until 25L if (u + i) % 3 == 0) yield (u, i)))
      .toDF("user", "item")
    val compact = model.withCompactIds()
    assert(compact.intKeyTransform, "all ids fit Int, so compaction must engage")
    def rows(m: GraftALSModel) = m.transform(scoreIn).collect()
      .map(r => (r.getLong(0), r.getLong(1), {
        val p = r.getFloat(2); if (p.isNaN) "NaN" else p.toString
      })).toSet
    assert(rows(compact) == rows(model))
    // and the wrap id specifically scored NaN (no factor row), not user 3's dot
    val wrapRow = compact.transform(scoreIn)
      .where(col("user") === wrapId).select("prediction").head()
    assert(wrapRow.getFloat(0).isNaN, "wrapped Long id must be a cold-start miss")
    // ids beyond Int range leave the model un-compacted
    val bigUsers = users.withColumn("id", col("id") + (Long.MaxValue / 2))
    val m2 = GraftALSModel(rank = dim, userFactors = bigUsers, itemFactors = items)
      .withCompactIds()
    assert(!m2.intKeyTransform)
  }

  test("fit auto-selects the INT-key path for Int-range ids, keeps LONG otherwise") {
    val spark2 = spark
    import spark2.implicits._
    val ratings = (for (u <- 0L until 12L; i <- 0L until 8L if (u + i) % 3 != 0)
      yield (u, i, ((u * 7 + i * 3) % 5 + 1).toFloat))
      .toDF("user", "item", "rating")
    val als = GraftALS(rank = 3, maxIter = 2, regParam = 0.1,
      numUserBlocks = 2, numItemBlocks = 2,
      userCol = "user", itemCol = "item", ratingCol = "rating", seed = 5L)
    val m = als.fit(ratings)
    assert(m.intKeyTransform,
      "fit must auto-engage the INT-key transform for Int-range ids")
    // predictions are bit-identical to the forced-LONG path
    def rows(mm: GraftALSModel) = mm.transform(ratings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getFloat(3))).toSet
    assert(rows(m) == rows(m.copy(intKeyTransform = false)))
    // a genuinely 64-bit id space keeps the LONG path, and still scores
    val big = ratings
      .withColumn("user", col("user") + lit(Long.MaxValue / 2))
    val mBig = als.fit(big)
    assert(!mBig.intKeyTransform,
      "fit must keep the LONG path when any id exceeds Int range")
    assert(mBig.transform(big).where(!isnan(col("prediction"))).count() > 0)
    m.unpersist(); mBig.unpersist()
  }
}
