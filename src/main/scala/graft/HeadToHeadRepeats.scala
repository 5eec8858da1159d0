package graft

/** Order-symmetric ALS head-to-head: forks [[HeadToHead]] once PER SIDE
  * per round (graft fork, then MLlib fork, alternating), `n` rounds, and
  * reports per-row medians plus the train/transform ratios of medians.
  *
  * Why (round-10 verdict #2): the single-fork protocol ran the four rows
  * in one fixed order inside one JVM, so the ×100 transform comparison
  * (graft third, MLlib fourth) embedded a warmup asymmetry that could only
  * be argued about. Here each side's fork performs the IDENTICAL sequence
  * — session warmup → train → settle → transform — in a fresh JVM, and
  * the alternation means neither side systematically benefits from page
  * cache warmed by the other. Median-of-n matches the sf0.1 N=5 repeat
  * discipline (`bench_artifacts/headtohead_repeats_r09.json`).
  *
  * Usage: runMain graft.HeadToHeadRepeats <outFile> [rounds=3]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_H2H_XMX (default
  * 8g — raise for scale tiers).
  */
object HeadToHeadRepeats {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("/tmp/graft_h2h_repeats.json")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val xmx = sys.env.getOrElse("SPARK_GRAFT_H2H_XMX", "8g")

    // Rank tiers (round-15 verdict #2): the rank-64 solver-scratch
    // regression hid behind a rank-8-only protocol, so the artifact now
    // carries ratios at rank 8 AND rank 32 (override/extend via
    // SPARK_GRAFT_H2H_RANKS, comma-separated).
    val ranks = sys.env.getOrElse("SPARK_GRAFT_H2H_RANKS", "8,32")
      .split(',').map(_.trim.toInt).toSeq

    val samples = scala.collection.mutable.LinkedHashMap
      .empty[(Int, String), scala.collection.mutable.ArrayBuffer[Double]]
    var blas = "unavailable"

    def fork(side: String, rank: Int): Unit = {
      val (rows, b) = HeadToHead.forkAndParse(sfDir, cpus, xmx, Some(side), rank)
      rows.foreach { case (k, v) =>
        samples.getOrElseUpdate((rank, k), scala.collection.mutable.ArrayBuffer.empty)
          .append(v)
      }
      b.foreach(blas = _)
    }

    ranks.foreach { rank =>
      (0 until rounds).foreach { r =>
        println(s"[h2h-repeats] rank $rank round ${r + 1}/$rounds")
        fork("graft", rank)
        fork("mllib", rank)
      }
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val rows = Seq("als_train_graft", "als_train_mllib",
      "als_transform_graft", "als_transform_mllib")

    // Locale.ROOT: f"" uses the JVM default locale, which can render
    // 1.234 as "1,234" and corrupt the JSON artifact
    def num(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def arr(xs: Seq[Double]) = xs.map(num).mkString("[", ",", "]")

    def tierBody(rank: Int): String = {
      val med = rows.map(r => r -> median(samples((rank, r)).toSeq)).toMap
      val body = rows.map(r =>
        s""""$r":{"samples":${arr(samples((rank, r)).toSeq)},"median":${num(med(r))}}""")
        .mkString(",")
      s"""$body,"ratio_train":${num(med("als_train_graft") / med("als_train_mllib"))},""" +
        s""""ratio_transform":${num(med("als_transform_graft") / med("als_transform_mllib"))}"""
    }

    // rank-8 rows stay top-level (artifact shape compatible with r9-r15
    // readers); additional tiers nest under "rank<k>"
    val extraTiers = ranks.filter(_ != 8)
      .map(k => s""""rank$k":{${tierBody(k)}}""")
    val tiers = (if (ranks.contains(8)) Seq(tierBody(8)) else Seq.empty) ++ extraTiers
    val line = s"""{"sf_dir":"$sfDir","rounds":$rounds,"ranks":${ranks.mkString("[", ",", "]")},"protocol":"per-side fresh-JVM forks, alternating graft/mllib","""+
      tiers.mkString(",") + s""","blas":"$blas"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile), (line + "\n").getBytes("UTF-8"))
    println(line)
  }
}
