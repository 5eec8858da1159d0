package graft

/** THROWAWAY probe (test scope): prices wall 6 — the driver-side
  * per-block rating-count structure `makeBlocks` collects and broadcasts
  * (SCALING §13.8). Measures, via Spark's own SizeEstimator, the boxed
  * `Map[Int, Long]` that `collectAsMap()` used to return vs the primitive
  * `Array[Long]` the kernel now fills, at the §13.7 100 TB grid
  * (~4M blocks/side) and at the tested grids. No Spark session needed.
  *
  * Run: sbt "Test/runMain graft.BlockCountFootprintProbe [blocksPerSide]"
  */
object BlockCountFootprintProbe {
  def main(args: Array[String]): Unit = {
    val grids = if (args.nonEmpty) args.map(_.toInt).toSeq
    else Seq(152, 1 << 16, 1 << 20, 4 << 20)
    println("blocks/side | boxed collectAsMap bytes (B/entry) | Array[Long] bytes (B/slot)")
    grids.foreach { n =>
      // what collectAsMap actually builds: mutable.HashMap[Int, Long]
      val boxed = scala.collection.mutable.HashMap.empty[Int, Long]
      var i = 0
      while (i < n) { boxed.put(i, 1000L + i); i += 1 }
      val prim = new Array[Long](n)
      i = 0
      while (i < n) { prim(i) = 1000L + i; i += 1 }
      val bBytes = org.apache.spark.util.SizeEstimator.estimate(boxed)
      val pBytes = org.apache.spark.util.SizeEstimator.estimate(prim)
      println(f"$n%11d | $bBytes%14d (${bBytes.toDouble / n}%6.1f) | $pBytes%12d (${pBytes.toDouble / n}%4.1f)")
    }
  }
}
