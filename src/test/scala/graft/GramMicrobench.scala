package graft

/** THROWAWAY microbench (test scope, no Spark): decomposes the rank-64
  * head-to-head gap (SCALING §12.14) — our hand-rolled NormalEquation.add
  * vs netlib dspr (what MLlib calls per rating), and our Cholesky
  * solveInPlace vs LAPACK dppsv (per entity).
  *
  * Run: runMain graft.GramMicrobench [ranks csv] [adds] [solves]
  */
object GramMicrobench {
  def main(args: Array[String]): Unit = {
    val ranks = args.lift(0).getOrElse("8,32,64").split(",").map(_.trim.toInt)
    val nAdds = args.lift(1).map(_.toInt).getOrElse(2000000)
    val nSolves = args.lift(2).map(_.toInt).getOrElse(20000)
    val blas = dev.ludovic.netlib.blas.BLAS.getInstance()
    val lapack = dev.ludovic.netlib.lapack.LAPACK.getInstance()
    println(s"[gram-bench] blas=${blas.getClass.getSimpleName} lapack=${lapack.getClass.getSimpleName}")
    val rnd = new java.util.Random(42)

    for (k <- ranks) {
      val vecs = Array.fill(256)(Array.fill(k)(rnd.nextFloat()))
      val triK = k * (k + 1) / 2

      // warmup + timed: ours
      val ne = new graft.als.NormalEquation(k)
      def runOurs(n: Int): Double = {
        val t0 = System.nanoTime()
        var i = 0
        while (i < n) { ne.add(vecs(i & 255), 1.0); i += 1 }
        (System.nanoTime() - t0) / 1e9
      }
      runOurs(nAdds / 4); ne.reset()
      val tOurs = runOurs(nAdds)

      // netlib dspr path (MLlib's shape: float->double scratch copy + spr)
      val ata = new Array[Double](triK)
      val da = new Array[Double](k)
      def runSpr(n: Int): Double = {
        val t0 = System.nanoTime()
        var i = 0
        while (i < n) {
          val a = vecs(i & 255)
          var j = 0
          while (j < k) { da(j) = a(j).toDouble; j += 1 }
          blas.dspr("U", k, 1.0, da, 1, ata)
          i += 1
        }
        (System.nanoTime() - t0) / 1e9
      }
      runSpr(nAdds / 4); java.util.Arrays.fill(ata, 0.0)
      val tSpr = runSpr(nAdds)

      println(f"[gram-bench] rank=$k%-3d add: ours=${tOurs / nAdds * 1e9}%7.1f ns  dspr=${tSpr / nAdds * 1e9}%7.1f ns  ratio=${tOurs / tSpr}%.2f")

      // solves: ours (dense scratch + in-place cholesky) vs LAPACK dppsv
      ne.reset()
      var i = 0
      while (i < 4096) { ne.add(vecs(i & 255), rnd.nextDouble()); i += 1 }
      val solver = new graft.als.CholeskySolver
      def runSolveOurs(n: Int): Double = {
        val t0 = System.nanoTime()
        var s = 0
        while (s < n) {
          val ne2 = new graft.als.NormalEquation(k)
          System.arraycopy(ne.ata, 0, ne2.ata, 0, triK)
          System.arraycopy(ne.atb, 0, ne2.atb, 0, k)
          solver.solve(ne2, 0.1)
          s += 1
        }
        (System.nanoTime() - t0) / 1e9
      }
      runSolveOurs(nSolves / 4)
      val tSolveOurs = runSolveOurs(nSolves)

      println(f"[gram-bench] rank=$k%-3d solve (shipped CholeskySolver): ${tSolveOurs / nSolves * 1e6}%7.2f us")
    }
  }
}
