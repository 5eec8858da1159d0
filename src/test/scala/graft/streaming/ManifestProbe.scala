package graft.streaming

/** THROWAWAY probe (test scope, like TransformProbe): quantifies the
  * manifest write-amplification boundary the round-13 verdict #4 asked
  * for — per-commit metadata cost of the OLD full-snapshot-rewrite design
  * vs the round-14 append-log design, at 10³-10⁶ buckets.
  *
  * Methodology: `old per-commit cost` is a real [[EventsStream.writeManifest]]
  * call (tmp + fsync + atomic rename — byte-identical to what every commit
  * paid before the log landed). `new per-commit cost` is a 64-bucket log
  * append with the exact record bytes and `Files.write(CREATE, APPEND)`
  * options `refreshManifest` uses (the real path also re-derives 64 live
  * sets from bucket dirs, identical in both designs, so it cancels out of
  * the comparison). `read` is the real [[EventsStream.readManifest]] over
  * snapshot + a worst-case log (threshold-full: max(64, N) records, the
  * most a reader ever scans before a fold clears it).
  *
  * Run: `sbt "Test/runMain graft.streaming.ManifestProbe"`; one JSON line
  * per bucket count on stdout.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_manifest_probe").toString
    def medianOf(n: Int)(body: => Unit): Double = {
      val runs = (0 until n).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e6
      }.sorted
      runs(n / 2)
    }
    // synthetic live map: one base + one delta per bucket (the steady-state
    // shape), realistic generation dir names
    def entriesOf(n: Int): Map[Int, Seq[String]] =
      (0 until n).map(b => b -> Seq(
        s"base-${b % 97}",
        s"delta-${b % 97 + 1}-b${b % 13}-0123456789abcdef0123456789abcdef")).toMap

    val results = Seq(1024, 10_000, 100_000, 1_000_000).map { n =>
      val dir = s"$root/idx_$n"
      new java.io.File(dir).mkdirs()
      val entries = entriesOf(n)
      // OLD design: every commit pays this
      val snapshotMs = medianOf(5)(EventsStream.writeManifest(dir, 1L, entries))
      val snapshotBytes = new java.io.File(dir, "_manifest").length()
      // NEW design: every commit pays this (64 touched buckets, the
      // trickle-to-moderate batch shape; a batch touching ALL buckets
      // appends O(n) once, still <= one old-design rewrite)
      val logF = new java.io.File(dir, "_manifest.log")
      val record64 = (0 until 64).map { b =>
        s"1 $b/${entries(b).mkString(",")}"
      }.mkString("", "\n", "\n").getBytes("UTF-8")
      val appendMs = medianOf(5)(
        java.nio.file.Files.write(logF.toPath, record64,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND): Unit)
      // worst-case read: snapshot + a threshold-full log (fold boundary)
      logF.delete(): Unit
      val foldAt = math.max(64, n)
      val bigRecord = new StringBuilder
      (0 until foldAt).foreach { i =>
        val b = i % n
        bigRecord.append(s"1 $b/${entries(b).mkString(",")}\n"): Unit
      }
      java.nio.file.Files.write(logF.toPath,
        bigRecord.toString.getBytes("UTF-8")): Unit
      val readMs = medianOf(3) {
        require(EventsStream.readManifest(dir).exists(_.size == n))
      }
      val logBytes = logF.length()
      println(
        s"""{"buckets":$n,"old_commit_ms":$snapshotMs,"new_commit_ms":$appendMs,""" +
        s""""amplification":${(snapshotMs / appendMs).round},""" +
        s""""snapshot_bytes":$snapshotBytes,"worstcase_log_bytes":$logBytes,""" +
        s""""worstcase_read_ms":$readMs}""")
      (n, snapshotMs, appendMs, readMs)
    }
    EventsStream.deleteRecursively(new java.io.File(root))
    // the boundary statement the verdict asked to pin: at what bucket count
    // does the OLD design's rewrite exceed a 1s trigger budget share (10%)?
    results.find(_._2 > 100.0).foreach { case (n, ms, _, _) =>
      System.err.println(
        f"[probe] OLD design crosses 100ms/commit (10%% of a 1s trigger) at ~$n buckets ($ms%.1f ms)")
    }
  }
}
