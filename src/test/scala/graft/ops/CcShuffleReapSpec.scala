package graft.ops

import graft.SparkFixture
import org.apache.spark.GraftSparkInternals
import org.scalatest.funsuite.AnyFunSuite

/** Pins the iteration-scoped shuffle cleanup in
  * [[Dedup.connectedComponents]] (the ALS wall-3 discipline applied to the
  * engine's other unbounded iterative loop): every round's cut must DELETE
  * the retired round's shuffle files, while
  *   - the labeling stays exactly the union-find oracle's (the sweep is
  *     inert to results),
  *   - only shuffles the loop's own rounds introduced are ever reaped
  *     (the caller's pair-generation shuffles survive), and
  *   - the returned frame stays fully readable afterwards.
  *
  * Assertions are on the CONCRETE ids the loop's ledger reaped, so the
  * spec stays correct when other suites create shuffles in the shared
  * context.
  */
class CcShuffleReapSpec extends AnyFunSuite with SparkFixture {

  test("each retired round's shuffles are swept; labels and caller shuffles untouched") {
    val spark2 = spark
    import spark2.implicits._
    val sc = spark.sparkContext

    // a 40-node chain: diameter >> rounds forces several large/small-star
    // rounds; pair generation goes through its own shuffle (distinct) and
    // stays persisted across the call — the caller-protection subject
    val chain = (0L until 40L).sliding(2).map(s => (s.head, s(1))).toSeq
    val pairs = (chain ++ chain).toDF("id_a", "id_b").distinct().persist()
    assert(pairs.count() == 39)
    val callerIds = GraftSparkInternals.registeredShuffleIds(sc)

    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 40 && got.values.forall(_ == 0L),
      "every chain node must label to the min id 0")

    val ledger = Dedup.lastCcLedgerForTest
    assert(ledger != null && ledger.reaped >= 4,
      s"a multi-round resolution must sweep several retired shuffles, got ${ledger.reaped}")
    // round 0 is untracked and sweeps are lineage-scoped: nothing that was
    // registered before the loop started may ever be reaped
    assert(ledger.reapedIds.toSet.intersect(callerIds).isEmpty,
      "the loop must never reap a caller shuffle")
    // swept ids sit behind a checkpoint truncation: their files are gone
    // and nothing can re-create their stage
    ledger.reapedIds.foreach { id =>
      assert(GraftSparkInternals.shuffleFileCount(sc, id) == 0,
        s"shuffle $id files must be deleted from the local store")
    }
    assert(ledger.reapedIds.toSet
      .intersect(GraftSparkInternals.registeredShuffleIds(sc)).isEmpty,
      "swept shuffles must stay unregistered")

    // the caller's persisted frame is still live and correct after sweeps
    assert(pairs.count() == 39)
    pairs.unpersist()
  }
}
