package graft.als

import org.apache.spark.{ShuffleDependency, SparkContext}
import org.apache.spark.rdd.RDD

import scala.collection.mutable

/** Iteration-scoped shuffle cleanup for the ALS training loop (SCALING
  * §12.11 wall 4, operationalized: wall 3's scratch high-water).
  *
  * A checkpoint cut makes every older factor-routing shuffle UNREACHABLE,
  * but Spark only deletes a shuffle's files when its [[ShuffleDependency]]
  * is garbage-collected on the driver and the ContextCleaner notices — a
  * timing lottery that the ×1000 probes lost three times out of four
  * (ENOSPC mid-train with `periodicGC.interval=1min` already set,
  * `bench_artifacts/als_x1000_wall5_r17.json`). The ledger replaces the
  * lottery with proof: `train` registers each half-step's result, and at
  * every checkpoint cut (after the cut has MATERIALIZED, so lineages are
  * truncated) sweeps the tracked ids, deleting exactly those no longer
  * reachable from any RDD the fit will ever touch again.
  *
  * Safety argument: an id is reaped only if it is (a) absent from the
  * full lineage closure of every live root — the current factor
  * generations, the four persisted block structures, and anything the
  * caller lists — and (b) not in the `protectedIds` set captured from the
  * block structures at construction (belt and suspenders for (a): the
  * blockify/in-block shuffles are always reachable from the in-block
  * roots anyway). Any future job — including a lost-executor recompute of
  * a persisted-but-evicted partition — follows exactly those lineages, so
  * no reaped shuffle can ever be re-read. Reaping is therefore inert to
  * results by construction; [[ShuffleReapSpec]] additionally pins factor
  * bit-identity with the reap on vs off.
  *
  * Driver-side cost: O(lineage nodes) per sweep — dozens of RDDs, a few
  * sweeps per fit.
  */
private[graft] final class ShuffleLedger(sc: SparkContext, protectedRoots: Seq[RDD[_]]) {

  private val protectedIds: Set[Int] =
    ShuffleLedger.reachableShuffleIds(protectedRoots)

  private val tracked = mutable.LinkedHashSet.empty[Int]

  /** Total shuffles reaped over this ledger's lifetime (observability). */
  private[graft] var reaped: Int = 0

  /** Ids reaped by cut-time sweeps (spec observability: asserting on
    * concrete ids keeps the checks immune to shuffles other
    * concurrently-running suites create in the shared test SparkContext).
    * Sweep-reaped shuffles sit behind a checkpoint truncation, so they are
    * never re-registered; eager reaps (see [[reapedEagerIds]]) can be.
    */
  private[graft] val reapedIds = mutable.ArrayBuffer.empty[Int]

  /** Ids reaped eagerly via [[reapNow]] (the blockify tile exchange).
    * Their dependency stays in the live in-block lineage, so Spark's
    * stage bookkeeping may re-REGISTER them (empty, no files) at later
    * job submissions — specs assert their files are gone, not their
    * registration.
    */
  private[graft] val reapedEagerIds = mutable.ArrayBuffer.empty[Int]

  /** Registers every shuffle reachable from `rdd`'s lineage as a cleanup
    * candidate. Over-collection is fine: protected and still-reachable ids
    * survive every sweep.
    */
  def track(rdd: RDD[_]): Unit =
    tracked ++= ShuffleLedger.reachableShuffleIds(Seq(rdd)).diff(protectedIds)

  /** Eagerly deletes `ids`, recording them in the reap ledger. Unlike
    * [[sweep]] this takes the caller's own deadness proof instead of a
    * reachability walk — used for the blockify tile exchange, which is
    * provably consumed once both block sides' in/out-blocks and count
    * pre-passes have materialized (the ids are scoped to the exchange
    * partitionRatings itself introduced, never the caller's upstream
    * shuffles). Blocking for the same reason sweep is: the freed bytes
    * must be gone before the iteration phase starts writing.
    */
  def reapNow(ids: Set[Int]): Int = {
    if (ids.nonEmpty) {
      org.apache.spark.GraftSparkInternals.reapShuffles(sc, ids, blocking = true)
      tracked --= ids
      reaped += ids.size
      reapedEagerIds ++= ids
    }
    ids.size
  }

  /** Deletes (via the context cleaner's own removal routine) every tracked
    * shuffle that is unreachable from all `liveRoots`, returning how many
    * were reaped. Call only at points where retired lineage is actually
    * truncated (after a checkpoint has materialized) — elsewhere it is a
    * safe no-op because everything is still reachable.
    */
  def sweep(liveRoots: Seq[RDD[_]]): Int = {
    if (tracked.isEmpty) return 0
    val live = ShuffleLedger.reachableShuffleIds(liveRoots)
    val dead = tracked.toArray.filterNot(live)
    if (dead.nonEmpty) {
      // blocking: the sweep runs at a checkpoint cut, immediately before
      // the next half-step starts WRITING its own O(ratings) shuffle — an
      // async reap can lag behind that write and raise the scratch
      // high-water by a full retired generation (measured in the r18
      // ×1000 series). Deletion is local-disk unlink work; the driver
      // pause is milliseconds against a multi-second half-step.
      org.apache.spark.GraftSparkInternals.reapShuffles(sc, dead, blocking = true)
      tracked --= dead
      reaped += dead.length
      reapedIds ++= dead
    }
    dead.length
  }
}

private[graft] object ShuffleLedger {

  /** Shuffle ids in the full lineage closure of `roots`. Deliberately does
    * NOT stop at persisted RDDs — a persisted partition can be evicted or
    * lost and recomputed through its lineage, so for liveness the whole
    * chain counts. Checkpointed RDDs truncate themselves: after
    * materialization their dependencies are replaced by the checkpoint
    * file scan, so the walk ends there naturally.
    */
  def reachableShuffleIds(roots: Seq[RDD[_]]): Set[Int] = {
    val visited = mutable.HashSet.empty[Int] // RDD ids
    val ids = mutable.HashSet.empty[Int]
    val stack = mutable.Stack[RDD[_]](roots: _*)
    while (stack.nonEmpty) {
      val rdd = stack.pop()
      if (visited.add(rdd.id)) {
        rdd.dependencies.foreach { dep =>
          dep match {
            case s: ShuffleDependency[_, _, _] => ids += s.shuffleId
            case _ => ()
          }
          stack.push(dep.rdd)
        }
      }
    }
    ids.toSet
  }
}
