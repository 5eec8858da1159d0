package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session-model cache contract the bench leak sweep depends on:
  * the memoized models' factor RDDs are persisted session state, published
  * through [[Queries.pinnedRddIds]] so a harness sweeping
  * `sc.getPersistentRDDs` between queries exempts them (sweeping them
  * forced later ALS queries to recompute factors from lineage — measured
  * als_item_neighbors 21→56 s at ×10 — and localCheckpointed factors
  * cannot recompute at all).
  */
class SessionCacheSpec extends AnyFunSuite with SparkFixture {

  private val sfDir = "/root/testdata/sf0.001"

  test("pinnedRddIds covers the memoized model's persisted factor RDDs") {
    Queries.clearModels()
    val m = Queries.model(spark, sfDir)
    val pinned = Queries.pinnedRddIds
    assert(m.backingRdds.nonEmpty)
    assert(m.backingRdds.map(_.id).toSet.subsetOf(pinned))
    // and they are genuinely persisted right now — the sweep would have
    // seen them without the exemption
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(m.backingRdds.map(_.id).forall(persisted.contains))
  }

  test("a leak sweep honoring pinnedRddIds leaves the model servable") {
    val m = Queries.model(spark, sfDir)
    val before = m.userFactors.count()
    val pinned = Queries.pinnedRddIds
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !pinned.contains(id) }
      .valuesIterator.foreach(_.unpersist(blocking = true))
    // factors still served from the pinned cache, same contents
    assert(m.userFactors.count() == before)
  }

  test("clearModels releases all three caches' pins") {
    Queries.model(spark, sfDir)
    Queries.nnModel(spark, sfDir)
    assert(Queries.pinnedRddIds.nonEmpty)
    Queries.clearModels()
    assert(Queries.pinnedRddIds.isEmpty)
  }
}
