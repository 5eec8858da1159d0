package graft.als

import scala.collection.mutable.ArrayBuilder

/** One user↔item interaction. Ids are Long (the fixture tables use BIGINT
  * keys); ratings are Float. Reference row type: `Rating.py:4-18`.
  */
case class Rating(user: Long, item: Long, rating: Float)

/** Columnar struct-of-arrays tile of the rating matrix: all ratings that fall
  * in one (srcBlock, dstBlock) cell. Reference: `Rating.py:21-36`.
  */
case class RatingBlock(srcIds: Array[Long], dstIds: Array[Long], ratings: Array[Float]) {
  def size: Int = srcIds.length
}

/** Mutable builder for [[RatingBlock]]; used as the aggregation buffer in the
  * blockify shuffle. Reference: `Rating.py:39-68` (add/merge/build).
  */
final class RatingBlockBuilder extends Serializable {
  private val srcIds = ArrayBuilder.make[Long]
  private val dstIds = ArrayBuilder.make[Long]
  private val ratings = ArrayBuilder.make[Float]
  var size: Int = 0

  def add(src: Long, dst: Long, rating: Float): this.type = {
    srcIds += src
    dstIds += dst
    ratings += rating
    size += 1
    this
  }

  def merge(other: RatingBlock): this.type = {
    srcIds ++= other.srcIds
    dstIds ++= other.dstIds
    ratings ++= other.ratings
    size += other.size
    this
  }

  def build(): RatingBlock = RatingBlock(srcIds.result(), dstIds.result(), ratings.result())
}

/** In-link block before CSR compression: parallel arrays of (srcId,
  * encodedDstLocalIndex, rating). Reference: `InBlock.py:106-138` (builder)
  * and `InBlock.py:44-57` (sort).
  */
final class UncompressedInBlock(
    val srcIds: Array[Long],
    val dstEncodedIndices: Array[Int],
    val ratings: Array[Float]) {

  def length: Int = srcIds.length

  /** Sorts the three parallel arrays by srcId (in place) and run-length
    * encodes into CSR form. Reference: sort `InBlock.py:50-51`, compress
    * `InBlock.py:59-103`.
    */
  def compress(): InBlock = {
    val sz = length
    require(sz > 0, "empty in-block")
    ParallelSort.sortBySrc(srcIds, dstEncodedIndices, ratings)
    // count unique src ids
    val uniqueSrcIdsB = ArrayBuilder.make[Long]
    val countsB = ArrayBuilder.make[Int]
    var prev = srcIds(0)
    uniqueSrcIdsB += prev
    var run = 1
    var i = 1
    while (i < sz) {
      val cur = srcIds(i)
      if (cur != prev) {
        uniqueSrcIdsB += cur
        countsB += run
        run = 0
        prev = cur
      }
      run += 1
      i += 1
    }
    countsB += run
    val uniqueSrcIds = uniqueSrcIdsB.result()
    val counts = countsB.result()
    val dstPtrs = new Array[Int](uniqueSrcIds.length + 1)
    i = 0
    var acc = 0
    while (i < counts.length) {
      acc += counts(i)
      dstPtrs(i + 1) = acc
      i += 1
    }
    require(acc == sz, s"CSR prefix-sum mismatch: $acc != $sz")
    InBlock(uniqueSrcIds, dstPtrs, dstEncodedIndices, ratings)
  }
}

/** Builds an [[UncompressedInBlock]] from the per-tile pieces routed to one
  * src block, encoding each (dstBlockId, dstLocalIndex) into one Int.
  * Reference: `InBlock.py:106-138`.
  */
final class UncompressedInBlockBuilder(encoder: LocalIndexEncoder) {
  private val srcIds = ArrayBuilder.make[Long]
  private val dstEncodedIndices = ArrayBuilder.make[Int]
  private val ratings = ArrayBuilder.make[Float]

  def add(
      dstBlockId: Int,
      tileSrcIds: Array[Long],
      tileDstLocalIndices: Array[Int],
      tileRatings: Array[Float]): this.type = {
    val sz = tileSrcIds.length
    require(tileDstLocalIndices.length == sz && tileRatings.length == sz)
    srcIds ++= tileSrcIds
    var i = 0
    while (i < sz) {
      dstEncodedIndices += encoder.encode(dstBlockId, tileDstLocalIndices(i))
      i += 1
    }
    ratings ++= tileRatings
    this
  }

  def build(): UncompressedInBlock =
    new UncompressedInBlock(srcIds.result(), dstEncodedIndices.result(), ratings.result())
}

/** Exact-size variant of [[UncompressedInBlockBuilder]]: the total entry
  * count is known up front (from a per-block count pre-pass), so the three
  * parallel arrays are allocated ONCE at final size and tiles are copied in
  * at a cursor — no growth doubling, no `result()` copy. Peak task heap for
  * the in-block build drops from ~3-4× the final block size (tiles
  * materialized by `groupByKey` + doubling builders + result copy) to ~1×
  * plus one in-flight tile, which is what lets the ×1000 fit run one build
  * per core instead of one per 4 cores (SCALING §12.7 wall 2). The built
  * [[UncompressedInBlock]] shares these arrays (zero-copy), and
  * `compress()` sorts them in place and reuses two of the three in the CSR
  * [[InBlock]], so 16 B/rating is also the steady-state footprint.
  *
  * Strictly better than the reference here: `InBlock.py:106-138` grows
  * Python lists and materializes the whole uncompressed block a second
  * time on build.
  */
final class ExactUncompressedInBlockBuilder(encoder: LocalIndexEncoder, n: Int) {
  require(n > 0, "empty in-block")
  private val srcIds = new Array[Long](n)
  private val dstEncodedIndices = new Array[Int](n)
  private val ratings = new Array[Float](n)
  private var cursor = 0

  def add(
      dstBlockId: Int,
      tileSrcIds: Array[Long],
      tileDstLocalIndices: Array[Int],
      tileRatings: Array[Float]): this.type = {
    val sz = tileSrcIds.length
    require(tileDstLocalIndices.length == sz && tileRatings.length == sz)
    require(cursor + sz <= n,
      s"in-block overflow: counted $n entries, got at least ${cursor + sz} " +
        "(count pre-pass out of sync with tile stream)")
    System.arraycopy(tileSrcIds, 0, srcIds, cursor, sz)
    System.arraycopy(tileRatings, 0, ratings, cursor, sz)
    var i = 0
    while (i < sz) {
      dstEncodedIndices(cursor + i) = encoder.encode(dstBlockId, tileDstLocalIndices(i))
      i += 1
    }
    cursor += sz
    this
  }

  def build(): UncompressedInBlock = {
    require(cursor == n,
      s"in-block underflow: counted $n entries, received $cursor " +
        "(count pre-pass out of sync with tile stream)")
    new UncompressedInBlock(srcIds, dstEncodedIndices, ratings)
  }
}

/** Sparse out-link routing table for one src block: for each dst block that
  * this block's rows are actually rated in (`dstBlockIds`, strictly
  * ascending), the local row indices referenced there (each ascending,
  * deduplicated per row). Reference: `ALS.py:331-361` builds the dense
  * per-dst-block form; the dense `Array[Array[Int]]` indexed by dstBlockId
  * (what this replaced, and what the reference and MLlib both use) allocates
  * one slot per GRID COLUMN per task — fine at 10×10, fatal at the ~10⁵-10⁶
  * blocks/side a 100 TB deployment prices out (SCALING §13.7 wall 5).
  * Sparse also means the factor-shuffle flatMap emits zero messages for
  * (src, dst) pairs with no ratings instead of shipping empty arrays.
  */
case class OutBlock(dstBlockIds: Array[Int], activeIndices: Array[Array[Int]]) {
  require(dstBlockIds.length == activeIndices.length)
}

/** CSR-compressed in-link block: all ratings received by one block, grouped
  * by (unique, sorted) src id. `dstPtrs` is the row-pointer array:
  * the ratings of `srcIds(i)` live at `[dstPtrs(i), dstPtrs(i+1))`.
  * Reference: `InBlock.py:9-30`.
  */
case class InBlock(
    srcIds: Array[Long],
    dstPtrs: Array[Int],
    dstEncodedIndices: Array[Int],
    ratings: Array[Float]) {
  require(dstPtrs.length == srcIds.length + 1)
  require(dstEncodedIndices.length == ratings.length)
  def size: Int = ratings.length
}

/** In-place sort of three parallel primitive arrays by the first (srcId) —
  * boxing-free replacement for the reference's TimSort over triples
  * (`InBlock.py:50-51`). Plain 3-way quicksort with insertion-sort leaves.
  */
object ParallelSort {

  def sortBySrc(keys: Array[Long], vals1: Array[Int], vals2: Array[Float]): Unit =
    qsort(keys, vals1, vals2, 0, keys.length - 1)

  @inline private def swap(keys: Array[Long], v1: Array[Int], v2: Array[Float], i: Int, j: Int): Unit = {
    val k = keys(i); keys(i) = keys(j); keys(j) = k
    val a = v1(i); v1(i) = v1(j); v1(j) = a
    val b = v2(i); v2(i) = v2(j); v2(j) = b
  }

  private def qsort(keys: Array[Long], v1: Array[Int], v2: Array[Float], lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      if (hi - lo < 32) {
        // insertion sort
        var i = lo + 1
        while (i <= hi) {
          val k = keys(i); val a = v1(i); val b = v2(i)
          var j = i - 1
          while (j >= lo && keys(j) > k) {
            keys(j + 1) = keys(j); v1(j + 1) = v1(j); v2(j + 1) = v2(j)
            j -= 1
          }
          keys(j + 1) = k; v1(j + 1) = a; v2(j + 1) = b
          i += 1
        }
        return
      }
      // median-of-three pivot
      val mid = lo + (hi - lo) / 2
      if (keys(mid) < keys(lo)) swap(keys, v1, v2, mid, lo)
      if (keys(hi) < keys(lo)) swap(keys, v1, v2, hi, lo)
      if (keys(hi) < keys(mid)) swap(keys, v1, v2, hi, mid)
      val pivot = keys(mid)
      // 3-way partition (Dutch national flag)
      var lt = lo
      var gt = hi
      var i = lo
      while (i <= gt) {
        if (keys(i) < pivot) { swap(keys, v1, v2, i, lt); lt += 1; i += 1 }
        else if (keys(i) > pivot) { swap(keys, v1, v2, i, gt); gt -= 1 }
        else i += 1
      }
      // recurse into smaller side, loop on larger (bounded stack depth)
      if (lt - lo < hi - gt) {
        qsort(keys, v1, v2, lo, lt - 1)
        lo = gt + 1
      } else {
        qsort(keys, v1, v2, gt + 1, hi)
        hi = lt - 1
      }
    }
  }
}
