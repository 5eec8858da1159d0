package graft.als

/** Packs a (blockId, localIndex) pair into a single non-negative Int.
  *
  * Layout: `blockId << numLocalIndexBits | localIndex`, where the number of
  * bits reserved for the local index is `min(numberOfLeadingZeros(numBlocks-1), 31)`
  * — i.e. the block id gets exactly as many high bits as it needs and the
  * local index gets the rest. Behavior matched against the reference's
  * `util/encoder.py:1-24` (bit_length-based split, ≤31-bit total).
  *
  * This halves shuffle-side index memory versus a pair of ints and avoids
  * tuple boxing in the CSR arrays — at 100 TB the in-block index arrays are
  * the dominant memory consumer, so staying primitive matters.
  */
final class LocalIndexEncoder(val numBlocks: Int) extends Serializable {
  require(numBlocks > 0, s"numBlocks must be positive, got $numBlocks")

  private val numLocalIndexBits: Int =
    math.min(Integer.numberOfLeadingZeros(numBlocks - 1), 31)
  private val localIndexMask: Int = (1 << numLocalIndexBits) - 1

  def encode(blockId: Int, localIndex: Int): Int = {
    require(blockId >= 0 && blockId < numBlocks, s"blockId $blockId out of [0, $numBlocks)")
    require((localIndex & ~localIndexMask) == 0,
      s"localIndex $localIndex does not fit in $numLocalIndexBits bits")
    (blockId << numLocalIndexBits) | localIndex
  }

  @inline def blockId(encoded: Int): Int = encoded >>> numLocalIndexBits

  @inline def localIndex(encoded: Int): Int = encoded & localIndexMask
}
