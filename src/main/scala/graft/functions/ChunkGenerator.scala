package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table-generating function (UDTF) for sliding-window
  * document chunking: one input row of space-separated text expands to
  * `(chunk_id, chunk_tokens, chunk_text)` rows of `window`-word chunks
  * advancing by `stride` — the generator twin of
  * [[graft.ops.PipelineOps.chunkDocuments]].
  *
  * Why a Generator when the HOF form exists: the
  * `transform(sequence(...), i -> slice(...))` shape materializes EVERY
  * chunk of a document into one array value before `Generate` explodes
  * it — with window/stride overlap that transient value is
  * `window/stride ×` the document itself (2× at the 32/16 default, 32×
  * at stride 1), which is exactly the kind of per-row allocation spike
  * that kills executors on a long-tailed 100 TB corpus. This generator
  * streams chunks lazily from one tokenization: peak memory is one
  * document plus one chunk, independent of document length ÷ stride.
  *
  * Registered as the SQL function `graft_chunks(text, window, stride)`
  * by [[graft.plans.GraftExtensions]] — completing the extension-surface
  * trio next to the scalar kernel (`graft_dot`) and the bounded top-k
  * UDAF: the three registration surfaces SURVEY.md §2.11 records as
  * absent from the reference.
  *
  * Semantics (identical to `chunkDocuments`, parity-checked in
  * `ChunkGeneratorSpec`): every document emits at least one chunk, short
  * documents emit themselves, the last window clamps at the document
  * end; NULL text emits no rows (the relational convention for
  * generators over NULL input).
  */
case class ChunkGenerator(text: Expression, window: Expression, stride: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, window, stride)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkGenerator =
    copy(text = newChildren(0), window = newChildren(1), stride = newChildren(2))

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("chunk_tokens", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_chunks expects STRING text, got ${text.dataType}")
    if (!Seq(window, stride).forall(e => e.dataType == IntegerType && e.foldable))
      return TypeCheckResult.TypeCheckFailure(
        "graft_chunks expects literal INT window and stride")
    val (w, s) = (evalInt(window), evalInt(stride))
    if (s <= 0 || w < s)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_chunks needs 0 < stride <= window, got window=$w stride=$s")
    TypeCheckResult.TypeCheckSuccess
  }

  private def evalInt(e: Expression): Int =
    e.eval(InternalRow.empty).asInstanceOf[Int]

  private lazy val w = evalInt(window)
  private lazy val s = evalInt(stride)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length
    val nWindows = math.ceil(math.max(n - w, 0).toDouble / s).toInt + 1
    (0 until nWindows).iterator.map { i =>
      val from = i * s
      val until = math.min(from + w, n)
      InternalRow(
        i,
        until - from,
        UTF8String.fromString(words.slice(from, until).mkString(" ")))
    }
  }
}
