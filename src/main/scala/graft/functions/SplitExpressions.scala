package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Splitters

/** The recursive character splitter (T2, SURVEY.md §2.3) as a Catalyst
  * Generator — the UDTF form: one input row yields (chunk_idx, chunk)
  * rows, usable from SQL as `LATERAL VIEW split_recursive(text, n, o)`
  * and from the Column API via [[text.splitRecursive]] + explode
  * machinery. Row-local (1→N): Spark plans a GenerateExec inside the
  * scan stage, no shuffle.
  *
  * chunkSize/chunkOverlap must be foldable (they parameterize the
  * operator, they are not per-row data).
  */
case class RecursiveSplit(
    child: Expression,
    chunkSize: Int,
    chunkOverlap: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(chunkOverlap >= 0 && chunkOverlap < chunkSize,
    "need 0 <= overlap < chunkSize")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema)
  override def position: Boolean = false
  override def inline: Boolean = false
  override def dataType: DataType = collectionType

  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"split_recursive needs a string input, got ${child.dataType}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else Splitters
      .recursiveCharSplit(v.asInstanceOf[UTF8String].toString,
        chunkSize, chunkOverlap)
      .zipWithIndex
      .map { case (c, i) =>
        InternalRow(i.toLong, UTF8String.fromString(c))
      }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
