package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking as a native Catalyst Generator: one input
  * document row fans out to its chunk rows directly inside the
  * Generate operator — no UDF serialization boundary, no intermediate
  * Seq[case class] allocation per row on the encoder path.
  *
  * (Generators run interpreted via CodegenFallback — like many
  * built-in generators — but the per-document chunk loop itself is
  * the compiled [[Chunker]] kernel, so the fallback only costs one
  * virtual call per document.)
  */
case class ChunkDocument(child: Expression,
                         minSize: Int = 32, maxSize: Int = 256, maskBits: Int = 6)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("offset", IntegerType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("chunk_sha", StringType, nullable = false),
    StructField("comp_len", IntegerType, nullable = false)))

  override def prettyName: String = "graft_chunk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string or binary column, got ${dt.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val bytes = v match {
        case s: UTF8String => s.getBytes
        case b: Array[Byte] => b
      }
      Chunker.chunk(bytes, minSize, maxSize, maskBits).map { c =>
        InternalRow(c.chunk_idx, c.offset, c.length,
          UTF8String.fromString(c.chunk_sha), c.comp_len)
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NativeChunk {
  /** Generator column: use in select() alongside pass-through columns;
    * output columns are chunk_idx/offset/length/chunk_sha/comp_len. */
  def chunks(text: Column, minSize: Int = 32, maxSize: Int = 256,
             maskBits: Int = 6): Column =
    ColumnBridge.column(
      ChunkDocument(ColumnBridge.expression(text), minSize, maxSize, maskBits))
}
