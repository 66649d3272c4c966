package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking as a native Catalyst Generator: one input
  * document row fans out to its chunk rows directly inside the
  * Generate operator — no UDF serialization boundary, no intermediate
  * Seq[case class] allocation per row on the encoder path.
  *
  * Compression is deliberately NOT part of the generator: consumers
  * that only need boundaries/identities (chunk, stats, restore) never
  * pay a compression pass — column pruning can't reach inside a
  * Generator, so the opt-in lives at the operator level via the
  * [[CompressedLen]] scalar expression over the unique chunks only.
  *
  * (Generators run interpreted via CodegenFallback — like many
  * built-in generators — but the per-document chunk loop itself is
  * the compiled [[Chunker]] kernel, so the fallback only costs one
  * virtual call per document.)
  */
case class ChunkDocument(child: Expression,
                         minSize: Int = 32, maxSize: Int = 256, maskBits: Int = 6,
                         anchor: String = "buzhash", emitHexSha: Boolean = false)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("offset", IntegerType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("chunk_sha", StringType, nullable = false)) ++
    // opt-in second digest (SHA-256 of the chunk's uppercase-hex
    // encoding): the cross-engine identity for BINARY payloads, where
    // DuckDB's VARCHAR-only sha256 can't hash raw bytes. Opt-in so
    // the text dedup hot path never pays a second hash pass.
    (if (emitHexSha)
       Seq(StructField("chunk_hex_sha", StringType, nullable = false))
     else Nil))

  override def prettyName: String = "graft_chunk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if !Chunker.Anchors.contains(anchor) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unknown anchor '$anchor' (expected ${Chunker.Anchors.mkString("/")})")
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
      Chunker.chunk(bytes, minSize, maxSize, maskBits, anchor).map { c =>
        if (emitHexSha)
          InternalRow(c.chunk_idx, c.offset, c.length,
            UTF8String.fromString(c.chunk_sha),
            UTF8String.fromString(
              Chunker.hexSha256(bytes, c.offset, c.length)))
        else
          InternalRow(c.chunk_idx, c.offset, c.length,
            UTF8String.fromString(c.chunk_sha))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Compressed size of a binary column under `codec`
  * (none/deflate/gzip — the reference Compress stage's menu,
  * encoder.c:587). Codegen emits one static kernel call, so the
  * expression stays inside whole-stage codegen. */
case class CompressedLen(child: Expression, codec: String)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_compressed_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if Chunker.Codecs.contains(codec) =>
      TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: unknown codec '$codec' (expected ${Chunker.Codecs.mkString("/")})")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary column, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    Chunker.compressedLen(b, 0, b.length, codec)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Chunker.compressedLen($c, 0, $c.length, \"$codec\")")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NativeChunk {
  /** Generator column: use in select() alongside pass-through columns;
    * output columns are chunk_idx/offset/length/chunk_sha (plus
    * chunk_hex_sha when `emitHexSha` — the binary-payload cross-engine
    * digest, see [[Chunker.hexSha256]]). `anchor` picks the boundary
    * fingerprint: buzhash (default) or rabin (the reference's rabin.c
    * polynomial). */
  def chunks(text: Column, minSize: Int = 32, maxSize: Int = 256,
             maskBits: Int = 6, anchor: String = "buzhash",
             emitHexSha: Boolean = false): Column =
    ColumnBridge.column(
      ChunkDocument(ColumnBridge.expression(text), minSize, maxSize, maskBits,
        anchor, emitHexSha))

  /** Compressed byte size of a binary column under `codec`. */
  def compressedLen(bin: Column, codec: String): Column =
    ColumnBridge.column(CompressedLen(ColumnBridge.expression(bin), codec))
}
