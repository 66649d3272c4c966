package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{ChunkDocument, CompressedLen, CosineSim, DotProduct, EmdDistance, LongSetJaccard, LshBuckets, MinHashSig, NfcNormalize, SimHash64}

/** SQL-surface registration of the graft native expressions, so
  * `spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")`
  * works alongside the Column API.
  *
  * Two installation paths:
  *   - `GraftFunctions.register(spark)` on any live session;
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => DotProduct(args(0), args(1))),
    "graft_cosine" -> (args => CosineSim(args(0), args(1))),
    "graft_jaccard" -> (args => LongSetJaccard(args(0), args(1))),
    "graft_simhash" -> (args => SimHash64(args(0))),
    "graft_minhash_sig" -> (args =>
      MinHashSig(args(0), intArg(args(1), "graft_minhash_sig nPerms"))),
    "graft_chunk" -> (args =>
      if (args.length == 1) ChunkDocument(args(0))
      else ChunkDocument(args(0), intArg(args(1), "minSize"),
        intArg(args(2), "maxSize"), intArg(args(3), "maskBits"))),
    "graft_emd" -> (args => EmdDistance(args(0), args(1))),
    "graft_nfc" -> (args => NfcNormalize(args(0))),
    "graft_lsh_buckets" -> (args => LshBuckets(args(0),
      longArg(args(1), "seed"), intArg(args(2), "nTables"),
      intArg(args(3), "bits"), intArg(args(4), "dim"))),
    "graft_compressed_len" -> (args => CompressedLen(args(0), args(1) match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_compressed_len codec must be a string literal, got $other")
    })))

  /** Imperative install on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerFunction(spark, name, b)
    }
}

/** Config-based install: `--conf spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.HashExpressions", name), b))
    }
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBound)
  }
}
