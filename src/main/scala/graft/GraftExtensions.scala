package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions._

/** SQL-surface registration for the engine's native expressions, via the
  * public `SparkSessionExtensions` hook:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * After which pure SQL can call the fused codegen'd kernels:
  *
  * {{{
  * SELECT vector_dot(a, b), cosine_sim(a, b),
  *        simhash64(hs), minhash_signature(h32, 64, 42),
  *        token_set_count(toks, array('the','a'), true)
  * }}}
  *
  * Scalar-parameter arguments (hash count, seed, dictionary, lowercase
  * flag) must be foldable literals — they configure the kernel, they are
  * not per-row inputs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def requireArgs(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  private def literalLong(name: String, e: Expression): Long = e match {
    case l: Literal => l.eval().asInstanceOf[Number].longValue()
    case other => throw new IllegalArgumentException(
      s"$name: expected a literal, got ${other.sql}")
  }

  private def literalStringSet(name: String, e: Expression): Set[String] = {
    require(e.foldable && e.dataType.isInstanceOf[ArrayType] &&
      e.dataType.asInstanceOf[ArrayType].elementType == StringType,
      s"$name: expected a foldable array<string>, got ${e.sql}")
    val arr = e.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString).toSet
  }

  private def literalBoolean(name: String, e: Expression): Boolean = e match {
    case l: Literal => l.eval().asInstanceOf[Boolean]
    case other => throw new IllegalArgumentException(
      s"$name: expected a literal boolean, got ${other.sql}")
  }

  /** (identifier, info, builder) triples — shared by the extensions hook
    * and [[register]]. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "vector_dot(a, b) - fused dot product over two float/double arrays"),
      (args: Seq[Expression]) => {
        requireArgs("vector_dot", 2, args)
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - single-pass cosine similarity"),
      (args: Seq[Expression]) => {
        requireArgs("cosine_sim", 2, args)
        CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash from array<bigint> token hashes"),
      (args: Seq[Expression]) => {
        requireArgs("simhash64", 1, args)
        SimHash64Expr(args(0))
      }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(h32, numHashes, seed) - k-slot MinHash signature from 32-bit hashes"),
      (args: Seq[Expression]) => {
        requireArgs("minhash_signature", 3, args)
        val k = literalLong("minhash_signature.numHashes", args(1)).toInt
        val seed = literalLong("minhash_signature.seed", args(2))
        val (as, bs) = graft.dedup.Dedup.mixConstants(k, seed).unzip
        MinHashSignature(args(0), as.toArray, bs.toArray)
      }),
    (FunctionIdentifier("top_k_ids"),
      info("top_k_ids",
        "top_k_ids(score, id, k) - aggregate: k best (score, id) pairs per group, best first"),
      (args: Seq[Expression]) => {
        requireArgs("top_k_ids", 3, args)
        TopKByScore(args(0), args(1),
          literalLong("top_k_ids.k", args(2)).toInt)
      }),
    (FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters",
        "heavy_hitters(key, k) - aggregate: Misra-Gries frequent-items sketch, <= k (key, lower-bound) pairs, hottest first"),
      (args: Seq[Expression]) => {
        requireArgs("heavy_hitters", 2, args)
        MisraGriesHitters(args(0),
          literalLong("heavy_hitters.k", args(1)).toInt)
      }),
    (FunctionIdentifier("token_set_count"),
      info("token_set_count",
        "token_set_count(tokens, dict, lowercase) - count of tokens present in a literal dictionary"),
      (args: Seq[Expression]) => {
        requireArgs("token_set_count", 3, args)
        TokenSetCount(args(0),
          literalStringSet("token_set_count.dict", args(1)),
          literalBoolean("token_set_count.lowercase", args(2)))
      }),
    (FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize",
        "unicode_normalize(str, form) - Unicode normalization (NFC/NFD/NFKC/NFKD), isNormalized fast path"),
      (args: Seq[Expression]) => {
        requireArgs("unicode_normalize", 2, args)
        val form = args(1) match {
          // the null guard keeps CAST(NULL AS STRING) literals on the
          // error path instead of NPE-ing on the UTF8String conversion
          case l: Literal if l.dataType == StringType && l.eval() != null =>
            l.eval().asInstanceOf[UTF8String].toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize.form: expected a literal string, got ${other.sql}")
        }
        UnicodeNormalize(args(0), form)
      }),
    // the media header parsers are Column-composed expression trees
    // (substr/conv/aggregate-fold over BinaryType), not native kernels;
    // the builder splices the same tree the DataFrame API would build
    (FunctionIdentifier("parse_image_header"),
      info("parse_image_header",
        "parse_image_header(media) - (format, width, height, bit_depth, channels) from PNG/JPEG bytes"),
      (args: Seq[Expression]) => {
        requireArgs("parse_image_header", 1, args)
        columnExpr(graft.multimodal.Multimodal.parseImageHeader(bridgeCol(args(0))))
      }),
    (FunctionIdentifier("parse_wav_header"),
      info("parse_wav_header",
        "parse_wav_header(media) - (format, channels, sample_rate, bits_per_sample, n_samples, duration_ms) from RIFF/WAVE bytes"),
      (args: Seq[Expression]) => {
        requireArgs("parse_wav_header", 1, args)
        columnExpr(graft.multimodal.Multimodal.parseWavHeader(bridgeCol(args(0))))
      }),
    (FunctionIdentifier("parse_avi_header"),
      info("parse_avi_header",
        "parse_avi_header(media) - (format, width, height, n_frames, n_streams, micro_sec_per_frame, duration_ms) from RIFF/AVI bytes"),
      (args: Seq[Expression]) => {
        requireArgs("parse_avi_header", 1, args)
        columnExpr(graft.multimodal.Multimodal.parseAviHeader(bridgeCol(args(0))))
      }),
    (FunctionIdentifier("parse_mp4_header"),
      info("parse_mp4_header",
        "parse_mp4_header(media) - (format, major_brand_hex, timescale, duration, duration_ms) from ISO-BMFF/MP4 bytes"),
      (args: Seq[Expression]) => {
        requireArgs("parse_mp4_header", 1, args)
        columnExpr(graft.multimodal.Multimodal.parseMp4Header(bridgeCol(args(0))))
      }))

  private def bridgeCol(e: Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def columnExpr(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.catalystExpression(c)

  /** Register on an already-running session (the extensions hook only
    * applies at session build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, fInfo, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, ident, fInfo, builder)
    }
}
