package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, MinHashSlices, RecursiveSplit, Shingles}

/** Registers the engine's native expressions into the SQL function
  * registry, so `spark.sql("SELECT cosine_similarity(a, b) ...")` works
  * alongside the Column API:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`). Registration is the
  * standard `SparkSessionExtensions.injectFunction` path — the
  * expressions stay full Catalyst citizens (codegen, null-safety,
  * constant folding) in SQL exactly as in the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  /** The function catalog, shared by the extensions path and
    * [[register]].
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      // cosine_similarity(a, b): cosine of two float vectors in [-1, 1]
      info("cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity takes 2 arguments")
        CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("dot_product"),
      // dot_product(a, b): inner product of two float vectors
      info("dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product takes 2 arguments")
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("minhash_slices"),
      // minhash_slices(shingles[, nBands]): md5-sliced minhash signature
      info("minhash_slices"),
      (args: Seq[Expression]) => args match {
        case Seq(sh) => MinHashSlices(sh, 4)
        case Seq(sh, n) if n.foldable =>
          // Number.intValue, not asInstanceOf[Int]: a BIGINT literal (4L)
          // is an Int at heart only after conversion, not by cast.
          MinHashSlices(sh, n.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "minhash_slices takes (shingles[, constant nBands])")
      }),
    (FunctionIdentifier("shingles"),
      // shingles(tokens, n): word n-gram shingles (empty when too short)
      info("shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, n) if n.foldable =>
          Shingles(toks, n.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "shingles takes (tokens, constant n)")
      }),
    (FunctionIdentifier("bpe_segment"),
      // bpe_segment(word, 'a b,ab c,...'): segment a word under an
      // ordered constant merge list (pairs space-joined, comma-
      // separated — the storable form writeMerges round-trips). The
      // merges must be a constant: they are the trained tokenizer,
      // compiled into the expression like the Column API's literal
      // list — a per-row merge table would be a different (and
      // non-codegen-able) operator.
      info("bpe_segment"),
      (args: Seq[Expression]) => args match {
        case Seq(word, m) if m.foldable =>
          val spec = m.eval().toString
          val merges = if (spec.isEmpty) Seq.empty[(String, String)]
            else spec.split(",", -1).toSeq.map { p =>
              p.split(" ", 2) match {
                case Array(a, b) => (a, b)
                case _ => throw new IllegalArgumentException(
                  s"bpe_segment merge '$p' is not 'left right'")
              }
            }
          graft.functions.BpeSegment(word, merges)
        case _ => throw new IllegalArgumentException(
          "bpe_segment takes (word, constant 'a b,ab c,...' merge list)")
      }),
    (FunctionIdentifier("split_recursive"),
      // split_recursive(text, chunkSize, overlap): generator yielding
      // (chunk_idx, chunk) rows — T2 as a SQL table function
      info("split_recursive"),
      (args: Seq[Expression]) => args match {
        case Seq(text, size, overlap) if size.foldable && overlap.foldable =>
          RecursiveSplit(text,
            size.eval().asInstanceOf[Number].intValue,
            overlap.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "split_recursive takes (text, constant chunkSize, constant overlap)")
      }))

  /** Register on an already-running session (the config-based extensions
    * path only applies at session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, id, fnInfo, builder)
    }
}
