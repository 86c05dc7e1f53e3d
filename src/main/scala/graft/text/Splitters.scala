package graft.text

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A markdown section produced by [[Splitters.markdownHeaderSplit]]:
  * the section body plus the enclosing-header metadata (`Header1`..`HeaderK`).
  */
case class MdSection(content: String, headers: Map[String, String])

/** The reference's two text splitters (SURVEY.md §2.3), re-implemented as
  * pure functions so they can run as `Dataset.flatMap` on executors and be
  * pinned by golden/property tests.
  *
  *   - [[recursiveCharSplit]] — `RecursiveCharacterTextSplitter(2048, 256)`
  *     (reference: kfp/redhat-product-documentation-ingestor/
  *     ingestion-pipeline.py:225–231). Re-implements the public LangChain
  *     algorithm: recursive separator descent + greedy merge with overlap.
  *   - [[markdownHeaderSplit]] — `MarkdownHeaderTextSplitter` with
  *     `strip_headers=True` (reference: ingestion-pipeline.py:204–223;
  *     4-level variant website-ingestion-pipeline.py:146–154).
  *   - [[fixedWindowChunkCol]] — the declarative fixed-stride chunker: a
  *     pure column projection (substring windows), zero UDF, zero shuffle.
  *     This is the 100-TB scale path when exact LangChain merge semantics
  *     are not required: it stays inside whole-stage codegen and the scan.
  *
  * None of this shuffles: splitting is row-local (1 row → N rows), so at
  * cluster scale the operators run map-side at input-partition parallelism.
  */
object Splitters {

  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  /** Recursive character split: descend the separator list until pieces fit
    * `chunkSize`, then greedily merge adjacent pieces back up to
    * `chunkSize` with `chunkOverlap` characters of trailing context
    * carried into the next chunk. Chunks are whitespace-stripped; empty
    * chunks are dropped.
    */
  def recursiveCharSplit(
      text: String,
      chunkSize: Int = 2048,
      chunkOverlap: Int = 256,
      separators: List[String] = DefaultSeparators): List[String] = {
    require(chunkOverlap < chunkSize, "overlap must be < chunk size")
    if (text.isEmpty) Nil else splitRec(text, separators, chunkSize, chunkOverlap)
  }

  private def splitRec(text: String, separators: List[String],
      chunkSize: Int, overlap: Int): List[String] = {
    // First separator present in the text wins; "" always matches (split
    // into single characters). If none match, the last separator is used
    // with no further descent.
    val idx = separators.indexWhere(s => s == "" || text.contains(s))
    val (sep, rest) =
      if (idx < 0) (separators.lastOption.getOrElse(""), Nil)
      else (separators(idx),
        if (separators(idx) == "") Nil else separators.drop(idx + 1))

    val splits: List[String] =
      if (sep == "") text.map(_.toString).toList
      else text.split(java.util.regex.Pattern.quote(sep), -1).toList.filter(_.nonEmpty)

    val out = ListBuffer[String]()
    val good = ListBuffer[String]()
    for (s <- splits) {
      if (s.length < chunkSize) good += s
      else {
        if (good.nonEmpty) {
          out ++= mergeSplits(good.toList, sep, chunkSize, overlap)
          good.clear()
        }
        if (rest.isEmpty) out += s
        else out ++= splitRec(s, rest, chunkSize, overlap)
      }
    }
    if (good.nonEmpty) out ++= mergeSplits(good.toList, sep, chunkSize, overlap)
    out.toList
  }

  /** Greedy merge of small pieces into ≤chunkSize chunks, retaining up to
    * `overlap` trailing characters as the start of the next chunk.
    */
  private def mergeSplits(splits: List[String], separator: String,
      chunkSize: Int, overlap: Int): List[String] = {
    val sepLen = separator.length
    val docs = ListBuffer[String]()
    val current = ListBuffer[String]()
    var total = 0
    def joined: Option[String] = {
      val t = current.mkString(separator).strip()
      if (t.isEmpty) None else Some(t)
    }
    for (d <- splits) {
      val len = d.length
      if (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize) {
        if (current.nonEmpty) {
          joined.foreach(docs += _)
          // Drop leading pieces until within overlap AND the next piece fits.
          while (total > overlap ||
              (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize
                && total > 0)) {
            total -= current.head.length + (if (current.length > 1) sepLen else 0)
            current.remove(0)
          }
        }
      }
      current += d
      total += len + (if (current.length > 1) sepLen else 0)
    }
    joined.foreach(docs += _)
    docs.toList
  }

  /** 3-level header set (RHPD variant, ingestion-pipeline.py:205–212). */
  val Headers3: Seq[(String, String)] =
    Seq("#" -> "Header1", "##" -> "Header2", "###" -> "Header3")
  /** 4-level header set (WEB variant, website-ingestion-pipeline.py:147–152). */
  val Headers4: Seq[(String, String)] =
    Seq("#" -> "Header1", "##" -> "Header2", "###" -> "Header3", "####" -> "Header4")

  /** Split markdown into sections on the given headers. Each section
    * carries the metadata of all enclosing headers; entering a header at
    * level L pops headers of level >= L (sibling/child reset). Fenced code
    * blocks (``` / ~~~) are opaque: header-like lines inside them are
    * content. Adjacent blocks with identical metadata merge with "  \n"
    * (markdown hard line break). `stripHeaders` removes the header line
    * itself from the content.
    */
  def markdownHeaderSplit(
      text: String,
      headersToSplitOn: Seq[(String, String)] = Headers3,
      stripHeaders: Boolean = true): List[MdSection] = {
    // Longest separator first so "##" isn't matched by "#".
    val hs = headersToSplitOn.sortBy(-_._1.length)
    final case class H(level: Int, name: String)

    val flushed = ListBuffer[(String, Map[String, String])]()
    val content = ListBuffer[String]()
    var stack = List.empty[H]
    var meta = Map.empty[String, String] // metadata of the open headers
    var lineMeta = Map.empty[String, String] // metadata current content carries
    var inCode = false
    var fence = ""

    def flush(): Unit = {
      if (content.nonEmpty) {
        flushed += ((content.mkString("\n"), lineMeta))
        content.clear()
      }
    }

    for (line <- text.split("\n", -1)) {
      val sl = line.strip()
      if (!inCode) {
        // An opening fence is a line that starts a block; a line containing
        // a matched pair (```x```) is inline code, not a fence.
        if (sl.startsWith("```") && countOcc(sl, "```") == 1) {
          inCode = true; fence = "```"
        } else if (sl.startsWith("~~~")) {
          inCode = true; fence = "~~~"
        }
      } else if (sl.startsWith(fence)) {
        inCode = false; fence = ""
      }
      if (inCode) {
        content += sl
      } else {
        hs.find { case (sep, _) =>
          sl.startsWith(sep) &&
            (sl.length == sep.length || sl.charAt(sep.length) == ' ')
        } match {
          case Some((sep, name)) =>
            val level = sep.count(_ == '#')
            while (stack.nonEmpty && stack.head.level >= level) {
              meta -= stack.head.name
              stack = stack.tail
            }
            stack = H(level, name) :: stack
            meta += (name -> sl.drop(sep.length).strip())
            flush()
            if (!stripHeaders) content += sl
          case None =>
            if (sl.nonEmpty) content += sl
            else flush() // blank line closes the current block
        }
        lineMeta = meta
      }
    }
    flush()

    // Merge adjacent blocks with identical metadata ("  \n" = markdown
    // hard break), so paragraphs of one section stay one chunk.
    val agg = ListBuffer[(StringBuilder, Map[String, String])]()
    for ((c, m) <- flushed) {
      if (agg.nonEmpty && agg.last._2 == m) agg.last._1.append("  \n").append(c)
      else agg += ((new StringBuilder(c), m))
    }
    agg.map { case (c, m) => MdSection(c.toString, m) }.toList
  }

  private def countOcc(s: String, sub: String): Int = {
    var n = 0
    var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }

  /** Declarative fixed-stride chunker: array of substring windows starting
    * at 1, 1+stride, 1+2*stride, … while the start is within the text.
    * Pure projection — stays in whole-stage codegen, no UDF, no shuffle.
    * Pair with `posexplode` for (chunk_idx, chunk) rows.
    */
  def fixedWindowChunkCol(text: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0)
    // Empty text → empty array (zero chunk rows after posexplode, matching
    // the DuckDB `range` oracle). Without the guard, sequence(0, -1) counts
    // DOWN, emitting a spurious index -1 that substr reads from the end.
    when(length(text) > 0,
      transform(
        sequence(lit(0), floor((length(text) - 1) / stride).cast("int")),
        i => text.substr(i * stride + 1, lit(size))))
      .otherwise(typedLit(Seq.empty[String]))
  }
}
