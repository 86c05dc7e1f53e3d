package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{TextFunctions => TF}

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * merge-rule learning loop every LLM pipeline runs before a single
  * training step: start from characters, repeatedly find the most
  * frequent adjacent symbol pair (weighted by word frequency) and fuse
  * it into a new symbol; the ordered merge list IS the tokenizer.
  * d31 ranks one round of candidates; this learns the sequence.
  *
  * Scale shape — the part that matters at 100 TB: the CORPUS is
  * touched exactly once, by the word-count aggregate (d18's shape).
  * The merge loop then runs entirely over the (word, count, symbols)
  * table, which is VOCABULARY-sized — each round is one pair-explode +
  * weighted count over that table, a 1-row driver argmax (the
  * codebook-collect pattern: the chosen pair is trainer state, like
  * k-means centroids), and one row-local fold that fuses the pair
  * inside every word. Rounds checkpoint on the
  * [[graft.operators.LineageCheckpoint]] rotation so the plan never
  * unrolls.
  *
  * Merge semantics (standard BPE): greedy left-to-right within each
  * word; a symbol produced by a merge does not re-participate in the
  * SAME round ("aaa" under (a,a) → ["aa","a"]). The fold carries a
  * one-symbol lookbehind, so it is a linear pass — and the oracle
  * (d73) replays it as a per-word recursive index walk, which d73's
  * hash equality proves identical.
  *
  * Ties break (count DESC, pair ASC) — deterministic across engines
  * and layouts; pair keys are the two symbols space-joined, which is
  * unambiguous because symbols never contain a space (characters of
  * space-split tokens, concatenated without separator as they fuse).
  *
  * Returns one row per learned merge: (round 1-based, left, right,
  * merged, pair_count) — fewer than `merges` rows if the vocabulary
  * runs out of adjacent pairs first.
  */
object BpeTrainer {

  /** Character split spelled identically in the oracle:
    * symbol i = substring(word, i, 1).
    */
  private def charsOf(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** One greedy left-to-right fusion pass of (a, b) → a+b over a
    * symbol-array column.
    */
  private[text] def fusePair(syms: Column, a: String, b: String): Column = {
    val merged = a + b
    val zero = struct(
      typedLit(Seq.empty[String]).as("out"),
      lit(null).cast("string").as("pend"))
    aggregate(syms, zero, (st, x) => {
      val out = st.getField("out")
      val pend = st.getField("pend")
      val isMerge = pend === lit(a) && (x === lit(b))
      struct(
        when(isMerge, concat(out, array(lit(merged))))
          .otherwise(when(pend.isNull, out)
            .otherwise(concat(out, array(pend)))).as("out"),
        when(isMerge, lit(null).cast("string")).otherwise(x).as("pend"))
    }, st =>
      when(st.getField("pend").isNull, st.getField("out"))
        .otherwise(concat(st.getField("out"),
          array(st.getField("pend")))))
  }

  /** Adjacent symbol pairs of a symbol-array column, space-joined. */
  private def pairsOf(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1),
      (x, y) => concat(x, lit(" "), y))

  /** The tokenizer's APPLY phase: segment one word column under an
    * ordered merge list — characters, then each learned fusion in
    * training order (BPE's apply rule). With the merges inlined
    * driver-side (they are the trained artifact, like a broadcast
    * codebook), encoding any corpus is a row-local scan projection —
    * no join, no shuffle, and the d14 token-count heuristics are
    * replaced by the ACTUAL tokenizer's counts. Delegates to the
    * native codegen'd [[graft.functions.BpeSegment]] — the chained
    * declarative fold this replaces paid one interpreted lambda per
    * merge per word (~10× at 3 merges; unusable at a production merge
    * count). Semantics are identical (BpeTrainerSpec pins native ≡
    * fold), and train()'s per-round [[fusePair]] stays declarative:
    * it runs over the vocabulary-sized table, where interpretation is
    * free and the oracle replays it.
    */
  def segmentWord(w: Column, merges: Seq[(String, String)]): Column =
    graft.functions.text.bpeSegment(w, merges)

  /** The declarative fold form of [[segmentWord]] — the reference
    * the native expression is pinned against.
    */
  private[text] def segmentWordFold(w: Column,
      merges: Seq[(String, String)]): Column =
    merges.foldLeft(charsOf(w)) { case (s, (a, b)) => fusePair(s, a, b) }

  /** Persist a trained merge table (the q27/Bloom stored-state
    * pattern): the tokenizer is trained once, stored, and every later
    * job [[readMerges]] the ordered list instead of re-running the
    * loop — train nightly, encode everywhere.
    */
  def writeMerges(merges: DataFrame, path: String): Unit =
    merges.coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Load a [[writeMerges]]-stored table as the ordered (left, right)
    * list [[segmentWord]] consumes; fails loudly on a gap in the round
    * sequence (a partially-written or mixed-run table must never
    * silently segment with half a tokenizer).
    */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(path)
      .select(col("round"), col("left"), col("right"))
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    rows.zipWithIndex.foreach { case ((round, _, _), i) =>
      require(round == i + 1L,
        s"merge table at $path has round $round at position ${i + 1} — " +
          "not a contiguous training sequence")
    }
    rows.map { case (_, a, b) => (a, b) }.toSeq
  }

  def train(docs: DataFrame, textCol: String, merges: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(merges >= 1, s"need at least one merge round, got $merges")
    val spark = docs.sparkSession
    val ckpt = new graft.operators.LineageCheckpoint(spark, checkpointDir)
    var words = ckpt(docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("w"), col("wc"), charsOf(col("w")).as("syms")))
    val learned = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      val top = words
        .select(col("wc"), explode(pairsOf(col("syms"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top.head.getString(0)
        val cnt = top.head.getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        learned += ((r + 1L, a, b, a + b, cnt))
        words = ckpt(words.select(col("w"), col("wc"),
          fusePair(col("syms"), a, b).as("syms")))
        r += 1
      }
    }
    import spark.implicits._
    learned.result()
      .toDF("round", "left", "right", "merged", "pair_count")
  }
}
