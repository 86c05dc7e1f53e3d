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
  * table, which is VOCABULARY-sized, and the pair counts are
  * maintained INCREMENTALLY — the vocabulary-wide pair explode runs
  * once at bootstrap; each round reads its argmax off the maintained
  * (pair, cnt) table (1-row driver collect — the codebook pattern:
  * the chosen pair is trainer state, like k-means centroids), deltas
  * the table from only the words containing the merged pair, and
  * fuses row-locally. At a production merge count (30k+) this is the
  * difference between 30k cheap delta rounds and 30k full-vocabulary
  * recounts. Both tables checkpoint on their own
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
    * symbol i = substring(word, i, 1). Guarded for the empty word:
    * Spark's `sequence(1, 0)` counts DOWN ([1, 0] → ["", ""]) where
    * DuckDB's `range(1, 1)` is empty — the same descending-sequence
    * trap as Shingles — and the native [[graft.functions.BpeSegment]]
    * yields [] for "", so without the guard the pinned native ≡ fold
    * parity would not be total (empty tokens are reachable from any
    * doubled/leading space under a keep-empties split).
    */
  private def charsOf(w: Column): Column =
    when(length(w) === 0, typedLit(Seq.empty[String]))
      .otherwise(transform(sequence(lit(1), length(w)),
        i => w.substr(i, lit(1))))

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

  /** Adjacent symbol pairs of a symbol-array column, space-joined.
    * Slice lengths clamp at 0: an empty symbol list (the empty word
    * under the [[charsOf]] guard) would otherwise pass length −1,
    * which Spark's `slice` rejects at runtime.
    */
  private def pairsOf(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
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

  /** Trains `merges` rounds with INCREMENTAL pair-count maintenance —
    * the form that survives a production merge count (30k+): the
    * corpus-wide pair explode runs exactly ONCE (bootstrap); between
    * rounds only words CONTAINING the merged pair can change, so the
    * (pair, cnt) table is maintained by delta — subtract the affected
    * words' old pairs, add their post-fusion pairs — instead of
    * re-exploding the full vocabulary every round (the naive loop's
    * cost, kept as [[trainNaive]] and pinned merge-for-merge
    * equivalent by BpeTrainerSpec). Per round: a 1-row argmax off the
    * maintained pair table (TakeOrdered over a checkpointed frame),
    * ONE projection pass over the words table (affected rows fuse and
    * carry their pre-fusion pairs; untouched rows pass through with a
    * null), and a delta explode over ONLY the affected rows of the new
    * frame. Both the words table and the pair table ride their own
    * [[graft.operators.LineageCheckpoint]] rotation; the delta reads
    * the NEW words frame, so no cross-rotation liveness is needed.
    * Counts are exact integers, so delta ≡ re-explode bit for bit and
    * the (cnt DESC, pair ASC) argmax picks identical merges.
    *
    * Stopping rules (real tokenizers stop on frequency floors or a
    * vocabulary budget, not fixed round counts):
    *   - `minPairCount`: stop BEFORE learning a merge whose best pair
    *     occurs fewer than this many times (weighted); default 1 keeps
    *     the historical stop-only-on-exhaustion behavior, since an
    *     existing pair always counts ≥ 1.
    *   - `targetVocabSize`: cap total vocabulary at base symbols +
    *     learned merges (one new symbol per merge — the standard
    *     accounting; a collision between two merge paths producing the
    *     same string is possible in principle and would overcount by
    *     one, as in reference BPE trainers). Fails loudly when the
    *     target does not exceed the base symbol count — a budget under
    *     which NO merge could ever be learned is a configuration
    *     error, not an empty result.
    */
  def train(docs: DataFrame, textCol: String, merges: Int,
      checkpointDir: Option[String] = None,
      minPairCount: Long = 1L,
      targetVocabSize: Option[Int] = None): DataFrame = {
    require(merges >= 1, s"need at least one merge round, got $merges")
    require(minPairCount >= 1L,
      s"minPairCount must be >= 1, got $minPairCount")
    val spark = docs.sparkSession
    val ckptW = new graft.operators.LineageCheckpoint(spark, checkpointDir)
    val ckptP = new graft.operators.LineageCheckpoint(spark, checkpointDir)
    var words = ckptW(docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("w"), col("wc"), charsOf(col("w")).as("syms")))
    // Bootstrap: the ONLY corpus-vocabulary-wide pair explode.
    var pairCounts = ckptP(words
      .select(col("wc"), explode(pairsOf(col("syms"))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("cnt")))
    val budget = targetVocabSize match {
      case Some(v) =>
        val base = words.select(explode(col("syms")).as("s"))
          .agg(countDistinct(col("s"))).head().getLong(0)
        require(v > base,
          s"targetVocabSize $v does not exceed the $base base symbols — " +
            "no merge could ever be learned under this budget")
        math.min(merges.toLong, v - base).toInt
      case None => merges
    }
    val learned = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 0
    var stopped = false
    while (r < budget && !stopped) {
      val top = pairCounts
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(1) < minPairCount) stopped = true
      else {
        val pair = top.head.getString(0)
        val cnt = top.head.getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        learned += ((r + 1L, a, b, a + b, cnt))
        // ONE pass over the words table per round: affected rows fuse
        // and keep their PRE-fusion pair list in `oldp` (null on
        // untouched rows, so they cost nothing downstream); the delta
        // then reads entirely off the NEW checkpointed frame — the
        // interpreted fusion fold runs once per affected word, never
        // twice, and the old words frame is not needed after this.
        val hasPair = array_contains(pairsOf(col("syms")), lit(pair))
        words = ckptW(words.select(col("w"), col("wc"),
          when(hasPair, fusePair(col("syms"), a, b))
            .otherwise(col("syms")).as("syms"),
          when(hasPair, pairsOf(col("syms"))).as("oldp")))
        val delta = words.filter(col("oldp").isNotNull)
          .select(explode(concat(
            transform(col("oldp"),
              p => struct(p.as("pair"), (-col("wc")).as("cnt"))),
            transform(pairsOf(col("syms")),
              p => struct(p.as("pair"), col("wc").as("cnt"))))).as("pd"))
          .select(col("pd.pair").as("pair"), col("pd.cnt").as("cnt"))
        // A pair netting to 0 drops (the re-explode would not emit it).
        pairCounts = ckptP(pairCounts.unionByName(delta)
          .groupBy(col("pair")).agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0))
        words = words.select(col("w"), col("wc"), col("syms"))
        r += 1
      }
    }
    import spark.implicits._
    learned.result()
      .toDF("round", "left", "right", "merged", "pair_count")
  }

  /** The naive per-round re-explode loop [[train]] replaces — one
    * corpus-vocabulary-wide pair count per round. Kept as the
    * reference implementation BpeTrainerSpec pins the incremental
    * delta loop against, merge for merge (rounds, pairs, and counts
    * all equal — the counts are exact integers on both paths).
    */
  private[text] def trainNaive(docs: DataFrame, textCol: String,
      merges: Int, checkpointDir: Option[String] = None): DataFrame = {
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
