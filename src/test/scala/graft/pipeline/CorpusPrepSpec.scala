package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}

class CorpusPrepSpec extends AnyFunSuite {
  import TestSession.{sf, spark}
  import spark.implicits._

  test("prepare on synthetic rows: filter, dedup, stamp, split") {
    val base = "spark table scan query join filter agg window sort merge"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact dup → dropped
      (3L, base + " tail"), // near dup of 1 → dropped at 0.8
      (4L, "tiny doc"), // < 5 tokens → dropped
      (5L, "the the the the the the the the the a"), // all stopwords → dropped
      (6L, "a completely different corpus document with many fresh words inside"))
      .toDF("doc_id", "text")
    val out = CorpusPrep.prepare(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 6L))
    out.foreach { r =>
      assert(Set("train", "val", "test").contains(r.getAs[String]("split")))
      assert(r.getAs[String]("detected_lang").nonEmpty)
    }
  }

  test("exactDupGroups collapses transitive chains the greedy policy keeps") {
    // 1 ~ 5 and 3 ~ 5 (5 is the concatenation of both), but 1 !~ 3:
    // the duplicate component is {1, 3, 5} with no direct (1, 3) pair.
    // Greedy dooms only ids with a SMALLER direct partner — {5} — so it
    // keeps {1, 3}; connected components keeps only the component
    // minimum {1}.
    val w1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val w3 = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    val docs = Seq(
      (1L, w1),
      (3L, w3),
      (5L, w1 + " " + w3),
      (7L, "an unrelated document with entirely separate vocabulary throughout"))
      .toDF("doc_id", "text")
    val cfgBase = CorpusPrep.Config(nearDupJaccard = 0.3)

    // Precondition: the LSH candidates actually contain both chain links.
    val pairs = graft.text.Dedup
      .nearDupPairs(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)) && pairs.contains((3L, 5L)) &&
      !pairs.contains((1L, 3L)), s"fixture bands broke: $pairs")

    val greedy = CorpusPrep.prepare(docs, "doc_id", "text", cfgBase)
      .collect().map(_.getLong(0)).sorted.toSeq
    val exact = CorpusPrep.prepare(docs, "doc_id", "text",
      cfgBase.copy(exactDupGroups = true))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(greedy == Seq(1L, 3L, 7L))
    assert(exact == Seq(1L, 7L))
  }

  test("semantic stage drops embedding-near docs the text gates keep") {
    // docs 10 and 11 share no vocabulary (Jaccard 0, no LSH candidate)
    // but carry near-identical embeddings — a paraphrase/translation
    // stand-in only the semantic pass can see. doc 12 is far in both.
    def vec(axis: Int, eps: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f; v(7) = eps; v
    }
    val docs = Seq(
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel", vec(0, 0f)),
      (11L, "uno dos tres cuatro cinco seis siete ocho", vec(0, 0.01f)),
      (12L, "mike november oscar papa quebec romeo sierra tango", vec(4, 0f)))
      .toDF("doc_id", "text", "emb")
    val cfg = CorpusPrep.Config(semanticVecCol = Some("emb"),
      semanticK = 2, semanticIters = 2, semanticThreshold = 0.97)
    val without = CorpusPrep.prepare(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    val withSem = CorpusPrep.prepare(docs, "doc_id", "text", cfg)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(without == Seq(10L, 11L, 12L), s"text gates must keep all: $without")
    assert(withSem == Seq(10L, 12L),
      s"semantic stage must drop the embedding-twin 11: $withSem")
    // a corpus far smaller than semanticK (default 64) must clamp to
    // one cell per doc and run through, not abort the pipeline — with
    // every doc its own cell no pairs form, so everything survives
    // (the documented degraded-recall trade, NOT an error)
    val clamped = CorpusPrep.prepare(docs, "doc_id", "text",
      CorpusPrep.Config(semanticVecCol = Some("emb")))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(clamped == Seq(10L, 11L, 12L),
      s"under-k corpus must degrade gracefully, not crash: $clamped")
  }

  test("boilerplate strip runs first: shared site chrome stops manufacturing near-dups") {
    // Two pages of the same site: a large shared banner plus small
    // distinct bodies. With the banner in place they are near-dups at
    // 0.5 and one drops; stripping lines with df > 1 first removes the
    // banner from BOTH, so both bodies survive the dedup gates.
    // diverse tokens: a REPEATED phrase would collapse to 5 distinct
    // shingles and never reach the 0.5 Jaccard the fixture needs
    val banner = "please accept all cookies before you continue reading " +
      "this site navigation menu home products pricing docs blog careers " +
      "contact terms privacy settings language region sign in register help"
    val docs = Seq(
      (1L, s"$banner\nalpha body with its own words entirely"),
      (2L, s"$banner\nbeta body speaking about different things"))
      .toDF("doc_id", "text")
    val without = CorpusPrep.prepare(docs, "doc_id", "text",
      CorpusPrep.Config(nearDupJaccard = 0.5))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(without == Seq(1L), s"fixture degenerated — banner must near-dup: $without")
    val withStrip = CorpusPrep.prepare(docs, "doc_id", "text",
      CorpusPrep.Config(nearDupJaccard = 0.5, lineBoilerplateMaxDf = 1))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(withStrip == Seq(1L, 2L),
      s"stripping site chrome first must keep both bodies: $withStrip")
  }

  test("mix chains budget → PPS → LM gate, each stage biting in order") {
    import org.apache.spark.sql.functions.col
    // 2 languages × 12 docs of varied length; one junk doc whose tokens
    // are all hapaxes (every count-1 under the mix model → lowest
    // avg_lp) to give the LM gate a victim.
    val docs = (0 until 12).flatMap { i =>
      Seq((100L + i, "aa", ("common words repeat here " * (i + 1)).trim),
        (200L + i, "bb", ("different shared tokens again " * (i + 1)).trim))
    } :+ ((300L, "aa", "qq ww ee rr tt yy uu ii oo pp zz xx"))
    val df = docs.toDF("doc_id", "lang", "text")
    val cfg = CorpusPrep.MixConfig(
      langBudget = 8, tokenPoints = 5, lmFloor = -6.0)
    val out = CorpusPrep.mix(df, "doc_id", "text", "lang", cfg)
      .select(col("lang"), col("doc_id"), col("n_hits"), col("avg_lp"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // stage 1+2: per language the hits sum to EXACTLY tokenPoints before
    // the gate; the gate only removes rows, so after it ≤ tokenPoints —
    // and nothing outside the 8-doc budget can appear.
    val byLang = out.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum <= cfg.tokenPoints,
        s"$lang: hits exceed the token budget: $rows")
      assert(rows.length <= cfg.langBudget)
    }
    // stage 3: with the floor disabled everything sampled survives and
    // hits sum to exactly tokenPoints — proving the gate (not sampling)
    // removed the difference; the junk doc is gated, commons survive.
    val ungated = CorpusPrep.mix(df, "doc_id", "text", "lang",
      cfg.copy(lmFloor = Double.NegativeInfinity))
      .select(col("lang"), col("doc_id"), col("n_hits"), col("avg_lp"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    ungated.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum == cfg.tokenPoints,
        s"$lang: PPS must place exactly ${cfg.tokenPoints} points: $rows")
    }
    if (ungated.exists(r => r._2 == 300L)) { // junk doc sampled this run?
      val junkLp = ungated.find(_._2 == 300L).get._4
      assert(junkLp == ungated.map(_._4).min,
        "the all-hapax doc must score lowest under the mix model")
      assert(!out.exists(_._2 == 300L) || junkLp >= cfg.lmFloor,
        "a junk doc below the floor must be gated")
    }
    // end-to-end determinism: same mix under any input layout
    val relaid = CorpusPrep.mix(df.repartition(13), "doc_id", "text", "lang", cfg)
      .select(col("lang"), col("doc_id"), col("n_hits"), col("avg_lp"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(relaid.toSet == out.toSet, "mix must be layout-invariant")
    // a non-numeric id would null-cast through the top-k and yield a
    // silently empty mix — must fail loudly instead
    val e = intercept[IllegalArgumentException](CorpusPrep.mix(
      df.withColumn("doc_id", col("doc_id").cast("string")),
      "doc_id", "text", "lang", cfg))
    assert(e.getMessage.contains("numeric"))
  }

  test("prepare runs on the real documents table and keeps most docs") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val out = CorpusPrep.prepare(docs, "doc_id", "text")
    val kept = out.count()
    // near-dups exist in the corpus, so some rows must drop — but the
    // pass must not decimate it.
    assert(kept < n && kept > n / 2, s"kept $kept of $n")
    // split is deterministic: same result on a second run
    assert(out.select("doc_id", "split").collect().toSet ==
      CorpusPrep.prepare(docs, "doc_id", "text")
        .select("doc_id", "split").collect().toSet)
  }
}
