package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

class BpeTrainerSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, split}

  test("learns the classic merge sequence: ug, hug, pug") {
    // word counts: hug 4, pug 2, pun 1, bun 1.
    // r1 pairs: (u,g)=6 > (h,u)=4 > (p,u)=3 > (u,n)=2 > (b,u)=1 -> ug
    // r2: (h,ug)=4 > (p,ug)=2, (u,n)=2, (p,u)=1, (b,u)=1 -> hug
    // r3: (p,ug)=2 ties (u,n)=2; "p ug" < "u n" lexically -> pug
    val docs = Seq("hug hug hug pug", "pug pun bun hug").toDF("text")
    val merges = BpeTrainer.train(docs, "text", merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(merges == Seq(
      (1L, "u", "g", "ug", 6L),
      (2L, "h", "ug", "hug", 4L),
      (3L, "p", "ug", "pug", 2L)))
  }

  test("fusion is greedy left-to-right: a fused symbol sits out the round") {
    val df = Seq(Tuple1("x")).toDF("dummy")
      .select(split(org.apache.spark.sql.functions.lit("a a a a a"), " ")
        .as("syms"))
    val out = df.select(BpeTrainer.fusePair(col("syms"), "a", "a").as("f"))
      .head().getSeq[String](0)
    assert(out == Seq("aa", "aa", "a"))
  }

  test("segmentWord applies the merges in training order") {
    // merges (u,g) then (h,ug): "hugs" -> [h,u,g,s] -> [h,ug,s] -> [hug,s];
    // "pug" gets only the first merge; "bun" none.
    val df = Seq("hugs", "pug", "bun").toDF("w")
    val out = df.select(col("w"),
      BpeTrainer.segmentWord(col("w"),
        Seq(("u", "g"), ("h", "ug"))).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("hugs") == Seq("hug", "s"))
    assert(out("pug") == Seq("p", "ug"))
    assert(out("bun") == Seq("b", "u", "n"))
  }

  test("native segmentation equals the declarative fold on every corpus word") {
    val words = Seq("hugs", "pug", "bun", "aaaa", "abababa", "x",
      "mississippi", "aabbaabb").toDF("w")
    val merges = Seq(("a", "b"), ("ab", "ab"), ("s", "s"), ("i", "s"))
    val rows = words.select(col("w"),
      BpeTrainer.segmentWord(col("w"), merges).as("native"),
      BpeTrainer.segmentWordFold(col("w"), merges).as("fold"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"native/fold diverge on '${r.getString(0)}'")
    }
  }

  test("a 15-round run on the corpus: best-pair counts never increase, merges stay well-formed") {
    // Old pairs only lose occurrences as fusions consume them, and a
    // pair created by round r's fusion occurs at most best(r) times —
    // so the chosen count is non-increasing across rounds (the shape a
    // production merge schedule relies on for early stopping).
    val merges = BpeTrainer.train(
      graft.Tables.documents(spark, graft.TestSession.sf), "text", 15)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(merges.map(_._1).toSeq == (1L to 15L),
      "rounds must be consecutive from 1")
    assert(merges.sliding(2).forall {
      case Array(a, b) => b._5 <= a._5
      case _ => true
    }, s"best-pair counts increased: ${merges.map(_._5).mkString(",")}")
    merges.foreach { case (_, l, r, m, cnt) =>
      assert(l.nonEmpty && r.nonEmpty && m == l + r && cnt > 0)
    }
    // learned symbols are reused as later merge sides (real BPE
    // dynamics, not 15 disjoint character pairs)
    val vocab = merges.map(_._4).toSet
    assert(merges.exists(t => vocab.contains(t._2) || vocab.contains(t._3)),
      "later rounds must build on earlier merged symbols")
  }

  test("fuzz: native segmentation equals the fold on random words and merge chains") {
    val rnd = new scala.util.Random(17)
    val alpha = "ab" // tiny alphabet maximizes merge collisions
    val words = (0 until 60).map(_ =>
      (0 until (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(2))).mkString)
    // chains where later merges reference earlier merged symbols
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("b", "aaab"),
      ("b", "b"))
    val rows = words.toDF("w").select(col("w"),
      BpeTrainer.segmentWord(col("w"), merges).as("native"),
      BpeTrainer.segmentWordFold(col("w"), merges).as("fold"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"diverge on '${r.getString(0)}': " +
          s"${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      assert(r.getSeq[String](1).mkString("") == r.getString(0),
        "segmentation must be lossless")
    }
  }

  test("merge table round-trips through storage; a gapped table fails loudly") {
    val docs = Seq("hug hug hug pug", "pug pun bun hug").toDF("text")
    val trained = BpeTrainer.train(docs, "text", merges = 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bpe").toString + "/merges"
    BpeTrainer.writeMerges(trained, path)
    val loaded = BpeTrainer.readMerges(spark, path)
    assert(loaded == Seq(("u", "g"), ("h", "ug"), ("p", "ug")))
    // stored tokenizer segments exactly like the in-session one
    val seg = Seq("hugs").toDF("w")
      .select(BpeTrainer.segmentWord(col("w"), loaded))
      .head().getSeq[String](0)
    assert(seg == Seq("hug", "s"))
    // a table missing round 2 must not half-segment silently
    BpeTrainer.writeMerges(trained.filter(col("round") =!= 2), path)
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.readMerges(spark, path)
    }
    assert(e.getMessage.contains("not a contiguous training sequence"))
  }

  test("incremental delta loop equals the naive re-explode loop, merge for merge") {
    // Corpora chosen to exercise the delta path hard: overlapping
    // pairs, merges that create new pairs touching old ones, words the
    // merge never touches (their counts must survive untouched), and a
    // pair whose count nets to exactly 0 after a fusion consumes it.
    val corpora = Seq(
      Seq("hug hug hug pug", "pug pun bun hug"),
      Seq("abab abab ab a b", "aaaa aab abba", "zq zq zq"),
      Seq("mississippi is miss", "pip pip sip", "ssss ss s"))
    corpora.foreach { docs =>
      val df = docs.toDF("text")
      val fast = BpeTrainer.train(df, "text", merges = 8)
        .orderBy(col("round")).collect().map(_.toSeq).toSeq
      val slow = BpeTrainer.trainNaive(df, "text", merges = 8)
        .orderBy(col("round")).collect().map(_.toSeq).toSeq
      assert(fast == slow, s"delta/naive diverge on $docs")
    }
  }

  test("fuzz: delta loop equals naive on random corpora, merge for merge") {
    // Tiny alphabet maximizes pair collisions, zero-net-count events,
    // and merges whose products immediately re-participate — the delta
    // bookkeeping's hardest cases.
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 8) {
      val docs = (0 until 6).map { _ =>
        (0 until (3 + rnd.nextInt(6))).map(_ =>
          (0 until (1 + rnd.nextInt(7)))
            .map(_ => "ab" (rnd.nextInt(2))).mkString).mkString(" ")
      }.toDF("text")
      val fast = BpeTrainer.train(docs, "text", merges = 6)
        .orderBy(col("round")).collect().map(_.toSeq).toSeq
      val slow = BpeTrainer.trainNaive(docs, "text", merges = 6)
        .orderBy(col("round")).collect().map(_.toSeq).toSeq
      assert(fast == slow, s"trial $trial diverged:\n$fast\nvs\n$slow")
    }
  }

  test("minPairCount stops before learning a below-floor merge") {
    // hug 4, pug 2, pun 1, bun 1: r1 (u,g)=6, r2 (h,ug)=4, r3 best is
    // (p,ug)=2 — a floor of 3 must stop after exactly two merges.
    val docs = Seq("hug hug hug pug", "pug pun bun hug").toDF("text")
    val merges = BpeTrainer.train(docs, "text", merges = 10,
      minPairCount = 3L).collect()
      .map(r => (r.getString(3), r.getLong(4))).toSeq
    assert(merges == Seq(("ug", 6L), ("hug", 4L)))
  }

  test("targetVocabSize caps merges at target minus base symbols; an impossible target fails loudly") {
    // base symbols: h,u,g,p,n,b = 6; target 8 leaves budget for 2 merges.
    val docs = Seq("hug hug hug pug", "pug pun bun hug").toDF("text")
    val merges = BpeTrainer.train(docs, "text", merges = 10,
      targetVocabSize = Some(8)).collect().map(_.getString(3)).toSeq
    assert(merges == Seq("ug", "hug"))
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.train(docs, "text", merges = 10, targetVocabSize = Some(6))
    }
    assert(e.getMessage.contains("does not exceed"))
  }

  test("empty words (doubled spaces) segment to [] on both paths and never crash training") {
    // "a  b" splits to [a, "", b] under the keep-empties tokenizer; the
    // empty word must contribute no symbols and no pairs.
    val df = Seq("", "x", "ab").toDF("w")
    val rows = df.select(col("w"),
      BpeTrainer.segmentWord(col("w"), Seq(("a", "b"))).as("native"),
      BpeTrainer.segmentWordFold(col("w"), Seq(("a", "b"))).as("fold"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1),
        r.getSeq[String](2)))
    rows.foreach { case (w, n, f) => assert(n == f, s"diverge on '$w'") }
    assert(rows.find(_._1 == "").get._2 == Seq.empty[String])
    val docs = Seq("a  b ab ab", "ab  a b").toDF("text")
    val fast = BpeTrainer.train(docs, "text", merges = 2)
      .orderBy(col("round")).collect().map(_.toSeq).toSeq
    val slow = BpeTrainer.trainNaive(docs, "text", merges = 2)
      .orderBy(col("round")).collect().map(_.toSeq).toSeq
    assert(fast == slow)
    assert(fast.nonEmpty && fast.head(3) == "ab")
  }

  test("a vocabulary with no adjacent pairs ends training early, loudly visible") {
    val docs = Seq("a b a", "b a b").toDF("text") // all words single-char
    val merges = BpeTrainer.train(docs, "text", merges = 2).collect()
    assert(merges.isEmpty,
      "single-symbol words have no pairs; train must return zero merges")
  }
}
