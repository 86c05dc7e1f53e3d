package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 optimization probe (guide §1: measure first) — stage-level
  * timings for the expensive query families, so changes are driven by
  * where the time actually goes instead of plan aesthetics. Each probe
  * materializes through the noop sink (full-column computation, no disk)
  * and is labeled for the UI. Throwaway measurement harness: not part of
  * the driver contract, reads the same env vars as Bench.
  */
object ProfileR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "all")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(body: => Unit): Unit = {
      System.gc(); Thread.sleep(50)
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      body
      println(f"[profile] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
    }
    def sel(name: String) = which == "all" || which.split(",").contains(name)

    import graft.text.{TextFunctions => TF}

    if (sel("neardup")) {
      val docs = Tables.documents(spark, sfDir)
      // warm the file cache / JIT once
      noop(docs)
      time("docs scan (warm)") { noop(docs) }
      val shingled = docs
        .select(col("doc_id").as("_dd_id"), TF.tokens(col("text")).as("_dd_toks"))
        .select(col("_dd_id"), TF.shingles(col("_dd_toks"), 3).as("_dd_sh"))
      time("tokenize+shingle pass") { noop(shingled) }
      val sig = shingled.select(col("_dd_id"),
        posexplode(graft.functions.text.minhashSlices(col("_dd_sh"), 4))
          .as(Seq("band", "mh")))
      time("signature pass (md5/shingle)") { noop(sig) }
      val cand = sig.as("x")
        .join(sig.as("y"),
          col("x.band") === col("y.band") && col("x.mh") === col("y.mh") &&
            col("x._dd_id") < col("y._dd_id"))
        .select(col("x._dd_id").as("a_id"), col("y._dd_id").as("b_id"))
        .distinct()
      time("candidates (band self-join)") { noop(cand) }
      val sets = shingled.select(col("_dd_id"), array_distinct(col("_dd_sh")).as("_dd_ss"))
      time("sets pass (re-shingle+distinct)") { noop(sets) }
      val full = cand
        .join(sets.select(col("_dd_id").as("a_id"), col("_dd_ss").as("_dd_sa")), "a_id")
        .join(sets.select(col("_dd_id").as("b_id"), col("_dd_ss").as("_dd_sb")), "b_id")
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("_dd_sa"), col("_dd_sb"))).as("ix"),
          (size(col("_dd_sa")) + size(col("_dd_sb"))).as("tot"))
        .select(col("a_id"), col("b_id"),
          (col("ix").cast("double") / (col("tot") - col("ix"))).as("jaccard"))
        .filter(col("jaccard") >= 0.0)
      time("full nearDupPairs") { noop(full) }
      time("full nearDupPairs (again)") { noop(full) }
      val pairs = graft.text.Dedup.nearDupPairs(docs, "doc_id", "text", 0.0)
        .select(col("a_id"), col("b_id"))
      val pinned = new graft.operators.LineageCheckpoint(spark, None)(pairs)
      time("dupComponentsStar on pinned pairs") {
        noop(graft.text.Dedup.dupComponentsStar(pinned))
      }
      time("dupComponents(min-label) on pinned") {
        noop(graft.text.Dedup.dupComponents(pinned))
      }
      println("candidate pairs: " + pinned.count())
    }

    if (sel("neardup2")) {
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      val shingled = docs
        .select(col("doc_id").as("_dd_id"), TF.tokens(col("text")).as("_dd_toks"))
        .select(col("_dd_id"), TF.shingles(col("_dd_toks"), 3).as("_dd_sh"))
      val sig = shingled.select(col("_dd_id"),
        posexplode(graft.functions.text.minhashSlices(col("_dd_sh"), 4))
          .as(Seq("band", "mh")))
      time("sig materialize (localCheckpoint)") {
        noop(sig.localCheckpoint())
      }
      val sigCk = sig.localCheckpoint()
      val candCk = sigCk.as("x")
        .join(sigCk.as("y"),
          col("x.band") === col("y.band") && col("x.mh") === col("y.mh") &&
            col("x._dd_id") < col("y._dd_id"))
        .select(col("x._dd_id").as("a_id"), col("y._dd_id").as("b_id"))
        .distinct()
      time("cand over checkpointed sig") { noop(candCk) }
      time("cand over checkpointed sig (2)") { noop(candCk) }
      // bucket-local pair generation: one aggregate, no self-join
      val candAgg = sigCk
        .groupBy(col("band"), col("mh"))
        .agg(sort_array(collect_list(col("_dd_id"))).as("ids"))
        .select(explode(expr(
          "flatten(transform(ids, (a, i) -> " +
            "transform(slice(ids, i + 2, size(ids) - i - 1), " +
            "b -> struct(a, b))))")).as("p"))
        .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
        .filter(col("a_id") =!= col("b_id"))
        .distinct()
      time("cand via bucket collect_list") { noop(candAgg) }
      time("cand via bucket collect_list (2)") { noop(candAgg) }
      println("cand counts: join=" + candCk.count() + " agg=" + candAgg.count())
      val setsCk = shingled
        .select(col("_dd_id"), array_distinct(col("_dd_sh")).as("_dd_ss"))
        .localCheckpoint()
      val fullCk = candCk
        .join(setsCk.select(col("_dd_id").as("a_id"), col("_dd_ss").as("_dd_sa")), "a_id")
        .join(setsCk.select(col("_dd_id").as("b_id"), col("_dd_ss").as("_dd_sb")), "b_id")
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("_dd_sa"), col("_dd_sb"))).as("ix"),
          (size(col("_dd_sa")) + size(col("_dd_sb"))).as("tot"))
        .select(col("a_id"), col("b_id"),
          (col("ix").cast("double") / (col("tot") - col("ix"))).as("jaccard"))
        .filter(col("jaccard") >= 0.0)
      time("full pipeline, ck sig+sets") { noop(fullCk) }
      time("full pipeline, ck sig+sets (2)") { noop(fullCk) }
    }

    if (sel("star")) {
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      val pairs = graft.text.Dedup.nearDupPairs(docs, "doc_id", "text", 0.0)
        .select(col("a_id"), col("b_id"))
      val pinned = new graft.operators.LineageCheckpoint(spark, None)(pairs)
      println("pairs: " + pinned.count())
      time("dupComponentsStar warm 1") {
        noop(graft.text.Dedup.dupComponentsStar(pinned))
      }
      time("dupComponentsStar warm 2") {
        noop(graft.text.Dedup.dupComponentsStar(pinned))
      }
      time("dupComponents warm 1") {
        noop(graft.text.Dedup.dupComponents(pinned))
      }
      time("dupComponents warm 2") {
        noop(graft.text.Dedup.dupComponents(pinned))
      }
    }

    if (sel("variants")) {
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      // nearDupPairs variants, fresh construction per run (bench-like):
      // A = ship r20 lazy; B = ckpt sets (current edit); C = ckpt sig only
      def lazyPairs(): DataFrame = {
        val shingled = docs
          .select(col("doc_id").as("_dd_id"), TF.tokens(col("text")).as("_dd_toks"))
          .select(col("_dd_id"), TF.shingles(col("_dd_toks"), 3).as("_dd_sh"))
        val sig = shingled.select(col("_dd_id"),
          posexplode(graft.functions.text.minhashSlices(col("_dd_sh"), 4))
            .as(Seq("band", "mh")))
        val cand = sig.as("x").join(sig.as("y"),
            col("x.band") === col("y.band") && col("x.mh") === col("y.mh") &&
              col("x._dd_id") < col("y._dd_id"))
          .select(col("x._dd_id").as("a_id"), col("y._dd_id").as("b_id"))
          .distinct()
        val sets = shingled.select(col("_dd_id"), array_distinct(col("_dd_sh")).as("_dd_ss"))
        cand
          .join(sets.select(col("_dd_id").as("a_id"), col("_dd_ss").as("_dd_sa")), "a_id")
          .join(sets.select(col("_dd_id").as("b_id"), col("_dd_ss").as("_dd_sb")), "b_id")
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("_dd_sa"), col("_dd_sb"))).as("ix"),
            (size(col("_dd_sa")) + size(col("_dd_sb"))).as("tot"))
          .select(col("a_id"), col("b_id"),
            (col("ix").cast("double") / (col("tot") - col("ix"))).as("jaccard"))
          .filter(col("jaccard") >= 0.0)
      }
      def setsCkPairs(): DataFrame =
        graft.text.Dedup.nearDupPairs(docs, "doc_id", "text", 0.0)
      def sigCkPairs(): DataFrame = {
        val shingled = docs
          .select(col("doc_id").as("_dd_id"), TF.tokens(col("text")).as("_dd_toks"))
          .select(col("_dd_id"), TF.shingles(col("_dd_toks"), 3).as("_dd_sh"))
        val sig = shingled.select(col("_dd_id"),
          posexplode(graft.functions.text.minhashSlices(col("_dd_sh"), 4))
            .as(Seq("band", "mh")))
          .localCheckpoint()
        val cand = sig.as("x").join(sig.as("y"),
            col("x.band") === col("y.band") && col("x.mh") === col("y.mh") &&
              col("x._dd_id") < col("y._dd_id"))
          .select(col("x._dd_id").as("a_id"), col("y._dd_id").as("b_id"))
          .distinct()
        val sets = shingled.select(col("_dd_id"), array_distinct(col("_dd_sh")).as("_dd_ss"))
        cand
          .join(sets.select(col("_dd_id").as("a_id"), col("_dd_ss").as("_dd_sa")), "a_id")
          .join(sets.select(col("_dd_id").as("b_id"), col("_dd_ss").as("_dd_sb")), "b_id")
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("_dd_sa"), col("_dd_sb"))).as("ix"),
            (size(col("_dd_sa")) + size(col("_dd_sb"))).as("tot"))
          .select(col("a_id"), col("b_id"),
            (col("ix").cast("double") / (col("tot") - col("ix"))).as("jaccard"))
          .filter(col("jaccard") >= 0.0)
      }
      // warm all three once
      noop(lazyPairs()); noop(setsCkPairs()); noop(sigCkPairs())
      (1 to 3).foreach { i =>
        time(s"A lazy pairs (r20)      #$i") { noop(lazyPairs()) }
        time(s"B ckpt-sets pairs       #$i") { noop(setsCkPairs()) }
        time(s"C ckpt-sig pairs        #$i") { noop(sigCkPairs()) }
      }
    }

    if (sel("profilefam")) {
      val fn25 = graft.queries.RelationalQueries.queries("q25_table_profile")
      val fn26 = graft.queries.RelationalQueries.queries("q26_profile_sketch")
      noop(fn25(spark, sfDir))
      time("q25_table_profile") { noop(fn25(spark, sfDir)) }
      time("q26_profile_sketch") { noop(fn26(spark, sfDir)) }
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val li = Tables.lineitem(spark, sfDir)
      time("lineitem scan") { noop(li.select(cols.map(col): _*)) }
      time("4x countDistinct only") {
        noop(li.agg(countDistinct(col(cols.head)),
          cols.tail.map(c => countDistinct(col(c))): _*))
      }
      time("counts+min/max/sum only") {
        noop(li.agg(count(lit(1)),
          cols.flatMap(c => Seq(min(col(c)), max(col(c)),
            sum(col(c).cast("decimal(38,6)")))): _*))
      }
      val kmv = udaf(new graft.operators.Sketches.KmvDistinct(256),
        org.apache.spark.sql.Encoders.scalaLong)
      def centsHash(c: String) = graft.operators.Sketches.kmvInput(
        TF.hash32(floor(col(c) * lit(100.0) + lit(0.5)).cast("long").cast("string")))
      time("4x kmv only") {
        noop(li.agg(kmv(centsHash(cols.head)),
          cols.tail.map(c => kmv(centsHash(c))): _*))
      }
      time("4x cents-hash projection only") {
        noop(li.select(cols.map(c => centsHash(c).as(c)): _*))
      }
    }

    if (sel("textindex")) {
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      val p1 = java.nio.file.Files.createTempDirectory("prof-ti").toString
      time("TextIndex.build (16 buckets)") {
        graft.store.TextIndex.build(docs, "doc_id", "text", p1, nBuckets = 16)
      }
      val p2 = java.nio.file.Files.createTempDirectory("prof-ti2").toString
      time("TextIndex.build (again)") {
        graft.store.TextIndex.build(docs, "doc_id", "text", p2, nBuckets = 16)
      }
      time("buildPositions") {
        graft.store.TextIndex.buildPositions(docs, "doc_id", "text", p2)
      }
      time("buildTopTier") {
        graft.store.TextIndex.buildTopTier(spark, p2, topN = 64)
      }
      time("search (4 terms)") {
        noop(graft.store.TextIndex.search(spark, p2,
          Seq("big", "data", "table", "scan", "query"), k = 10))
      }
      time("phraseSearch") {
        noop(graft.store.TextIndex.phraseSearch(spark, p2, Seq("hash", "join")))
      }
    }

    if (sel("graph")) {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      noop(li)
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      time("q29 edge build") { noop(edges) }
      time("q29 full (edges + 3 iters)") {
        noop(graft.operators.GraphRank.pageRank(edges, "src", "dst",
          iters = 3, assumeDistinct = true))
      }
      val hitsEdges = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir).select(col("l_orderkey"),
          col("l_partkey")), col("o_orderkey") === col("l_orderkey"))
        .select((lit(-1L) * col("o_custkey") - 1).as("src"),
          col("l_partkey").as("dst"))
        .distinct()
      time("q39 edge build") { noop(hitsEdges) }
      time("q39 full (edges + 2 HITS rounds)") {
        noop(graft.operators.GraphRank.hits(hitsEdges, "src", "dst", iters = 2,
          assumeDistinct = true))
      }
    }

    spark.stop()
  }
}
