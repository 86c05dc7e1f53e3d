package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-22 optimization probe (guide §1: measure first) — interleaved
  * old-vs-new A/B arms for every r22 change, in ONE JVM so JIT/GC state
  * is shared and the minimum-of-medians statistic is load-robust (the
  * r21 protocol). The OLD arms are inline copies of the r21 shapes
  * (from git history), so both arms run against the same session.
  * Throwaway measurement harness: not part of the driver contract.
  */
object ProfileR22 {
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
    def time(tag: String)(body: => Unit): Double = {
      System.gc(); Thread.sleep(50)
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $tag%-44s $s%8.3f s")
      spark.sparkContext.setJobDescription(null)
      s
    }
    def ab(tag: String, rounds: Int)(old: => Unit)(nw: => Unit): Unit = {
      old; nw // warm both arms
      val olds = Vector.newBuilder[Double]
      val news = Vector.newBuilder[Double]
      (1 to rounds).foreach { i =>
        olds += time(s"$tag OLD #$i")(old)
        news += time(s"$tag NEW #$i")(nw)
      }
      val (o, n) = (olds.result().min, news.result().min)
      println(f"[profile] == $tag%-40s old-min $o%7.3f  new-min $n%7.3f  ratio ${n / o}%5.2f")
    }
    def sel(name: String) = which == "all" || which.split(",").contains(name)

    import graft.text.{TextFunctions => TF}
    import graft.operators.LineageCheckpoint

    // ---- old (r21) pageRank loop shape: per-iteration deg join ----
    def pageRankOld(edges: DataFrame, iters: Int): DataFrame = {
      val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .withColumn("_gr_seed", lit(1L))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ck = new LineageCheckpoint(spark, None)
      var ranks = nodes.select(col("node"),
        (lit(1000000L) * col("_gr_seed")).as("rank"))
      var i = 0
      try {
        while (i < iters) {
          val contrib = e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy(col("dst").as("node"))
            .agg(sum(expr("rank div deg")).as("s"))
          ranks = ck(nodes.join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit(150000L) * col("_gr_seed") +
                expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100"))
                .as("rank")))
          i += 1
        }
      } finally { e.unpersist(); deg.unpersist(); nodes.unpersist() }
      ranks
    }

    // ---- old (r21) HITS loop: lazy raw sums (double-eval per half-step)
    def hitsOld(edges: DataFrame, iters: Int): DataFrame = {
      val unit = 1000000L
      val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ckA = new LineageCheckpoint(spark, None)
      val ckH = new LineageCheckpoint(spark, None)
      var hubs = nodes.select(col("node"), lit(unit).as("hub"))
      var auths: DataFrame = null
      try {
        var i = 0
        while (i < iters) {
          val aRaw = e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("ar"))
          val aMax = aRaw.agg(max(col("ar")).as("am"))
          auths = ckA(nodes.join(aRaw, Seq("node"), "left")
            .crossJoin(broadcast(aMax))
            .select(col("node"),
              expr(s"($unit * coalesce(ar, CAST(0 AS BIGINT))) div am")
                .as("auth")))
          val hRaw = e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node")).agg(sum(col("auth")).as("hr"))
          val hMax = hRaw.agg(max(col("hr")).as("hm"))
          hubs = ckH(nodes.join(hRaw, Seq("node"), "left")
            .crossJoin(broadcast(hMax))
            .select(col("node"),
              expr(s"($unit * coalesce(hr, CAST(0 AS BIGINT))) div hm")
                .as("hub")))
          i += 1
        }
      } finally { e.unpersist(); nodes.unpersist() }
      hubs.join(auths, "node")
    }

    // ---- old (r21) star contraction: count+count+except convergence,
    //      two interleaved rotations ----
    def starOld(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
      val ckptA = new LineageCheckpoint(spark, None)
      val ckptB = new LineageCheckpoint(spark, None)
      def canon(df: DataFrame): DataFrame =
        df.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
          .filter(col("a") =!= col("b")).distinct()
      def star(e: DataFrame, large: Boolean): DataFrame = {
        val adj = e.select(col("a").as("u"), col("b").as("v"))
          .unionByName(e.select(col("b").as("u"), col("a").as("v")))
        val mins = adj.groupBy(col("u"))
          .agg(least(min(col("v")), first(col("u"))).as("m"))
        val joined = adj.join(mins, "u")
        val out =
          if (large)
            joined.filter(col("v") > col("u"))
              .select(col("v").as("a"), col("m").as("b"))
          else
            joined.filter(col("v") <= col("u"))
              .select(col("v").as("a"), col("m").as("b"))
              .unionByName(mins.select(col("u").as("a"), col("m").as("b")))
        canon(out)
      }
      val all = ckptA(
        pairs.select(least(col("a_id"), col("b_id")).as("a"),
          greatest(col("a_id"), col("b_id")).as("b")).distinct())
      val selfCkpt = new LineageCheckpoint(spark, None)
      val selfOnly = selfCkpt(
        all.filter(col("a") === col("b")).select(col("a").as("id"))
          .except(all.filter(col("a") =!= col("b")).select(col("a").as("id"))
            .unionByName(
              all.filter(col("a") =!= col("b")).select(col("b").as("id")))))
      var edges = all.filter(col("a") =!= col("b"))
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val ckpt = if (i % 2 == 0) ckptB else ckptA
        val next = ckpt(star(star(edges, large = true), large = false))
        converged = next.count() == edges.count() &&
          next.except(edges).isEmpty
        edges = next
        i += 1
      }
      require(converged, s"no convergence in $maxIter rounds")
      val labelCkpt = if ((i - 1) % 2 == 0) ckptA else ckptB
      labelCkpt(
        edges.select(col("b").as("id"), col("a").as("component"))
          .unionByName(edges.select(col("a").as("id"), col("a").as("component")))
          .distinct()
          .unionByName(selfOnly.select(col("id"), col("id").as("component"))))
    }

    if (sel("graph")) {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      noop(li)
      def edges() = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      ab("q29 pagerank 3 iters", 3) {
        noop(pageRankOld(edges(), 3))
      } {
        noop(graft.operators.GraphRank.pageRank(edges(), "src", "dst",
          iters = 3, assumeDistinct = true))
      }
      def hitsEdges() = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, sfDir).select(col("l_orderkey"),
          col("l_partkey")), col("o_orderkey") === col("l_orderkey"))
        .select((lit(-1L) * col("o_custkey") - 1).as("src"),
          col("l_partkey").as("dst"))
        .distinct()
      ab("q39 hits 2 rounds", 3) {
        noop(hitsOld(hitsEdges(), 2))
      } {
        noop(graft.operators.GraphRank.hits(hitsEdges(), "src", "dst",
          iters = 2, assumeDistinct = true))
      }
    }

    // q29/q35 edge build: self-join on l_orderkey + distinct (r21 shape)
    // vs one groupBy(orderkey) collect_set + row-local pair explosion +
    // distinct. Same pair set by construction (both = all ordered pairs
    // of distinct parts co-occurring in an order).
    if (sel("edges")) {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      noop(li)
      def edgesJoin() = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      def edgesAgg() = li
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, a -> " +
            "transform(filter(ps, b -> b != a), b -> struct(a, b))))"))
          .as("p"))
        .select(col("p.a").as("src"), col("p.b").as("dst"))
        .distinct()
      val cj = edgesJoin().count(); val ca = edgesAgg().count()
      require(cj == ca, s"edge variants disagree: $cj vs $ca")
      ab("q29 edge build join vs agg", 3) {
        noop(edgesJoin())
      } {
        noop(edgesAgg())
      }
      ab("q29 FULL pagerank, join vs agg edges", 3) {
        noop(graft.operators.GraphRank.pageRank(edgesJoin(), "src", "dst",
          iters = 3, assumeDistinct = true))
      } {
        noop(graft.operators.GraphRank.pageRank(edgesAgg(), "src", "dst",
          iters = 3, assumeDistinct = true))
      }
    }

    // variant: materialize the INNER star each round (2 ckpt jobs per
    // round, outer star reads blocks instead of recomputing the inner
    // join/agg subtrees its plan references repeatedly).
    def starInner(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
      val ckpt = new LineageCheckpoint(spark, None)
      def canon(df: DataFrame): DataFrame =
        df.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
          .filter(col("a") =!= col("b")).distinct()
      def star(e: DataFrame, large: Boolean): DataFrame = {
        val adj = e.select(col("a").as("u"), col("b").as("v"))
          .unionByName(e.select(col("b").as("u"), col("a").as("v")))
        val mins = adj.groupBy(col("u"))
          .agg(least(min(col("v")), first(col("u"))).as("m"))
        val joined = adj.join(mins, "u")
        val out =
          if (large)
            joined.filter(col("v") > col("u"))
              .select(col("v").as("a"), col("m").as("b"))
          else
            joined.filter(col("v") <= col("u"))
              .select(col("v").as("a"), col("m").as("b"))
              .unionByName(mins.select(col("u").as("a"), col("m").as("b")))
        canon(out)
      }
      val all = ckpt(
        pairs.select(least(col("a_id"), col("b_id")).as("a"),
          greatest(col("a_id"), col("b_id")).as("b")).distinct())
      val selfCkpt = new LineageCheckpoint(spark, None)
      val selfOnly = selfCkpt(
        all.filter(col("a") === col("b")).select(col("a").as("id"))
          .except(all.filter(col("a") =!= col("b")).select(col("a").as("id"))
            .unionByName(
              all.filter(col("a") =!= col("b")).select(col("b").as("id")))))
      def edgeStats(df: DataFrame): (Long, java.math.BigDecimal, Long) = {
        val r = df.agg(count(lit(1)),
          sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")),
          expr("bit_xor(xxhash64(a, b))")).head()
        (r.getLong(0),
          Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO),
          if (r.isNullAt(2)) 0L else r.getLong(2))
      }
      var edges = all.filter(col("a") =!= col("b"))
      var prev = edgeStats(edges)
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val inner = ckpt(star(edges, large = true))
        val next = ckpt(star(inner, large = false))
        val st = edgeStats(next)
        converged = st == prev
        prev = st
        edges = next
        i += 1
      }
      require(converged, s"no convergence in $maxIter rounds")
      ckpt(
        edges.select(col("b").as("id"), col("a").as("component"))
          .unionByName(edges.select(col("a").as("id"), col("a").as("component")))
          .distinct()
          .unionByName(selfOnly.select(col("id"), col("id").as("component"))))
    }

    if (sel("starinner")) {
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      val pinned = new LineageCheckpoint(spark, None)(
        graft.text.Dedup.nearDupPairs(docs, "doc_id", "text", 0.0)
          .select(col("a_id"), col("b_id")))
      println("pairs: " + pinned.count())
      val a = graft.text.Dedup.dupComponentsStar(pinned).orderBy("id")
        .collect().toSeq
      val b = starInner(pinned).orderBy("id").collect().toSeq
      require(a == b, "starInner labels diverge")
      ab("star CC: 1-job round vs inner ckpt", 4) {
        noop(graft.text.Dedup.dupComponentsStar(pinned))
      } {
        noop(starInner(pinned))
      }
    }

    if (sel("star")) {
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      // pairs pinned ONCE so the arms time only the contraction loop —
      // rebuilding the LSH pipeline per run drowned the delta in its
      // variance.
      val pinned = new LineageCheckpoint(spark, None)(
        graft.text.Dedup.nearDupPairs(docs, "doc_id", "text", 0.0)
          .select(col("a_id"), col("b_id")))
      println("pairs: " + pinned.count())
      ab("star CC on pinned pairs", 4) {
        noop(starOld(pinned))
      } {
        noop(graft.text.Dedup.dupComponentsStar(pinned))
      }
    }

    // persist(MEMORY_AND_DISK) vs localCheckpoint for the dedup `sets`
    // frames (VERDICT r21 ask #5) — full nearDupPairs pipeline with the
    // only difference being the materialization mode.
    if (sel("persist")) {
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      def pairsWith(mat: DataFrame => DataFrame): DataFrame = {
        val sets = mat(docs
          .select(col("doc_id").as("_dd_id"),
            array_distinct(TF.shingles(TF.tokens(col("text")), 3))
              .as("_dd_ss")))
        val sig = sets.select(col("_dd_id"),
          posexplode(graft.functions.text.minhashSlices(col("_dd_ss"), 4))
            .as(Seq("band", "mh")))
        val cand = sig.as("x")
          .join(sig.as("y"),
            col("x.band") === col("y.band") && col("x.mh") === col("y.mh") &&
              col("x._dd_id") < col("y._dd_id"))
          .select(col("x._dd_id").as("a_id"), col("y._dd_id").as("b_id"))
          .distinct()
        cand
          .join(sets.select(col("_dd_id").as("a_id"), col("_dd_ss").as("_dd_sa")), "a_id")
          .join(sets.select(col("_dd_id").as("b_id"), col("_dd_ss").as("_dd_sb")), "b_id")
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("_dd_sa"), col("_dd_sb"))).as("ix"),
            (size(col("_dd_sa")) + size(col("_dd_sb"))).as("tot"))
          .select(col("a_id"), col("b_id"),
            (col("ix").cast("double") / (col("tot") - col("ix"))).as("jaccard"))
          .filter(col("jaccard") >= 0.6)
      }
      val held = scala.collection.mutable.ListBuffer.empty[DataFrame]
      ab("nearDupPairs ckpt vs persist", 3) {
        noop(pairsWith(_.localCheckpoint()))
      } {
        noop(pairsWith { df =>
          val p = df.persist(StorageLevel.MEMORY_AND_DISK); held += p; p
        })
        held.foreach(_.unpersist(false)); held.clear()
      }
    }

    // d92 re-A/B (VERDICT r21 ask #3): prefix-filter pairs with lazy
    // sets (r20 shape) vs the r21 localCheckpoint.
    if (sel("d92")) {
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      def pfPairs(mat: DataFrame => DataFrame): DataFrame = {
        val tMicro = math.round(0.5 * 1e6)
        val sets = mat(docs.select(col("doc_id").as("_pf_id"),
          array_distinct(TF.shingles(TF.tokens(col("text")), 3))
            .as("_pf_ss")))
        val posting = sets
          .select(col("_pf_id"), size(col("_pf_ss")).as("_pf_n"),
            explode(col("_pf_ss")).as("_pf_sh"))
        val dfreq = posting.groupBy(col("_pf_sh"))
          .agg(count(lit(1)).as("_pf_df"))
        val wDoc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("_pf_id"))
          .orderBy(col("_pf_df"), col("_pf_sh"))
        val prefix = posting.join(dfreq, "_pf_sh")
          .withColumn("_pf_pos", row_number().over(wDoc))
          .filter(col("_pf_pos") <=
            col("_pf_n") - expr(s"(${tMicro}L * _pf_n + 999999) div 1000000")
              + lit(1))
          .select(col("_pf_id"), col("_pf_sh"))
        val cand = prefix.as("x")
          .join(prefix.as("y"),
            col("x._pf_sh") === col("y._pf_sh") &&
              col("x._pf_id") < col("y._pf_id"))
          .select(col("x._pf_id").as("a_id"), col("y._pf_id").as("b_id"))
          .distinct()
        cand
          .join(sets.select(col("_pf_id").as("a_id"), col("_pf_ss").as("_pf_sa")),
            "a_id")
          .join(sets.select(col("_pf_id").as("b_id"), col("_pf_ss").as("_pf_sb")),
            "b_id")
          .withColumn("_pf_ix",
            size(array_intersect(col("_pf_sa"), col("_pf_sb"))).cast("long"))
          .select(col("a_id"), col("b_id"),
            (col("_pf_ix").cast("double")
              / (size(col("_pf_sa")) + size(col("_pf_sb")) - col("_pf_ix")))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.5)
      }
      ab("d92 prefix-filter lazy vs ckpt", 3) {
        noop(pfPairs(identity))
      } {
        noop(pfPairs(_.localCheckpoint()))
      }
    }

    // TextIndex.build: r21 3-tokenize-pass writeParts vs the r22
    // stats-from-doclens-readback (2 passes + tiny read).
    if (sel("tibuild")) {
      import org.apache.spark.sql.SaveMode
      val docs = Tables.documents(spark, sfDir)
      noop(docs)
      import spark.implicits._
      def buildOld(path: String): Unit = {
        val base = docs.select(col("doc_id"),
          TF.tokens(col("text")).as("toks"))
          .withColumn("dl", size(col("toks")).cast("long"))
        base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
          .groupBy(col("term"), col("doc_id"), col("dl"))
          .agg(count(lit(1)).as("tf"))
          .withColumn("bucket", TF.hash32(col("term")) % 16)
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(s"$path/postings")
        base.select(col("doc_id"), col("dl"))
          .write.mode(SaveMode.Overwrite).parquet(s"$path/doclens")
        val delta = base
          .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s"))
          .head()
        Seq((delta.getLong(0), delta.getAs[Long]("s")))
          .toDF("n_docs", "sum_dl").coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
        Seq(16).toDF("n_buckets").coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
      }
      ab("TextIndex.build old vs new", 3) {
        buildOld(java.nio.file.Files.createTempDirectory("prof-tio").toString)
      } {
        graft.store.TextIndex.build(docs, "doc_id", "text",
          java.nio.file.Files.createTempDirectory("prof-tin").toString,
          nBuckets = 16)
      }
    }

    // Serving job count: meta+stats+dfs+main — old vs metaAndLiveStats.
    if (sel("tiserve")) {
      val docs = Tables.documents(spark, sfDir)
      val p = java.nio.file.Files.createTempDirectory("prof-tis").toString
      graft.store.TextIndex.build(docs, "doc_id", "text", p, nBuckets = 16)
      // apples-to-apples: ONLY the per-search fixed cost differs
      // between the arms — old = meta head + stats sum (2 jobs), new =
      // the one-job merged read. Both produce the identical triple.
      def fixedOld(): (Int, Long, Long) = {
        val nBuckets = spark.read.parquet(s"$p/meta").head().getInt(0)
        val st = spark.read.parquet(s"$p/stats")
          .agg(coalesce(sum(col("n_docs")), lit(0L)),
            coalesce(sum(col("sum_dl")), lit(0L))).head()
        (nBuckets, st.getLong(0), st.getLong(1))
      }
      val a = fixedOld()
      val b = graft.store.TextIndex.metaAndLiveStats(spark, p)
      require(a == b, s"meta/stats mismatch: $a vs $b")
      ab("search fixed cost x20, old vs new", 3) {
        (1 to 20).foreach(_ => fixedOld())
      } {
        (1 to 20).foreach(_ =>
          graft.store.TextIndex.metaAndLiveStats(spark, p))
      }
    }

    spark.stop()
  }
}
