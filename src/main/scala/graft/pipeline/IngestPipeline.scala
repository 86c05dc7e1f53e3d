package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.store.ParquetVectorStore
import graft.text.{HtmlPrep, Splitters}

/** Page fetcher (S2–S4). Errors yield None — the reference returns an
  * empty result on fetch failure rather than failing the run
  * (website-ingestion-pipeline.py:32–37), which here means a null/absent
  * row, never a job abort. Implementations must be Serializable: fetching
  * runs on executors inside mapPartitions, one connection context per
  * partition, so a million URLs fan out across the cluster instead of the
  * reference's sequential loop (ingestion-pipeline.py:245–261).
  */
trait Fetcher extends Serializable {
  def fetch(url: String): Option[String]
}

/** Test/replay fetcher over an in-memory page map (SURVEY.md §7.4 #6:
  * live HTTP stays behind a trait with replayable fixtures).
  */
final case class FixtureFetcher(pages: Map[String, String]) extends Fetcher {
  override def fetch(url: String): Option[String] = pages.get(url)
}

/** `java.net.http.HttpClient`-based fetcher for real deployments (S2/S3:
  * GET with error→None semantics). Contract:
  *   - redirects followed (NORMAL policy: https→http downgrades refused);
  *   - any non-2xx status → None (the reference treats every fetch
  *     failure as an empty page, never a job abort);
  *   - charset honored from the Content-Type header, UTF-8 otherwise;
  *   - connect + request timeouts bounded by `timeoutMs`.
  * The full contract — charset decode, redirect follow, non-2xx/
  * unreachable → None — is exercised against a loopback JDK HttpServer
  * in HttpFetcherSpec (no egress required); the pipeline tests drive the
  * same chains through FixtureFetcher. The client is per-JVM lazy state
  * (@transient): executors rebuild it on first use instead of
  * serializing it with the task closure.
  */
final case class HttpFetcher(timeoutMs: Int = 30000) extends Fetcher {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .build()

  private val CharsetRe = "(?i)charset=\\s*\"?([^\";\\s]+)".r.unanchored

  override def fetch(url: String): Option[String] =
    try {
      val req = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .GET().build()
      val res = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (res.statusCode() / 100 != 2) None
      else {
        val charset = res.headers().firstValue("Content-Type")
          .map[java.nio.charset.Charset] {
            case CharsetRe(cs) =>
              try java.nio.charset.Charset.forName(cs)
              catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
            case _ => java.nio.charset.StandardCharsets.UTF_8
          }
          .orElse(java.nio.charset.StandardCharsets.UTF_8)
        Some(new String(res.body(), charset))
      }
    } catch { case _: Exception => None }
}

/** The two reference ingestion chains as one lazy Spark plan each
  * (SURVEY.md §3.1/§3.2). Stages: catalog → link discovery → fetch →
  * clean → markdown → header split → char split → enrich/prepend →
  * embed → store append. Everything between the catalog and the store is
  * a row-local transform (flatMap/map) — zero shuffles; the only wide
  * operation is the optional repartition before the store write.
  */
object IngestPipeline {

  /** S1 (RHPD:18–39): the constant product catalog, verbatim. */
  val DefaultCatalog: Seq[Product] = Seq(
    Product("red_hat_openshift_ai_self-managed",
      "Red Hat OpenShift AI Self-Managed", "2.14", "en-US"),
    Product("openshift_container_platform",
      "Red Hat OpenShift Container Platform", "4.17", "en-US"),
    Product("red_hat_enterprise_linux", "Red Hat Enterprise Linux 9",
      "9", "en-US"),
    Product("red_hat_ansible_automation_platform",
      "Red Hat Ansible Automation Platform", "2.5", "en-US"))

  /** S1 production form: read the catalog as JSON. */
  def loadCatalog(spark: SparkSession, path: String): Dataset[Product] = {
    import spark.implicits._
    spark.read.schema(implicitly[org.apache.spark.sql.Encoder[Product]].schema)
      .json(path).as[Product]
  }

  /** P2 + P3 (RHPD:186–189): keep documentation links, prefer the
    * single-page variant.
    */
  def filterDocLinks(links: Seq[String]): Seq[String] =
    links.filter(_.startsWith("/en/documentation"))
      .filter(_.contains("/html/"))
      .map(_.replace("/html/", "/html-single/"))

  /** P13, RHPD variant (RHPD:233–240): "Section: {title} / {headers}"
    * prepend with the page title as the base.
    */
  def prependHeaderRhpd(chunk: Chunk): Chunk = {
    val trail = chunk.metadata.getOrElse("title", "") +:
      Seq("Header1", "Header2", "Header3").flatMap(chunk.headers.get)
    chunk.copy(pageContent =
      s"Section: ${trail.filter(_.nonEmpty).mkString(" / ")}\n\nContent:\n${chunk.pageContent}")
  }

  /** P13, WEB variant (WEB:160–171): Header1 is the base, Header2..4
    * extend the trail.
    */
  def prependHeaderWeb(chunk: Chunk): Chunk = {
    val trail = Seq("Header1", "Header2", "Header3", "Header4")
      .flatMap(chunk.headers.get)
    chunk.copy(pageContent =
      s"Section: ${trail.filter(_.nonEmpty).mkString(" / ")}\n\nContent:\n${chunk.pageContent}")
  }

  /** One fetched page → enriched chunks: S3 extract → P4–P10 clean →
    * P11 markdown → T1 header split → T2 char split → P12 metadata
    * enrich → P13 prepend. Pure function, runs in a flatMap.
    */
  def pageToChunks(product: Product, url: String, html: String,
      chunkSize: Int = 2048, chunkOverlap: Int = 256): Seq[Chunk] = {
    val (title, body) = HtmlPrep.extractTitleAndBody(html)
    val md = HtmlPrep.htmlToMarkdown(HtmlPrep.cleanHtml(body))
    for {
      section <- Splitters.markdownHeaderSplit(md, Splitters.Headers3)
      piece <- Splitters.recursiveCharSplit(section.content, chunkSize, chunkOverlap)
    } yield prependHeaderRhpd(Chunk(
      pageContent = piece,
      metadata = Map(
        "source" -> url,
        "title" -> title,
        "product" -> product.product,
        "version" -> product.version,
        "language" -> product.language,
        "detected_lang" -> graft.text.LangId.langId(piece),
        "product_full_name" -> product.productFullName),
      headers = section.headers))
  }

  /** RHPD chain (§3.1): catalog → landing page → doc links → pages →
    * chunks, as one Dataset plan. Returns (index_name, chunk) rows ready
    * for the store; `ingestProducts` writes every index from them in a
    * single `partitionBy(index_name)` job.
    */
  def productChunks(spark: SparkSession, products: Seq[Product],
      landingUrl: Product => String, fetcher: Fetcher): Dataset[(String, Chunk)] = {
    import spark.implicits._
    spark.createDataset(products)
      .repartition(math.max(products.size, 1)) // one product per task
      .flatMap { p =>
        val links = fetcher.fetch(landingUrl(p)).toSeq
          .flatMap(HtmlPrep.extractLinks)
        filterDocLinks(links).map(l => (p, l))
      }
      .flatMap { case (p, url) =>
        fetcher.fetch(url).toSeq // error → empty (S4 semantics)
          .flatMap(html => pageToChunks(p, url, html))
          .map(c => (p.indexName, c))
      }
  }

  /** Ingest the RHPD chain into the store in ONE pass (RHPD:267–278
    * groups splits per product index; here the grouping is the writer's
    * own `partitionBy(index_name)` — one job writes every index, instead
    * of one filter-pass + one count job per index). Returns
    * (index, rows appended) per index, from a single grouped count over
    * the same cached frame.
    */
  def ingestProducts(spark: SparkSession, products: Seq[Product],
      landingUrl: Product => String, fetcher: Fetcher,
      embedder: Embedder, store: ParquetVectorStore): Seq[(String, Long)] = {
    import spark.implicits._
    val chunks = productChunks(spark, products, landingUrl, fetcher)
      .map { case (idx, c) =>
        (idx, c.pageContent, c.metadata, c.headers, embedder.embed(c.pageContent))
      }
      .toDF("index_name", "page_content", "metadata", "headers", "embedding")
    writeAndCount(spark, store, chunks)
  }

  /** [[ingestProducts]] with the scale embedding path: embeddings come
    * from [[graft.embed.BatchedEmbed]] — ONE model instance per
    * partition fed `batchSize`-chunk batches — instead of a per-row
    * call. This is the variant a real (seconds-to-load, batch-forward)
    * encoder deploys with; the reference re-instantiated its model once
    * per product index (RHPD:331–339).
    */
  def ingestProductsBatched(spark: SparkSession, products: Seq[Product],
      landingUrl: Product => String, fetcher: Fetcher,
      embedderFactory: () => graft.embed.BatchEmbedder,
      store: ParquetVectorStore, batchSize: Int = 64): Seq[(String, Long)] = {
    import spark.implicits._
    val bare = productChunks(spark, products, landingUrl, fetcher)
      .map { case (idx, c) => (idx, c.pageContent, c.metadata, c.headers) }
      .toDF("index_name", "page_content", "metadata", "headers")
    val chunks = graft.embed.BatchedEmbed.embedAll(
      bare, "page_content", "embedding", embedderFactory, batchSize)
    writeAndCount(spark, store, chunks)
  }

  /** One partitionBy write job + one grouped count over the same cached
    * frame — shared tail of both ingest variants.
    */
  private def writeAndCount(spark: SparkSession, store: ParquetVectorStore,
      chunksDf: DataFrame): Seq[(String, Long)] = {
    import spark.implicits._
    val chunks = chunksDf.cache()
    try {
      store.appendAll(chunks)
      chunks.groupBy(col("index_name"))
        .agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toSeq.sortBy(_._1)
    } finally chunks.unpersist()
  }

  /** WEB chain (§3.2; WEB:140–198): one (url, index) pair → fetch →
    * markdown → 4-level split → char split → WEB prepend + source stamp
    * (P15) → embed → idempotent create + append.
    */
  def ingestWebsite(spark: SparkSession, url: String, indexName: String,
      fetcher: Fetcher, embedder: Embedder, store: ParquetVectorStore,
      chunkSize: Int = 2048, chunkOverlap: Int = 256): Long = {
    import spark.implicits._
    store.createIndex(indexName) // D1 first, like WEB:102–138
    val chunks = spark.createDataset(Seq(url))
      .flatMap { u =>
        fetcher.fetch(u).toSeq.flatMap { html =>
          val md = HtmlPrep.htmlToMarkdown(html)
          for {
            section <- Splitters.markdownHeaderSplit(md, Splitters.Headers4)
            piece <- Splitters.recursiveCharSplit(section.content, chunkSize, chunkOverlap)
          } yield prependHeaderWeb(Chunk(piece,
            Map("source" -> u), section.headers)) // P15 source stamp
        }
      }
      .map(c => (c.pageContent, c.metadata, c.headers, embedder.embed(c.pageContent)))
      .toDF("page_content", "metadata", "headers", "embedding")
    store.append(indexName, chunks)
    store.count(indexName)
  }

  /** E5/S5: JSON checkpoint between the format and ingest stages — the
    * engine's stand-in for the reference's KFP artifact handoff
    * (RHPD:280–282, 305–309), preserving restartability.
    */
  def writeCheckpoint(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readCheckpoint(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
