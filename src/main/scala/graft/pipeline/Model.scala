package graft.pipeline

/** Typed spine of the ingestion pipelines (SURVEY.md §1.1).
  * Citations: kfp/redhat-product-documentation-ingestor/
  * ingestion-pipeline.py (RHPD) unless noted.
  */

/** Ingest work item (RHPD:12–17). */
final case class Product(
    product: String,
    productFullName: String,
    version: String,
    language: String) {

  /** P14 (RHPD:271 + RHPD-ES:349): "{product}_{language}_{version}" with
    * `-` and `.` mapped to `_`; lowercased (the ES variant lowercases,
    * and one canonical casing keeps the store's catalog unambiguous).
    */
  def indexName: String =
    s"${product}_${language}_$version".replace("-", "_")
      .replace(".", "_").toLowerCase
}

/** A fetched document before splitting (RHPD:160–162): page content plus
  * open metadata (source URL, title, then product fields after enrich).
  */
final case class Doc(pageContent: String, metadata: Map[String, String])

/** A post-split chunk (RHPD:218–241): content with accumulated metadata
  * and the markdown header trail (Header1..Header4 as present).
  */
final case class Chunk(
    pageContent: String,
    metadata: Map[String, String],
    headers: Map[String, String])
