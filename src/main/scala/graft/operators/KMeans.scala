package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the codebook
  * TRAINER behind the IVF/IVF-PQ indexes (reference scope: the vector
  * store the reference delegates to builds its ANN index server-side;
  * here the index, and therefore its clustering, is a first-class Spark
  * job). `IvfIndex.trainSeeds` picks raw vectors as cells; this refines
  * them so cell populations actually balance at corpus scale.
  *
  * Scale shape per iteration (the only data-sized work):
  *   - ASSIGN: one row-local projection — centroids are a driver-held
  *     codebook (k × dim, bounded) broadcast as literals into a score
  *     array + argmax inside the scan ([[Similarity.ivfAssign]]); no
  *     join, no shuffle.
  *   - RECOMPUTE: one partial+final aggregation keyed by (cluster, dim) —
  *     k × dim result rows collected back to the driver (codebook-sized,
  *     same bounded-driver-state argument as IVF/PQ training).
  * Nothing else touches the data; total cost is `iters` scans + `iters`
  * map-side-combined aggregations.
  *
  * Determinism: metric is cosine (matches the ANN search metric);
  * tie-breaks go to the smallest cluster id (ivfAssign's first-max
  * contract). Means are computed with the fixed-point trick (floor to
  * 1e-9 before summing) so they are partition-order-insensitive, then
  * rounded to float32 for the next round's codebook — byte-identical
  * runs regardless of parallelism. A cluster that loses every member
  * keeps its previous centroid. One assign+mean step from float seeds is
  * oracle-pinned as v08_kmeans_step; multi-iteration behavior (monotone
  * inertia, stable assignment at convergence) is pinned by KMeansSpec.
  */
object KMeans {

  /** Refined codebook after `iters` Lloyd iterations from the k
    * smallest-id vectors as seeds. Returns (seed_id, seed_vec, n_members)
    * — directly consumable by [[Similarity.ivfAssign]] /
    * [[graft.store.IvfIndex]].
    *
    * A corpus with fewer than k vectors fails fast by default (callers
    * sizing cell pruning need exactly k cells); `allowFewerSeeds = true`
    * clamps to one cell per vector instead — the right contract for
    * pipeline stages whose input size is data-dependent
    * ([[SemanticDedup]]: fewer docs than cells just means smaller
    * cells, not a broken run). The seed collect itself already bounds
    * the check — no extra job either way.
    */
  def lloyd(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, allowFewerSeeds: Boolean = false): DataFrame = {
    require(k > 0 && iters > 0, s"k=$k iters=$iters must be positive")
    val spark = df.sparkSession
    val seedRows = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
    require(allowFewerSeeds || seedRows.length == k,
      s"need $k seed vectors, corpus has only ${seedRows.length}")
    require(seedRows.nonEmpty, "cannot train a codebook on an empty corpus")
    var centroids: Seq[(Long, Array[Float])] =
      seedRows.zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Float](0).toArray)
      }.toSeq
    var members = Map.empty[Long, Long]

    for (_ <- 1 to iters) {
      val assigned = assign(df, vecCol, centroids, spark)
      // (cluster, dim)-keyed exact fixed-point means; k*dim rows back.
      val meanRows = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("x").cast("double") * lit(1e9))).cast("double")
            / count(lit(1)) / lit(1e9)).as("m"))
        .collect()
      val byCell = meanRows.groupBy(_.getLong(0))
      members = byCell.map { case (c, rs) => c -> rs.head.getLong(2) }
      centroids = centroids.map { case (c, prev) =>
        byCell.get(c) match {
          case Some(rs) =>
            val m = new Array[Float](prev.length)
            rs.foreach(r => m(r.getInt(1)) = r.getDouble(3).toFloat)
            (c, m)
          case None => (c, prev) // emptied cluster keeps its centroid
        }
      }
    }

    import spark.implicits._
    centroids.map { case (c, v) => (c, v, members.getOrElse(c, 0L)) }
      .toDF("seed_id", "seed_vec", "n_members")
  }

  /** Mean cosine similarity of each vector to its assigned centroid —
    * the (cosine-flavored) inertia KMeansSpec pins as non-decreasing.
    */
  def meanAssignedSimilarity(df: DataFrame, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cs = centroids.select(col("seed_id"), col("seed_vec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    assign(df, vecCol, cs, spark)
      .agg(avg(col("cell_score")).as("mean_sim"))
  }

  /** ivfAssign's score-array/argmax shape from an in-memory codebook,
    * plus the winning score (cell_score) for inertia tracking.
    */
  private def assign(df: DataFrame, vecCol: String,
      centroids: Seq[(Long, Array[Float])], spark: SparkSession): DataFrame = {
    val sorted = centroids.sortBy(_._1)
    val scores = array(sorted.map { case (_, v) =>
      graft.functions.vectors.cosineSimilarity(col(vecCol), lit(v))
    }: _*)
    val cellIds = array(sorted.map { case (id, _) => lit(id) }: _*)
    df.withColumn("cell_score", array_max(scores))
      .withColumn("cell",
        element_at(cellIds,
          array_position(scores, col("cell_score")).cast("int")))
  }
}
