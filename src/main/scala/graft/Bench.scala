package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one warmup pass then median-of-3 timed runs per query.
  *
  * Round 2→3 proved single-run numbers on local[N] are noise-dominated
  * (byte-identical code swung individual queries ~3×): warmup absorbs JVM
  * JIT + parquet-footer caching, the median absorbs GC/scheduler jitter.
  *
  * Failures are LOUD: a failed query is reported in "failed", excluded
  * from the total, timed as -1, and the process exits nonzero — a broken
  * query must never read as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Full materialization via the noop sink: every column is computed and
    // serialized exactly as a real write would, but nothing hits disk. A
    // bare count() would let Catalyst prune all payload columns, so
    // projection-heavy queries would be timed as near-no-ops.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        timeOnce(fn) // warmup: JIT, codegen cache, file-footer cache
        val runs = Seq.fill(3)(timeOnce(fn)).sorted
        name -> Right(runs(1)) // median
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> Left(e.getClass.getSimpleName)
      }
    }
    val qs = results.map {
      case (k, Right(v)) => s"\"$k\":$v"
      case (k, Left(_)) => s"\"$k\":-1"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(_)) => s"\"$k\"" }
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
