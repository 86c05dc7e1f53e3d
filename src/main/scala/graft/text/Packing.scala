package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{TextFunctions => TF}

/** Sequence packing: greedily bin documents into fixed-token-budget
  * packs — the step that turns a filtered corpus into training
  * sequences (padding waste is the cost of unpacked batches; greedy
  * first-fit in a stable order is the standard cheap packer).
  *
  * Scale shape: packing is inherently sequential, so it runs PER HASH
  * GROUP — `grp = doc_id % groups` — and groups pack in parallel after
  * ONE shuffle. The shuffle is a SECONDARY SORT (repartition by grp +
  * disk-spillable sortWithinPartitions on (grp, doc_id)), and the fold
  * is a pure iterator pass with O(1) state — a group never materializes
  * in memory, so group sizing only bounds sequential work per task, not
  * heap. A document larger than the budget gets a pack of its own.
  *
  * Deterministic end to end (stable grouping, stable order, pure fold)
  * — the d26 oracle re-derives the exact assignment with a per-group
  * linear recursion in SQL.
  */
object Packing {

  /** (doc_id, grp, pack_id): pack_id is local to the group, counting
    * from 0 in doc-id order.
    */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, groups: Int): DataFrame = {
    require(budget > 0 && groups > 0)
    import docs.sparkSession.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(TF.tokens(col(textCol))).cast("long").as("n_tok"))
      .withColumn("grp", pmod(col("doc_id"), lit(groups.toLong)))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // Iterator fold over the secondary-sorted rows: group changes
        // reset the running (pack, filled) — no per-group buffering.
        var curGrp = -1L
        var pack = 0L
        var filled = 0L
        it.map { case (id, n, grp) =>
          if (grp != curGrp) { curGrp = grp; pack = 0L; filled = 0L }
          if (filled > 0 && filled + n > budget) { pack += 1; filled = n }
          else filled += n
          (id, grp, pack)
        }
      }
      .toDF("doc_id", "grp", "pack_id")
  }
}
