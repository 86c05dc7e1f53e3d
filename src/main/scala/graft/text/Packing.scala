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
  * ONE shuffle. Each group's docs are folded in doc-id order; a group
  * must fit an executor (at corpus scale, size `groups` so a group is
  * shard-sized — the same contract as any per-shard packer). A document
  * larger than the budget gets a pack of its own.
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
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (grp, it) =>
        val ds = it.toSeq.sortBy(_._1)
        var pack = 0L
        var filled = 0L
        ds.iterator.map { case (id, n, _) =>
          if (filled > 0 && filled + n > budget) { pack += 1; filled = n }
          else filled += n
          (id, grp, pack)
        }
      }
      .toDF("doc_id", "grp", "pack_id")
  }
}
