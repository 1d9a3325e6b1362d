package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Explicit semi-join reduction: filter the big side of a join through
  * a Bloom filter of the small side's keys BEFORE the shuffle.
  *
  * Equivalent by construction (no false negatives; false positives die
  * in the real join), so gate q50 oracles it with the plain join — the
  * point is the plan: at 100 TB the fact-side exchange shrinks by the
  * dim selectivity, which is the difference between shuffling 100 TB
  * and shuffling the ~1% that can actually join. Spark's
  * InjectRuntimeFilter does this opportunistically under size/ratio
  * heuristics; this call is deterministic and caller-controlled (you
  * know your dim is selective — say so).
  */
object BloomPrune {

  /** Serialized Bloom filter of `key` over `dim` (one distributed
    * aggregate; ~1.2 bytes/item at 1% fpp). */
  def buildFilter(dim: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `fact` reduced to rows whose `factKey` might join `dim.dimKey`. */
  def pruned(fact: DataFrame, factKey: String, filterBytes: Array[Byte]): DataFrame =
    fact.filter(ColumnBridge.column(graft.functions.BloomMightContain(
      ColumnBridge.expression(col(factKey)), filterBytes)))

  /** Inner equi-join with the fact side Bloom-pruned first. Result is
    * row-identical to `fact.join(dim, fact(factKey) === dim(dimKey))`. */
  def prunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(dim, dimKey, expectedItems, fpp)
    pruned(fact, factKey, bytes).join(dim, col(factKey) === dim(dimKey))
  }
}
