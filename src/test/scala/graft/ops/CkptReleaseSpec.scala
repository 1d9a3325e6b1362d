package graft.ops

import graft.SparkTestBase
import graft.ops.Ckpt.CkptSyntax
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** Ckpt.release: explicit block reclamation for SUPERSEDED barriers —
  * the growing-index folds replace a pinned image every batch, and
  * without release two-plus full images stay resident until the
  * ContextCleaner notices (the round-17 40 GiB-driver soak note).
  * Pins: release actually unpersists, is a no-op on plain frames, and
  * the s39-shaped fold keeps at most the LIVE generation pinned
  * between batches while still answering correctly. */
class CkptReleaseSpec extends AnyFunSuite with SparkTestBase {

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("release unpersists a local checkpoint's blocks; no-op on plain frames") {
    val a = spark.range(1000).toDF("id").localCheckpoint(eager = true)
    val ids = ColumnBridge.checkpointRddIds(a)
    assert(ids.nonEmpty)
    assert(ids.forall(persistentIds.contains),
      "eager local checkpoint must register persistent blocks")
    assert(Ckpt.release(a) === ids.size)
    assert(ids.forall(!persistentIds.contains(_)),
      "released checkpoint still registered with the BlockManager")
    // plain (never-checkpointed) frame: nothing to release, no error
    assert(Ckpt.release(spark.range(10).toDF("id")) === 0)
  }

  test("growing-index fold: superseded generations leave the BlockManager, live one survives") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("shared body of running text number "),
        col("id").cast("string"), lit(" with trailing filler words")
      ).as("text"))
    val idx0 = Dedup.nearDupIndex(docs, "doc_id", "text")
    var idx = idx0.copy(fingerprints = idx0.fingerprints.ckpt,
      bands = idx0.bands.ckpt, hashes = idx0.hashes.ckpt)
    def imageIds(i: Dedup.NearDupIndex): Seq[Int] =
      ColumnBridge.checkpointRddIds(i.fingerprints) ++
        ColumnBridge.checkpointRddIds(i.bands) ++
        ColumnBridge.checkpointRddIds(i.hashes)
    var superseded = Seq.empty[Int]
    (0 until 3).foreach { b =>
      val batch = docs.filter(col("doc_id") % 3 === b)
        .select((col("doc_id") + 100000L * (b + 1)).as("doc_id"),
          reverse(col("text")).as("text"))
      val adm = Dedup.nearDupFilter(idx, batch, "doc_id", "text",
        tau = 0.5).ckpt
      adm.count()
      val grown = Dedup.NearDupIndex.extend(idx, adm, "doc_id", "text")
      val prev = idx
      idx = grown.copy(fingerprints = grown.fingerprints.ckpt,
        bands = grown.bands.ckpt, hashes = grown.hashes.ckpt)
      Ckpt.release(prev.fingerprints)
      Ckpt.release(prev.bands)
      Ckpt.release(prev.hashes)
      Ckpt.release(adm)
      superseded ++= imageIds(prev) ++ ColumnBridge.checkpointRddIds(adm)
      // BETWEEN BATCHES: zero superseded images registered with the
      // BlockManager — the residency contract the 50x soak needs to fit
      // the default heap
      val live = persistentIds
      assert(superseded.forall(!live.contains(_)),
        s"round $b: a superseded generation is still registered")
      assert(imageIds(idx).forall(live.contains),
        s"round $b: the LIVE generation must stay pinned")
    }
    // the live image still serves reads after all predecessors released
    assert(idx.bands.count() > 0 && idx.hashes.count() > 0 &&
      idx.fingerprints.count() > 0)
  }
}
