package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IvfIndex / PqCodebook disk round trips — the build-once / probe-many
  * contract (gate e28/e29 prove oracle parity; these pin structural
  * equality load(save(x)) ≡ x and the on-disk layout). */
class IndexPersistenceSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def vecs = Seq.tabulate(40)(i =>
    (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
    .toDF("vec_id", "embedding")

  test("IvfIndex load(save(idx)) preserves centroids and assignment rows") {
    val idx = Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 4)
    val path = s"${tmp("ivf")}/idx"
    Similarity.IvfIndex.save(idx, path)
    val loaded = Similarity.IvfIndex.load(path)

    assert(loaded.centroids.length === idx.centroids.length)
    loaded.centroids.zip(idx.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq) // bit-exact doubles through parquet
    }
    def rows(i: Similarity.IvfIndex) = i.assigned
      .select("id", "v", "vnorm", "cell")
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toSeq,
        r.getDouble(2), r.getInt(3))).toSet
    assert(rows(loaded) === rows(idx))
  }

  test("loaded IvfIndex replays knnJoin bit-exactly") {
    val idx = Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 4)
    val path = s"${tmp("ivf-knn")}/idx"
    Similarity.IvfIndex.save(idx, path)
    val expected = idx.knnJoin(k = 3, nprobe = 2)
      .orderBy("id", "rank").collect().map(_.toSeq)
    val got = Similarity.IvfIndex.load(path).knnJoin(k = 3, nprobe = 2)
      .orderBy("id", "rank").collect().map(_.toSeq)
    assert(expected.nonEmpty)
    assert(got.toSeq === expected.toSeq)
  }

  test("versioned publish: pointer flips, time travel, vacuum retention") {
    val path = s"${tmp("ivf-versions")}/idx"
    val idx1 = Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 4)
    val v1 = Similarity.IvfIndex.publish(idx1, path)
    assert(v1 === 1 && Similarity.IvfIndex.currentVersion(path) === 1)
    // maintain and publish v2 — v1's dir is never touched
    val idx2 = Similarity.IvfIndex.loadCurrent(path)
      .remove(Seq(0L, 1L).toDF("vec_id"), "vec_id")
    val v2 = Similarity.IvfIndex.publish(idx2, path)
    assert(v2 === 2 && Similarity.IvfIndex.currentVersion(path) === 2)
    def ids(i: Similarity.IvfIndex) =
      i.assigned.select("id").as[Long].collect().toSet
    // time travel: the pinned v1 still serves the pre-takedown snapshot
    assert(ids(Similarity.IvfIndex.loadVersion(path, 1)) === ids(idx1))
    assert(ids(Similarity.IvfIndex.loadCurrent(path)) ===
      ids(idx1) -- Set(0L, 1L))
    // vacuum to the newest version only: v1 gone, current unaffected
    assert(Similarity.IvfIndex.vacuumVersions(path, keep = 1) === Seq(1))
    assert(!new java.io.File(s"$path/v1").exists())
    assert(ids(Similarity.IvfIndex.loadCurrent(path)) ===
      ids(idx1) -- Set(0L, 1L))
    intercept[Exception] {
      Similarity.IvfIndex.loadVersion(path, 1).assigned.collect()
    }
  }

  test("versioned publish works for the text and vector-LSH families " +
      "(shared Versions machinery)") {
    // text LSH
    val tPath = s"${tmp("ndx-versions")}/idx"
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    assert(Dedup.NearDupIndex.publish(
      Dedup.nearDupIndex(docs, "doc_id", "text"), tPath) === 1)
    val shrunk = Dedup.NearDupIndex.remove(
      Dedup.NearDupIndex.loadCurrent(tPath),
      docs.filter(col("doc_id") === 0L), "doc_id", "text")
    assert(Dedup.NearDupIndex.publish(shrunk, tPath) === 2)
    assert(Dedup.NearDupIndex.loadVersion(tPath, 1)
      .fingerprints.count() === 2) // time travel: pre-takedown snapshot
    assert(Dedup.NearDupIndex.loadCurrent(tPath).fingerprints.count() === 1)
    assert(Versions.vacuum(tPath, keep = 1) === Seq(1))

    // vector LSH
    val vPath = s"${tmp("vlsh-versions")}/idx"
    val corpus = Seq(
      (0L, Array.tabulate(8)(d => if (d == 0) 10.0 else 0.1)),
      (1L, Array.tabulate(8)(d => if (d == 1) 10.0 else 0.1)))
      .toDF("vec_id", "v")
    val vIdx = Dedup.vectorNearDupIndex(corpus, "vec_id", "v",
      dim = 8, bits = 6)
    assert(Dedup.VectorNearDupIndex.publish(vIdx, 8, 6, vPath) === 1)
    assert(Dedup.VectorNearDupIndex.publish(
      Dedup.VectorNearDupIndex.remove(
        Dedup.VectorNearDupIndex.loadCurrent(vPath).buckets,
        Seq(0L).toDF("id"), "id"), 8, 6, vPath) === 2)
    assert(Dedup.VectorNearDupIndex.loadVersion(vPath, 1)
      .buckets.count() === 2)
    assert(Dedup.VectorNearDupIndex.loadCurrent(vPath).buckets.count() === 1)
    assert(Versions.vacuum(vPath, keep = 1) === Seq(1))
  }

  test("assignment table is cell-partitioned on disk (probe prunes files)") {
    val idx = Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 4)
    val path = s"${tmp("ivf-layout")}/idx"
    Similarity.IvfIndex.save(idx, path)
    val dirs = new java.io.File(s"$path/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("cell=")),
      s"expected cell=N partition dirs, got $dirs")
  }

  test("PqCodebook load(save(cb)) ≡ cb, and the loaded encode matches") {
    val cb = Similarity.PqCodebook.fit(vecs, "vec_id", "embedding", m = 4, k = 4)
    val path = s"${tmp("pq")}/cb"
    Similarity.PqCodebook.save(cb, path)
    val loaded = Similarity.PqCodebook.load(path)

    assert(loaded.m === cb.m && loaded.k === cb.k)
    loaded.seeds.zip(cb.seeds).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
    def codes(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("id", "sub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(
      codes(loaded.encode(vecs, "vec_id", "embedding")) ===
      codes(Similarity.productQuantize(vecs, "vec_id", "embedding", m = 4, k = 4)))
  }

  test("re-publication: a second save REPLACES what load reads") {
    // the round-15 advice bug: overwrite-mode writes were routed through
    // the K2 collision-free path, so save #2 landed in a _<millis>
    // suffix directory and load silently kept returning index #1
    val path = s"${tmp("ivf-republish")}/idx"
    val idx1 = Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 4)
    Similarity.IvfIndex.save(idx1, path)
    val grown = vecs.unionAll(Seq((500L,
      Array.tabulate(8)(j => math.tan(j + 1).toFloat))).toDF("vec_id", "embedding"))
    val idx2 = Similarity.ivfIndexSeeded(grown, "vec_id", "embedding", nlist = 4)
    Similarity.IvfIndex.save(idx2, path)
    val loaded = Similarity.IvfIndex.load(path)
    assert(loaded.assigned.count() === idx2.assigned.count())
    assert(loaded.assigned.filter(col("id") === 500L).count() === 1L,
      "load must see the re-published index, not the stale first save")
    // no suffixed sibling directories left behind by the re-publish
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName)
    assert(parent.toSeq === Seq("idx"), s"unexpected siblings: ${parent.toSeq}")
  }

  test("re-publication: PqCodebook second save wins") {
    val path = s"${tmp("pq-republish")}/cb"
    val cb1 = Similarity.PqCodebook.fit(vecs, "vec_id", "embedding", m = 4, k = 4)
    Similarity.PqCodebook.save(cb1, path)
    val cb2 = Similarity.PqCodebook.fit(vecs, "vec_id", "embedding", m = 2, k = 8)
    Similarity.PqCodebook.save(cb2, path)
    val loaded = Similarity.PqCodebook.load(path)
    assert(loaded.m === 2 && loaded.k === 8,
      "load must see the re-published codebook geometry")
  }

  test("maintenance cycle: save → load → add → remove → save → load ≡ " +
      "batch rebuild over the surviving set") {
    val path = s"${tmp("ivf-cycle")}/idx"
    Similarity.IvfIndex.save(
      Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 4), path)
    val batch = Seq.tabulate(6)(i => (100L + i,
      Array.tabulate(8)(j => math.cos(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val day2 = Similarity.IvfIndex.load(path)
      .addVectors(batch, "vec_id", "embedding")
    val pruned = day2.remove(
      day2.assigned.select(col("id").as("vec_id"))
        .filter(col("vec_id") % 5 === 0), "vec_id")
    Similarity.IvfIndex.save(pruned, path) // re-publish in place
    val loaded = Similarity.IvfIndex.load(path)
    // oracle: one rebuild-shaped index over exactly the surviving set,
    // with the ORIGINAL build's centroids (maintenance never refits)
    val survivors = vecs.unionAll(batch).filter(col("vec_id") % 5 =!= 0)
    val rebuilt = Similarity.IvfIndex(loaded.assigned.limit(0),
        loaded.centroids)
      .addVectors(survivors, "vec_id", "embedding")
    def rows(i: Similarity.IvfIndex) = i.assigned
      .select("id", "v", "vnorm", "cell")
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toSeq,
        r.getDouble(2), r.getInt(3))).toSet
    assert(rows(loaded) === rows(rebuilt))
    assert(!rows(loaded).exists(_._1 % 5 == 0))
    assert(rows(loaded).exists(_._1 >= 100L))
  }

  test("PqCodebook encodes a NEW batch the codebook never saw") {
    // the production shape: codebook trained on day-1 corpus, applied
    // to a later batch without re-derivation (no ids 0..k−1 needed)
    val cb = Similarity.PqCodebook.fit(vecs, "vec_id", "embedding", m = 4, k = 4)
    val path = s"${tmp("pq-batch")}/cb"
    Similarity.PqCodebook.save(cb, path)
    val batch = Seq((1000L, Array.tabulate(8)(j => math.cos(j).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.PqCodebook.load(path)
      .encode(batch, "vec_id", "embedding")
      .collect()
    assert(out.length === 4) // one code per subspace
    assert(out.forall(_.getLong(0) == 1000L))
  }
}
