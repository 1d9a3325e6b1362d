package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 corpus operators: cross-doc boilerplate removal,
  * deterministic splits, temperature domain mixing, distributed
  * gaps-and-islands, fixed-point k-means. */
class MixSplitSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val header = "aa bb cc dd ee ff gg hh" // exactly one 8-token span

  test("removeBoilerplate drops shared spans, keeps unique text in order") {
    val docs = (0 until 8).map(i => (i.toLong, s"$header unique$i text$i here$i")) :+
      (99L, header) // pure-boilerplate doc
    val out = CorpusOps.removeBoilerplate(docs.toDF("doc_id", "text"),
        "doc_id", "text", unit = 8, maxDf = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // every doc keeps only its unique 3-token tail span
    (0 until 8).foreach { i =>
      assert(out(i.toLong) === ((2L, 1L, s"unique$i text$i here$i")))
    }
    // the all-boilerplate doc survives as an empty row, not a dropped one
    assert(out(99L) === ((1L, 0L, "")))
  }

  test("removeBoilerplate under the doc-frequency threshold keeps everything") {
    val docs = (0 until 3).map(i => (i.toLong, s"$header tail$i"))
    val out = CorpusOps.removeBoilerplate(docs.toDF("doc_id", "text"),
        "doc_id", "text", unit = 8, maxDf = 5)
      .collect()
    assert(out.forall(r => r.getLong(1) === r.getLong(2))) // n_spans == n_kept
  }

  test("deterministicSplit is stable under corpus growth and repartitioning") {
    val small = (0L until 100L).toDF("id")
    val large = (0L until 1000L).toDF("id").repartition(7)
    def splits(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.deterministicSplit(df, "id")
        .select("id", "split").as[(Long, String)].collect().toMap
    val s = splits(small)
    val l = splits(large)
    assert(s.forall { case (id, sp) => l(id) == sp }) // growth never reassigns
    val counts = l.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    assert(counts.values.sum === 1000)
  }

  test("deterministicSplit rejects percentages that do not sum to 100") {
    intercept[IllegalArgumentException] {
      CorpusOps.deterministicSplit((0L until 5L).toDF("id"), "id",
        splits = Seq("a" -> 50, "b" -> 20))
    }
  }

  test("temperatureMix upweights minority domains and is repartition-stable") {
    val docs = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small"))).toDF("id", "dom")
    val kept = CorpusOps.temperatureMix(docs, "id", "dom", targetFrac = 0.5)
    val byDom = kept.groupBy("dom").count().as[(String, Long)].collect().toMap
    // α=0.5 weights: w_small/w_big = sqrt(100/900) = 1/3; keep_frac_small
    // = min(1, 500·(1/4)/100) = 1.0 → the whole minority domain survives
    assert(byDom("small") === 100L)
    assert(byDom("big") < 500L && byDom("big") > 300L)
    val fracs = kept.select("dom", "keep_frac").distinct()
      .as[(String, Double)].collect().toMap
    assert(fracs("small") === 1.0)
    val again = CorpusOps.temperatureMix(docs.repartition(13), "id", "dom",
      targetFrac = 0.5).select("id").as[Long].collect().sorted
    assert(again.toSeq === kept.select("id").as[Long].collect().sorted.toSeq)
  }

  test("islands merges runs across bucket boundaries") {
    // bucketWidth 10: run 8..12 spans two buckets; 20 and 25 are singletons
    val keys = Seq(8L, 9L, 10L, 11L, 12L, 20L, 25L).toDF("k")
    val out = Islands.islands(keys, "k", bucketWidth = 10)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((8L, 12L, 5L), (20L, 20L, 1L), (25L, 25L, 1L)))
  }

  test("islands equals the single-sort window formulation on a random set") {
    val keys = (0L until 3000L).filter(k => (k * 2654435761L) % 5 < 3)
    val df = keys.toDF("k").repartition(9)
    val got = Islands.islands(df, "k", bucketWidth = 64)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // reference: classic k - row_number grouping, computed driver-side
    val sorted = keys.sorted
    val want = sorted.zipWithIndex.groupBy { case (k, i) => k - i }
      .values.map { run =>
        val ks = run.map(_._1)
        (ks.min, ks.max, ks.max - ks.min + 1L)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
  }

  test("kmeansFixedPoint recovers separated clusters with exact centroids") {
    // dim 2; ids 0,1 seed the two centroids; cluster A near 0, B near 10
    val pts = Seq(
      (0L, Array(0.0f, 0.1f)), (2L, Array(0.2f, 0.0f)), (3L, Array(0.1f, 0.2f)),
      (1L, Array(10.0f, 10.1f)), (4L, Array(10.2f, 10.0f)), (5L, Array(9.9f, 10.1f)))
    val df = pts.toDF("id", "vec")
    val out = Similarity.kmeansFixedPoint(df, "id", "vec", k = 2, iterations = 2)
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // cluster 0 members: ids 0,2,3 → means of floor(v·1e6); Long `/`
    // truncates toward zero exactly like Spark's `div` and DuckDB's `//`
    def m(xs: Seq[Double]) = {
      val s = xs.map(x => math.floor(x * 1e6).toLong).sum
      s / xs.size
    }
    val exp0x = Seq(0.0, 0.2, 0.1).map(_.toFloat.toDouble)
    val exp0y = Seq(0.1, 0.0, 0.2).map(_.toFloat.toDouble)
    assert(out.filter(_._1 == 0L).map(_._3).toSeq ===
      Seq(m(exp0x), m(exp0y)))
    assert(out.filter(_._1 == 0L).head._4 === 3L) // n_members
    assert(out.filter(_._1 == 1L).head._4 === 3L)
  }

  test("projectTopics equals the hand-computed sparse product") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = CorpusOps.projectTopics(docs, "doc_id", "text", nTopics = 2)
      .as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def w(token: String, topic: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$token|$topic".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    assert(out((1L, 0)) === 2 * w("a", 0) + 1 * w("b", 0))
    assert(out((1L, 1)) === 2 * w("a", 1) + 1 * w("b", 1))
    assert(out((2L, 0)) === w("b", 0) + w("c", 0))
    assert(out.size === 4)
  }

  test("globalRank equals the single-reducer ROW_NUMBER on a total order") {
    val rows = (0L until 2000L).map(i => ((i * 2654435761L) % 997, i))
    val df = rows.toDF("k", "id").repartition(13)
    val ranked = Sequencing.globalRank(df, Seq(col("k"), col("id")))
      .select("rank", "k", "id").as[(Long, Long, Long)].collect().sortBy(_._1)
    val want = rows.sortBy(identity).zipWithIndex
      .map { case ((k, id), i) => (i + 1L, k, id) }
    assert(ranked.toSeq === want)
    // stable under a different input partitioning
    val again = Sequencing.globalRank(df.repartition(3), Seq(col("k"), col("id")))
      .select("rank", "k", "id").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === want)
  }

  test("round-robin-by-decreasing-size shards are balanced within one max item") {
    val docs = (0L until 333L).map(i => (i, ((i * 97) % 400 + 1)))
    val ranked = Sequencing.globalRank(docs.toDF("id", "sz").repartition(7),
      Seq(col("sz").desc, col("id")), "rank")
    val shards = ranked.withColumn("shard", (col("rank") - 1) % 8)
      .groupBy("shard").agg(sum("sz").as("tot"))
      .as[(Long, Long)].collect().map(_._2)
    assert(shards.length === 8)
    assert(docs.map(_._2).sum === shards.sum)
    // LPT-ish bound: spread no worse than the largest single item
    assert(shards.max - shards.min <= 400)
  }

  test("stratifiedExact keeps exactly floor(num·n/den) per stratum, reproducibly") {
    val docs = (0L until 437L).map(i => (i, s"lang${i % 3}"))
      .toDF("doc_id", "lang")
    val kept = CorpusOps.stratifiedExact(docs, "lang", "doc_id",
        num = 1, den = 10, salt = "s-")
      .as[(Long, String)].collect()
    // strata sizes: lang0 146, lang1 146, lang2 145 → keep 14/14/14
    val perLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perLang === Map("lang0" -> 14, "lang1" -> 14, "lang2" -> 14))
    // reproducible: same salt → same rows; different salt → different cut
    val again = CorpusOps.stratifiedExact(docs, "lang", "doc_id", 1, 10, "s-")
      .as[(Long, String)].collect()
    assert(kept.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    val other = CorpusOps.stratifiedExact(docs, "lang", "doc_id", 1, 10, "t-")
      .as[(Long, String)].collect()
    assert(other.map(_._1).toSet !== kept.map(_._1).toSet)
    // num = 0 keeps nothing; num = den keeps everything
    assert(CorpusOps.stratifiedExact(docs, "lang", "doc_id", 0, 10, "s-")
      .count() === 0L)
    assert(CorpusOps.stratifiedExact(docs, "lang", "doc_id", 10, 10, "s-")
      .count() === 437L)
  }

  test("kmeansFixedPoint is bit-identical under repartitioning") {
    val pts = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 31 + d * 17) % 97) / 97.0f)))
    val a = Similarity.kmeansFixedPoint(pts.toDF("id", "vec"), "id", "vec",
      k = 3, iterations = 2).as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val b = Similarity.kmeansFixedPoint(pts.toDF("id", "vec").repartition(11),
      "id", "vec", k = 3, iterations = 2)
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq === b.toSeq)
  }
}
