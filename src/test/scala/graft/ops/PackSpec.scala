package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CorpusOps.pack / repetitionSignals / Similarity.knnJoin — the round-5
  * training-pipeline additions. Cross-engine value parity is the e7/d24/
  * d25 oracle gates' job; these specs pin the semantics on hand-checked
  * fixtures and the plan shapes the ops promise. */
class PackSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("pack assigns each doc the sequence of its start offset") {
    // group a: token counts 3, 4, 2, 5 with budget 6 →
    // starts 0,3,7,9 → seqs 0,0,1,1
    val docs = Seq(
      (0L, "a", "t t t"), (1L, "a", "t t t t"),
      (2L, "a", "t t"), (3L, "a", "t t t t t"),
      (10L, "b", "x x x x x x x x")) // one doc alone in its group
      .toDF("doc_id", "lang", "text")
    val out = CorpusOps.pack(docs, "doc_id", "text", "lang", budget = 6L)
      .orderBy("grp", "seq_id").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq === Seq(
      ("a", 0L, 2L, 7L, 0L, 1L),   // docs 0,1 — 7 tokens, starts 0 and 3
      ("a", 1L, 2L, 7L, 2L, 3L),   // docs 2,3 — starts 7 and 9
      ("b", 0L, 1L, 8L, 10L, 10L)))
  }

  test("pack totals conserve the corpus token count") {
    val docs = Seq.tabulate(100)(i => (i.toLong, s"g${i % 3}",
      Seq.fill(i % 7 + 1)("w").mkString(" "))).toDF("doc_id", "lang", "text")
    val packed = CorpusOps.pack(docs, "doc_id", "text", "lang", budget = 10L)
    val total = packed.agg(sum("n_tokens")).as[Long].head()
    val expect = (0 until 100).map(_ % 7 + 1).sum.toLong
    assert(total === expect)
    assert(packed.agg(sum("n_docs")).as[Long].head() === 100L)
  }

  test("repetitionSignals flags degenerate repetition and clean text") {
    val docs = Seq(
      (1L, "spam spam spam spam"),        // every bigram identical
      (2L, "one two three four five"))    // all n-grams distinct
      .toDF("doc_id", "text")
    val out = CorpusOps.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 3 bigrams all "spam spam" → top frac 1.0; dup trigrams 2/2 → 1.0
    assert(out(0).getDouble(1) === 1.0 && out(0).getDouble(2) === 1.0)
    // doc 2: 4 distinct bigrams → 1/4; no repeated trigram → 0.0
    assert(out(1).getDouble(1) === 0.25 && out(1).getDouble(2) === 0.0)
  }

  test("knnJoin agrees with per-query search over the probed cells") {
    // deterministic vectors; ids 0..7 seed the coarse quantizer
    val vecs = Seq.tabulate(40) { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 3 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 8)
    val joined = idx.knnJoin(k = 3, nprobe = 2).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq).toMap
    // spot-check three queries against the single-query search path,
    // self excluded the same way
    for (qid <- Seq(0L, 17L, 39L)) {
      val q = vecs.filter(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>")).collect()(0)
        .getAs[scala.collection.Seq[Double]](0).toArray
      val viaSearch = idx.search(q, k = 4, nprobe = 2).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).filter(_._1 != qid).take(3).toSeq
      assert(joined(qid) === viaSearch, s"query $qid")
    }
    // ranks are 1-based and dense per query
    assert(joined.values.forall(_.nonEmpty))
  }

  test("scoreLinear: hand-computed hashed-model scores, broadcast model join") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "alpha beta alpha"),     // tf: alpha 2, beta 1
      (2L, "beta"),
      (3L, "")                      // empty → no output row
    ).toDF("doc_id", "text")
    // weights: bucket -> bucket + 1 over dim 8
    val model = spark.range(8).select(col("id").as("bucket"),
      (col("id") + 1).as("weight"))
    val got = CorpusOps.scoreLinear(docs, "doc_id", "text", model, dim = 8)
    // expected: score = Σ tf · (bucket(token) + 1), buckets via the same
    // portable hash the engine uses
    val b = docs.sparkSession.range(1)
      .select(pmod(TextFunctions.h64(lit("alpha")), lit(8L)).as("a"),
        pmod(TextFunctions.h64(lit("beta")), lit(8L)).as("b"))
      .collect()(0)
    val (ba, bb) = (b.getLong(0), b.getLong(1))
    val rows = got.orderBy("doc").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq(
      (1L, 2 * (ba + 1) + 1 * (bb + 1)),
      (2L, bb + 1)))
    // model side must broadcast — never a shuffled join on bucket
    got.collect()
    assert(got.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "expected the model join to broadcast")
    // unknown buckets weigh zero: empty model → all scores = bias
    val zero = CorpusOps.scoreLinear(docs, "doc_id", "text",
      model.filter(lit(false)), dim = 8, bias = 7L)
    assert(zero.collect().map(_.getLong(1)).toSet == Set(7L))
  }

  test("knnJoin reduces with a bounded-heap aggregate, not a window sort") {
    val vecs = Seq.tabulate(24) { i =>
      (i.toLong, Array.tabulate(4)(j => (i * 5 + j * 3 % 11).toFloat))
    }.toDF("vec_id", "embedding")
    val plan = Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 8)
      .knnJoin(k = 2, nprobe = 2).queryExecution.executedPlan
    assert(!plan.toString.contains("Window"),
      s"expected no Window operator in:\n$plan")
  }

  // ---- gopherRules: per-rule verdicts on hand-checked fixtures -----

  private def gopher(rows: Seq[(Long, String)]): Map[Long, (Boolean, Boolean, Boolean, Boolean)] =
    CorpusOps.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text",
        minWords = 3, maxWords = 6, minMeanLen = 2, maxMeanLen = 4,
        stopwords = Seq("the", "a"), minStopwords = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))))
      .toMap

  test("gopherRules: each rule fires independently and keep is their AND") {
    val v = gopher(Seq(
      (1L, "the cat sat on mats"), // 5 words, 15 letters, mean 3, has 'the' → keep
      (2L, "xx yy"),               // too few words
      (3L, "the aa bb cc dd ee ff gg"), // too many words
      (4L, "the x y z w"),         // 5 words, 8 letters → mean < 2
      (5L, "cat dog fox owl")))    // no stopword
    assert(v(1L) === ((true, true, true, true)))
    assert(v(2L)._1 === false && v(2L)._4 === false)
    assert(v(3L)._1 === false && v(3L)._4 === false)
    assert(v(4L) === ((true, false, true, false)))
    assert(v(5L) === ((true, true, false, false)))
  }

  test("gopherRules: stopword rule counts DISTINCT panel members, not occurrences") {
    // 'the' repeated 4 times is still one distinct stopword
    val out = CorpusOps.gopherRules(
        Seq((1L, "the the the the cats")).toDF("doc_id", "text"),
        "doc_id", "text", minWords = 1, maxWords = 100,
        minMeanLen = 1, maxMeanLen = 10,
        stopwords = Seq("the", "a"), minStopwords = 2)
      .collect()(0)
    assert(out.getInt(3) === 1 && out.getBoolean(6) === false)
  }

  test("knnJoinFiltered: eligible-everything equals knnJoin; filter restricts " +
      "neighbors without losing eligible ones") {
    val vecs = Seq.tabulate(40) { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 3 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndexSeeded(vecs, "vec_id", "embedding", nlist = 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    val all = vecs.select(col("vec_id").as("id"))
    assert(rows(idx.knnJoinFiltered(3, 2, all)) === rows(idx.knnJoin(3, 2)))

    // odd ids only: every neighbor odd, and the result is EXACTLY the
    // unfiltered candidate list minus even neighbors, re-ranked — the
    // pre-filter keeps eligible neighbors a post-filter would drop
    val odd = vecs.filter(col("vec_id") % 2 === 1).select(col("vec_id").as("id"))
    val filtered = rows(idx.knnJoinFiltered(3, 2, odd))
    assert(filtered.nonEmpty && filtered.forall(_._3 % 2 == 1))
    val postFiltered = rows(idx.knnJoin(3, 2)).filter(_._3 % 2 == 1)
    // post-filtering returns no MORE than the pre-filtered set per query
    val perQueryPre = filtered.groupBy(_._1).view.mapValues(_.size)
    val perQueryPost = postFiltered.groupBy(_._1).view.mapValues(_.size)
    assert(perQueryPost.forall { case (q, n) => perQueryPre(q) >= n })
  }

  test("gopherRules plans as a pure projection — no exchange, no aggregate") {
    val plan = CorpusOps.gopherRules(
        Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Aggregate"), plan)
  }
}
