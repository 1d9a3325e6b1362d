package graft.plans

import graft.SparkTestBase
import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/** 100 TB shuffle hygiene, plan-asserted: the candidate-pair stages of
  * the dedup/similarity pipelines must never move document TEXT through
  * an exchange — only ids, hashes, band/bucket keys and (for the vector
  * ops, by design) the vectors themselves. A regression that widens a
  * shuffle to carry text would still pass value-level oracles while
  * multiplying wire bytes by the document size at scale; this spec
  * pins the property structurally. */
class ShuffleHygieneSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def docs: DataFrame = (0L until 400L).map { i =>
    val words = (0 until 30).map(j => s"w${(i * 31 + j * 7) % 97}")
    (i, words.mkString(" ") + (if (i % 5 == 0) " copyable tail" else ""))
  }.toDF("doc_id", "text")

  /** Column names crossing every shuffle of `df`'s executed plan
    * (AQE-final, query stages unwrapped). The action must run on df's
    * OWN Dataset — count() would execute a separate QueryExecution and
    * leave df's AdaptiveSparkPlanExec unfinalized. */
  private def shuffledColumns(df: DataFrame): Set[String] = {
    df.collect() // finalize THIS plan's AQE stages
    def all(p: SparkPlan): Seq[SparkPlan] =
      p.collectWithSubqueries { case n => n }.flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: all(q.plan)
        case n => Seq(n)
      }
    val nodes = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        all(a.executedPlan)
      case p => all(p)
    }
    nodes.collect { case e: ShuffleExchangeLike => e }
      .flatMap(_.child.output.map(a => s"${a.name}:${a.dataType.simpleString}"))
      .toSet
  }

  test("minhashLshPairs shuffles carry no text — ids, hashes, buckets only") {
    val cols = shuffledColumns(
      Dedup.minhashLshPairs(docs, "doc_id", "text", k = 6, bands = 3))
    assert(cols.nonEmpty, "expected at least one exchange")
    assert(!cols.exists(_.startsWith("text:")), s"text crossed a shuffle: $cols")
    // nothing string-typed except the md5 band-bucket key
    val strings = cols.filter(_.endsWith(":string")).map(_.split(':')(0))
    assert(strings.subsetOf(Set("bucket")),
      s"unexpected string column(s) in a shuffle: $strings")
  }

  test("allPairsJaccard shuffles carry no text") {
    val cols = shuffledColumns(
      Dedup.allPairsJaccard(docs, "doc_id", "text", shingleSize = 3, tau = 0.5))
    assert(cols.nonEmpty)
    assert(!cols.exists(_.startsWith("text:")), s"text crossed a shuffle: $cols")
    assert(!cols.exists(_.endsWith(":string")),
      s"string column(s) in a shuffle: $cols")
  }

  test("dedupCorpus end-to-end shuffles carry no text") {
    val cols = shuffledColumns(
      Dedup.dedupCorpus(docs, "doc_id", "text", k = 6, bands = 3))
    assert(cols.nonEmpty)
    assert(!cols.exists(_.startsWith("text:")), s"text crossed a shuffle: $cols")
  }

  test("budgetedMix shuffles carry token counts and keys — never text") {
    val src = docs.withColumn("source",
      concat(lit("s"), pmod(col("doc_id"), lit(3)).cast("string")))
    val budgets = Seq(("s0", 500L), ("s1", 800L), ("s2", 200L))
      .toDF("source", "budget")
    val cols = shuffledColumns(graft.ops.CorpusOps.budgetedMix(
      src, "doc_id", "text", "source", budgets, bucketSize = 64L))
    assert(cols.nonEmpty, "expected at least one exchange")
    assert(!cols.exists(_.startsWith("text:")), s"text crossed a shuffle: $cols")
    // the only string allowed through a shuffle is the (small) source key
    val strings = cols.filter(_.endsWith(":string")).map(_.split(':')(0))
    assert(strings.subsetOf(Set("graft_src", "source")),
      s"unexpected string column(s) in a shuffle: $strings")
  }

  test("epochPlan shuffles carry token counts and keys — never text") {
    val src = docs.withColumn("source",
      concat(lit("s"), pmod(col("doc_id"), lit(3)).cast("string")))
    // s0 upsamples (budget >> corpus), s1 fractional, s2 tiny — all three
    // epoch paths exercised through the plan under test
    val budgets = Seq(("s0", 50000L), ("s1", 800L), ("s2", 200L))
      .toDF("source", "budget")
    val cols = shuffledColumns(graft.ops.CorpusOps.epochPlan(
      src, "doc_id", "text", "source", budgets, bucketSize = 64L))
    assert(cols.nonEmpty, "expected at least one exchange")
    assert(!cols.exists(_.startsWith("text:")), s"text crossed a shuffle: $cols")
    val strings = cols.filter(_.endsWith(":string")).map(_.split(':')(0))
    assert(strings.subsetOf(Set("graft_src", "source")),
      s"unexpected string column(s) in a shuffle: $strings")
  }

  test("frequentNgrams shuffles carry (doc, ngram, counts) — never document text") {
    val cols = shuffledColumns(graft.ops.CorpusOps.frequentNgrams(
      docs, "doc_id", "text", n = 3, minDocFreq = 2))
    assert(cols.nonEmpty, "expected at least one exchange")
    assert(!cols.exists(_.startsWith("text:")), s"text crossed a shuffle: $cols")
    // the shuffled unit is an n-word shingle (the op's OUTPUT grain),
    // never a document — the only string allowed through is `ngram`
    val strings = cols.filter(_.endsWith(":string")).map(_.split(':')(0))
    assert(strings.subsetOf(Set("ngram")),
      s"unexpected string column(s) in a shuffle: $strings")
  }

  test("vectorNearDupFilter shuffles carry ids, buckets and vectors — no strings") {
    val corpus = (0L until 200L).map { i =>
      (i, Seq.tabulate(8)(d => ((i * 13 + d * 7) % 29) / 29.0))
    }.toDF("vec_id", "v")
    val idx = Dedup.vectorNearDupIndex(corpus, "vec_id", "v", dim = 8, bits = 5)
      .localCheckpoint(eager = true)
    val batch = (1000L until 1100L).map { i =>
      (i, Seq.tabulate(8)(d => ((i * 17 + d * 5) % 31) / 31.0))
    }.toDF("vec_id", "v")
    val cols = shuffledColumns(Dedup.vectorNearDupFilter(idx, batch,
      "vec_id", "v", dim = 8, bits = 5, tau = 0.9))
    assert(!cols.exists(_.endsWith(":string")),
      s"string column(s) in a shuffle: $cols")
  }

  test("IVF knnJoin shuffles carry ids, cells and vectors — nothing else") {
    val emb = (0L until 300L).map { i =>
      (i, Array.tabulate(16)(d => (((i * 13 + d * 7) % 29) / 29.0).toFloat))
    }.toDF("vec_id", "embedding")
    val cols = shuffledColumns(
      Similarity.ivfIndexSeeded(emb, "vec_id", "embedding", nlist = 4)
        .knnJoin(k = 3, nprobe = 2))
    assert(cols.nonEmpty)
    assert(!cols.exists(c => c.endsWith(":string")),
      s"string column(s) in a knnJoin shuffle: $cols")
  }

  test("containmentPairs shuffles carry no text") {
    val cols = shuffledColumns(
      Dedup.containmentPairs(docs, "doc_id", "text", shingleSize = 3, tau = 0.8))
    assert(cols.nonEmpty)
    assert(!cols.exists(_.startsWith("text:")), s"text crossed a shuffle: $cols")
    assert(!cols.exists(_.endsWith(":string")),
      s"string column(s) in a shuffle: $cols")
  }

  test("label propagation and k-core shuffle nothing string-typed") {
    // no text exists in a graph op, but a regression that joined doc
    // payloads into the loop would surface here as a widened exchange
    val edges = (0L until 300L).map(i => (i % 25, (i * 7 + 3) % 25))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val lpa = shuffledColumns(
      graft.ops.Graph.labelPropagation(edges, "src", "dst", 2))
    assert(lpa.nonEmpty && !lpa.exists(_.endsWith(":string")),
      s"string column(s) in an LPA shuffle: $lpa")
    // dense graph: a fully-peeled (empty) core is AQE-propagated to a
    // LocalTableScan with NO exchanges, which would vacuously pass
    val dense = (0L until 400L).map(i => (i / 20, i % 20))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val kc = shuffledColumns(graft.ops.Graph.kCore(dense, "src", "dst", 5, 2))
    assert(kc.nonEmpty && !kc.exists(_.endsWith(":string")),
      s"string column(s) in a k-core shuffle: $kc")
  }

  test("rrfFuse shuffles carry rank triples and heap buffers, never strings") {
    val lex = (0L until 50L).map(i => (i % 5, i, i % 20 + 1)).toDF("qid", "id", "rank")
    val sem = (0L until 50L).map(i => (i % 5, (i * 7) % 50, i % 20 + 1)).toDF("qid", "id", "rank")
    val cols = shuffledColumns(
      Similarity.rrfFuse(Seq(lex, sem), "qid", "id", "rank", k = 5))
    assert(cols.nonEmpty)
    assert(!cols.exists(_.endsWith(":string")),
      s"string column(s) in an rrfFuse shuffle: $cols")
  }

  private def embCorpus: DataFrame = (0L until 300L).map { i =>
    (i, Array.tabulate(16)(d => ((i * 13 + d * 7) % 29) / 29.0))
  }.toDF("vec_id", "embedding")

  private def noVectors(cols: Set[String], op: String): Unit = {
    assert(cols.nonEmpty, s"$op: expected at least one exchange")
    assert(!cols.exists(c => c.startsWith("embedding:") ||
      c.startsWith("qv:") || c.startsWith("v:") ||
      c.endsWith(":array<double>") || c.endsWith(":array<float>")),
      s"$op: a vector crossed a shuffle: $cols")
  }

  test("pqAdcTopK shuffles carry codes and LUT terms — never vectors") {
    // the PQ promise: query-time exchanges move (qid, id, sub, code,
    // qdist) and heap buffers; the 16-d vectors stay in the scan /
    // driver panels
    val emb = embCorpus
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    noVectors(shuffledColumns(Similarity.pqAdcTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", m = 4, k = 4, topK = 3)), "pqAdcTopK")
  }

  test("ivfPqTopK shuffles never carry vectors either") {
    val emb = embCorpus
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val idx = Similarity.ivfIndexSeeded(emb, "vec_id", "embedding", nlist = 4)
    noVectors(shuffledColumns(Similarity.ivfPqTopK(idx, emb, "vec_id",
      "embedding", queries, "qid", "qv", m = 4, k = 4, nprobe = 2, topK = 3)),
      "ivfPqTopK")
  }

  test("sq8TopK shuffles carry scores and heap buffers — never codes or vectors") {
    val emb = embCorpus
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cols = shuffledColumns(Similarity.sq8TopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 3))
    noVectors(cols, "sq8TopK")
    // the int8 code arrays are consumed by the score projection BEFORE
    // the TopK exchange — nothing array-of-int crosses either
    assert(!cols.exists(_.endsWith(":array<int>")),
      s"int8 codes crossed a shuffle: $cols")
  }

  test("randomWalks shuffles carry longs only — no strings, no arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val edges = (0 until 500).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)).toDF("src", "dst")
    val cols = shuffledColumns(
      graft.ops.Graph.randomWalks(edges, "src", "dst", nWalks = 2, steps = 2))
    assert(cols.nonEmpty)
    assert(cols.forall(c => c.endsWith(":bigint") || c.endsWith(":int") ||
      c.endsWith(":long")), s"non-scalar column crossed a walk shuffle: $cols")
  }

  test("gridDensityClusters shuffles carry cell/cluster scalars only") {
    import spark.implicits._
    val pts = (0 until 500).map(i =>
      (i.toLong, (i % 13) * 0.07 - 0.4, (i % 7) * 0.11 - 0.35))
      .toDF("id", "x", "y")
    val cols = shuffledColumns(graft.ops.Similarity.gridDensityClusters(
      pts, "id", col("x"), col("y"), 1000.0, 100.0, minPts = 10L))
    assert(cols.nonEmpty)
    assert(cols.forall(c => c.endsWith(":bigint") || c.endsWith(":int") ||
      c.endsWith(":long") || c.endsWith(":double")),
      s"non-scalar column crossed a density shuffle: $cols")
  }

  test("hammingFilter64 shuffles carry ids, chunks and 8-byte hashes — " +
      "payloads never") {
    import spark.implicits._
    // binary payload column rides along on the incoming side; the
    // admission join must shuffle only (id, chunk, key, hash)
    val index = (0 until 200).map(i => (i.toLong, i.toLong * 65536L))
      .toDF("media_id", "ph")
    val in = (0 until 200).map(i => (10000L + i, i.toLong * 65536L + (i % 7),
      Array.fill(64)(i.toByte))).toDF("media_id", "ph", "payload")
    val out = graft.ops.Dedup.hammingFilter64(index, in, "media_id", "ph",
      maxHamming = 3)
    val cols = shuffledColumns(out)
    assert(cols.nonEmpty)
    assert(!cols.exists(_.startsWith("payload:")),
      s"payload bytes crossed an admission shuffle: $cols")
    assert(!cols.exists(_.endsWith(":binary")),
      s"binary column in an admission shuffle: $cols")
  }
}
