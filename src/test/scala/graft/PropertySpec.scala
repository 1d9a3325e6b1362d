package graft

import graft.diff.{DatasetComparator, DiffOptions}
import graft.schema.{Flattener, SchemaUtils}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based invariants over generated data (SURVEY.md §5 rebuild
  * strategy): reflexivity of the diff, flatten/selector structure laws,
  * hash/dedup identities. Row counts are kept small and successful-test
  * counts low — each property spins Spark jobs; these check SEMANTICS,
  * the scale story is the bench. */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  private val rowGen = for {
    id <- Gen.choose(0, 1000)
    name <- Gen.alphaStr.map(_.take(8))
    amount <- Gen.choose(-1000000L, 1000000L).map(_ / 100.0)
  } yield (id, name, amount)

  private val tableGen = Gen.listOfN(12, rowGen).map(_.distinctBy(_._1))
    .suchThat(_.nonEmpty)

  property("diff(df, df) is empty; passedCount == rowCount") =
    forAll(tableGen) { rows =>
      val df = rows.toDF("id", "name", "amount")
      val r = new DatasetComparator(df, df, DiffOptions(keys = Seq("id"))).compare()
      r.datasetsMatch && r.passedCount == rows.length
    }

  property("diff is symmetric under side swap") =
    forAll(tableGen, tableGen) { (a, b) =>
      val dfA = a.toDF("id", "name", "amount")
      val dfB = b.toDF("id", "name", "amount")
      val ab = new DatasetComparator(dfA, dfB, DiffOptions(keys = Seq("id"))).compare()
      val ba = new DatasetComparator(dfB, dfA, DiffOptions(keys = Seq("id"))).compare()
      ab.diffCount == ba.diffCount &&
        ab.refRowCount == ba.newRowCount && ab.newRowCount == ba.refRowCount
    }

  property("fast and parity keyed modes agree on diffCount/passedCount") =
    forAll(tableGen, tableGen) { (a, b) =>
      val dfA = a.toDF("id", "name", "amount")
      val dfB = b.toDF("id", "name", "amount")
      val fast = new DatasetComparator(dfA, dfB,
        DiffOptions(keys = Seq("id"), fastKeyed = true)).compare()
      val parity = new DatasetComparator(dfA, dfB,
        DiffOptions(keys = Seq("id"), fastKeyed = false)).compare()
      fast.diffCount == parity.diffCount && fast.passedCount == parity.passedCount
    }

  property("flattening a struct-free DataFrame is the identity projection") =
    forAll(tableGen) { rows =>
      val df = rows.toDF("id", "name", "amount")
      val flat = Flattener.flattenDataFrame(df)
      flat.schema == df.schema && flat.collect().toSeq == df.collect().toSeq
    }

  property("selector projection is idempotent") = {
    val df = spark.sql("SELECT 1 AS b, named_struct('z', 2, 'a', 3) AS s, 'x' AS a")
    val once = df.select(SchemaUtils.dataFrameSelector(df.schema): _*)
    val twice = once.select(SchemaUtils.dataFrameSelector(once.schema): _*)
    once.schema == twice.schema && once.collect().toSeq == twice.collect().toSeq
  }

  property("minhash of identical texts identical; jaccard(t,t) == 1") =
    forAll(Gen.listOfN(6, Gen.alphaNumStr.suchThat(_.nonEmpty))) { words =>
      val text = words.mkString(" ")
      val df = Seq((1, text), (2, text)).toDF("id", "t")
      val sigs = df.select(graft.ops.Dedup.minhashSignature(col("t"), 8, 2).as("sig"))
        .collect().map(_.getAs[scala.collection.Seq[Long]]("sig"))
      val j = df.limit(1).select(
        graft.ops.Dedup.jaccard(col("t"), col("t"), 2).as("j")).collect().head.getDouble(0)
      sigs(0) == sigs(1) && j == 1.0
    }

  property("simhash60 deterministic and within 60 bits") =
    forAll(Gen.listOfN(10, Gen.alphaNumStr)) { words =>
      val df = Seq(Tuple1(words)).toDF("toks")
      val h1 = df.select(graft.functions.simhash60(col("toks"))).collect().head.getLong(0)
      val h2 = df.select(graft.functions.simhash60(col("toks"))).collect().head.getLong(0)
      h1 == h2 && h1 >= 0 && h1 < (1L << 60)
    }

  private val edgeGen = Gen.listOfN(15,
    Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 20L)).suchThat(p => p._1 != p._2))
    .suchThat(_.nonEmpty)

  property("connected components: labels are component-closed minima") =
    forAll(edgeGen) { es =>
      val pairs = es.toDF("id1", "id2")
      val labels = graft.ops.Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every edge endpoint is labeled, labels never exceed the node,
      // and both ends of every edge agree on the label
      val nodes = es.flatMap(e => Seq(e._1, e._2)).toSet
      nodes.forall(labels.contains) &&
        labels.forall { case (n, l) => l <= n } &&
        es.forall { case (a, b) => labels(a) == labels(b) } &&
        labels.values.forall(l => labels(l) == l) // representatives are fixpoints
    }

  property("asOfJoin preserves left row count and never matches forward") =
    forAll(Gen.listOfN(8, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 50L))),
      Gen.listOfN(8, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 50L)))) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
        .toDF("k", "ts", "row_id")
      val right = rs.toDF("k", "ts").withColumn("v", col("ts") * 10)
      val out = graft.ops.AsOf.asOfJoin(left, right, "k", "ts", Seq("v")).collect()
      out.length == ls.length &&
        out.forall { r =>
          r.isNullAt(r.fieldIndex("asof_ts")) ||
            r.getLong(r.fieldIndex("asof_ts")) <= r.getLong(r.fieldIndex("ts"))
        }
    }

  property("hash sampling partitions the corpus: rates 0 and 100 are ∅ and all") =
    forAll(Gen.listOfN(30, Gen.choose(0L, 10000L)).map(_.distinct)) { ids =>
      val df = ids.toDF("id")
      graft.ops.CorpusOps.hashSample(df, "id", 0).count() == 0 &&
        graft.ops.CorpusOps.hashSample(df, "id", 100).count() == ids.length
    }
}
