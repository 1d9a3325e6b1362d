package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min and HLL sketches: estimation guarantees and the merge
  * property that makes them 100 TB ops (cells combine by sum/max, so
  * shard sketches union into the corpus sketch without re-scanning). */
class SketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // skewed stream: key k appears k+1 times, keys 0..99
  private lazy val stream = spark.range(0, 100)
    .select(explode(sequence(lit(0), col("id"))).as("pos"), col("id").as("key"))
    .select("key")

  test("count-min never underestimates and is exact without collisions") {
    val sk = Sketch.countMin(stream, "key", depth = 4, width = 2048)
    val est = Sketch.countMinEstimate(sk, stream.distinct(), "key",
      depth = 4, width = 2048)
    val truth = stream.groupBy("key").agg(count(lit(1)).as("n"))
    val joined = est.join(truth, "key").select("key", "n", "est").collect()
    assert(joined.length === 100)
    assert(joined.forall(r => r.getLong(2) >= r.getLong(1)), "underestimate!")
    // 100 keys in 4×2048 cells: collisions are possible but the min over
    // 4 independent rows must be exact for the large majority
    val exact = joined.count(r => r.getLong(2) == r.getLong(1))
    assert(exact >= 95, s"only $exact/100 exact at width 2048")
  }

  test("count-min sketches merge by cell-wise sum") {
    val (a, b) = (stream.filter(col("key") < 50), stream.filter(col("key") >= 50))
    val whole = Sketch.countMin(stream, "key", depth = 2, width = 64)
    val merged = Sketch.countMin(a, "key", depth = 2, width = 64)
      .unionAll(Sketch.countMin(b, "key", depth = 2, width = 64))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    assert(merged.orderBy("row", "bucket").collect().toSeq ===
      whole.orderBy("row", "bucket").collect().toSeq)
  }

  test("hll registers merge by max and the estimate lands within 5%") {
    val keys = spark.range(0, 20000).select(col("id").as("key"))
    val regs = Sketch.hllRegisters(keys, "key", p = 10)
    val est = Sketch.hllEstimate(regs, p = 10)
    assert(math.abs(est - 20000) / 20000.0 < 0.05, s"estimate $est")
    // shard registers merge by max into the whole-corpus registers
    val merged = Sketch.hllRegisters(keys.filter(col("key") % 2 === 0), "key", p = 10)
      .unionAll(Sketch.hllRegisters(keys.filter(col("key") % 2 === 1), "key", p = 10))
      .groupBy("bucket").agg(max("max_rho").as("max_rho"))
    assert(merged.orderBy("bucket").collect().toSeq ===
      regs.orderBy("bucket").collect().toSeq)
  }

  test("hll small-range correction counts tiny sets almost exactly") {
    val keys = spark.range(0, 40).select(col("id").as("key"))
    val est = Sketch.hllEstimate(Sketch.hllRegisters(keys, "key", p = 10), p = 10)
    assert(math.abs(est - 40) <= 3, s"estimate $est for n=40")
  }

  test("grouped hll: overlapping slices merge into the whole-table file") {
    // 3 groups × 4000 distinct keys, keys shared across groups
    val rows = spark.range(0, 12000).select(
      (col("id") % 3).cast("string").as("grp"), (col("id") / 3).as("key"))
    val whole = Sketch.hllRegistersByGroup(rows, "grp", "key", p = 10)
    // overlapping slices (each drops one residue class of id): merged
    // registers must be bit-identical to the whole-table file
    val slices = Seq(0, 1, 2).map(r =>
      Sketch.hllRegistersByGroup(rows.filter(col("id") % 3 =!= r),
        "grp", "key", p = 10))
    val merged = Sketch.hllMergeByGroup(slices, "grp")
    assert(merged.orderBy("grp", "bucket").collect().toSeq ===
      whole.orderBy("grp", "bucket").collect().toSeq)
    // and per-group estimates land within HLL tolerance of 4000
    Seq("0", "1", "2").foreach { g =>
      val est = Sketch.hllEstimate(
        merged.filter(col("grp") === g).drop("grp"), p = 10)
      assert(math.abs(est - 4000) / 4000.0 < 0.05, s"group $g estimate $est")
    }
  }
}
