package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over an array of shingle hashes in ONE codegen'd
  * kernel: for each of the k XOR-mix seeds, the minimum of
  * `hash XOR seed` across the array. Value-identical to the builtin
  * chain `transform(seeds, s -> array_min(transform(hashes, h -> h ^ s)))`,
  * whose nested higher-order lambdas are interpreted and allocate one
  * array per seed per row; here each row is a single k×n loop over
  * primitive longs — the hot middle of every LSH pipeline (signatures
  * feed banding in d4/d6/d8/d9/d17).
  *
  * Edge semantics match the builtin chain exactly (the SQL surface
  * accepts arbitrary array<bigint>): an array with no non-null element
  * — including the empty array — yields k null signature entries,
  * precisely what `array_min` produces.
  */
case class MinHashSig(child: Expression, seeds: Seq[Long])
    extends UnaryExpression {
  require(seeds.nonEmpty, "need at least one seed")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.catalogString}")
  }
  // containsNull: an all-null input array produces null signature
  // entries (array_min semantics) — same element nullability the
  // builtin transform/array_min formulation declares
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val seedArr: Array[Long] = seeds.toArray

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], seedArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seedArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $seedsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Runtime kernel shared by interpreted eval and generated code.
    * Nulls inside the hash array are skipped (array_min semantics); an
    * array with no usable element yields null signature entries. */
  def compute(hashes: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = hashes.numElements()
    val k = seeds.length
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      val seed = seeds(s)
      var min = Long.MaxValue
      var found = false
      var i = 0
      while (i < n) {
        if (!hashes.isNullAt(i)) {
          val v = hashes.getLong(i) ^ seed
          if (v < min) min = v
          found = true
        }
        i += 1
      }
      out(s) = if (found) java.lang.Long.valueOf(min) else null
      s += 1
    }
    new GenericArrayData(out)
  }
}
