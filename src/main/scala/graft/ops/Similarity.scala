package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §7).
  *
  * Cosine is computed on double-cast arrays with a SEQUENTIAL left fold
  * (`aggregate` over `zip_with`), making the floating-point result
  * bit-identical to an equivalent `list_reduce` fold in DuckDB — the
  * oracle compares doubles exactly, no epsilon.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns — the
    * codegen'd [[graft.functions.ArrayDotProduct]] expression
    * (bit-identical to the `aggregate(zip_with(...))` formulation and to
    * the DuckDB oracle's `list_reduce` fold, ~10× cheaper per row). */
  def dot(a: Column, b: Column): Column = graft.functions.dotProduct(a, b)

  /** Cosine similarity; 0.0 when either norm is zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Brute-force cosine top-k against one query vector, as a DataFrame
    * with (id, cos). The query side is a 1-row broadcast cross join, so
    * the plan is a single scan + per-row expression + distributed top-k
    * (TakeOrderedAndProject) — the right baseline shape at any scale. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: DataFrame, // 1 row, column "q" array<double>
      k: Int): DataFrame = {
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(query))
      .select(col("id"), cosine(col("v"), col("q")).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** IVF (inverted-file) approximate search: k-means the corpus into
    * `nlist` cells offline, search only the `nprobe` cells whose
    * centroids are closest to the query.
    *
    * Scale path: the assignment table is partitioned by cell id; a query
    * prunes to nprobe/nlist of the data. Centroids are tiny and live in
    * a broadcast. Recall is tested against [[bruteForceTopK]] in the
    * spec.
    */
  def ivfIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // few iterations suffice: cells only need to be reasonable Voronoi
    // buckets, not converged centroids (recall comes from nprobe)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("features")
      .fit(vecs.select("features"))
    val assigned = model.transform(vecs)
      .select(col("id"), col("v"), col("prediction").as("cell"))
      .repartition(col("cell"))
    IvfIndex(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Deterministic IVF variant: centroids are the vectors of the first
    * `nlist` ids (a sampling-seeded coarse quantizer with no Lloyd
    * refinement — recall still comes from `nprobe`). Assignment is
    * argmax-cosine with a min-index tiebreak, computed with the same
    * sequential-fold arithmetic as the DuckDB oracle, so the whole
    * index → probe → top-k path is exactly replayable in SQL. Use
    * [[ivfIndex]] when centroid quality matters more than auditability.
    *
    * Scale shape is identical to [[ivfIndex]]: the only driver-side data
    * is the nlist centroid rows (tiny, broadcast as literals into the
    * assignment expression); the assignment table partitions by cell. */
  def ivfIndexSeeded(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int): IvfIndex = {
    val v = col(vecCol).cast("array<double>")
    val cents: Array[Array[Double]] = df
      .select(col(idCol).cast("long").as("id"), v.as("v"))
      .filter(col("id") < nlist).orderBy("id")
      .collect().map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
    require(cents.length == nlist, s"need ids 0..${nlist - 1} as seeds")

    val scored = cents.toSeq.map(c => cosine(v, array(c.map(lit).toSeq: _*)))
    val best = scored.reduce((a, b) => greatest(a, b))
    // first (lowest) index attaining the max — same tiebreak as the
    // oracle's ORDER BY cos DESC, cid
    val cell = scored.zipWithIndex.reverse.foldLeft(lit(0)) {
      case (acc, (cs, j)) => when(cs === best, lit(j)).otherwise(acc)
    }
    val assigned = df
      .select(col(idCol).cast("long").as("id"), v.as("v"), cell.as("cell"))
      .repartition(col("cell"))
    IvfIndex(assigned, cents)
  }

  case class IvfIndex(assigned: DataFrame, centroids: Array[Array[Double]]) {

    /** Top-k by cosine among the `nprobe` nearest cells to the query. */
    def search(queryVec: Array[Double], k: Int, nprobe: Int): DataFrame = {
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
      }
      val cells = centroids.zipWithIndex
        .sortBy { case (c, _) => -cos(queryVec, c) }
        .take(nprobe).map(_._2)
      val q = array(queryVec.map(lit).toSeq: _*)
      assigned
        .filter(col("cell").isin(cells.toSeq: _*)) // partition pruning on the cell key
        .select(col("id"), cosine(col("v"), q).as("cos"))
        .orderBy(col("cos").desc, col("id"))
        .limit(k)
    }
  }

  /** Symmetric max-abs int8 quantization of an embedding column — the
    * 4× storage/bandwidth reducer ANN indexes ship with. Each vector is
    * scaled by its own max|component| and rounded to [-127, 127]; the
    * per-vector scale is kept for dequantization. Emitted element-wise
    * (id, pos, qv, scale) so the result is hash-comparable across
    * engines (array cells are not). Pure per-row arithmetic — no
    * shuffle; round-half-away-from-zero in both engines. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("v"),
        array_max(transform(v, x => abs(x))).as("scale"))
      .select(col("id"), col("scale"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("id"), col("pos"),
        when(col("scale") === 0.0, lit(0))
          .otherwise(round(col("x") / col("scale") * 127.0).cast("int")).as("qv"),
        col("scale"))
  }

  /** Deterministic md5-derived hyperplane components, uniform in [-1, 1)
    * — exposed so the DuckDB oracle can embed the identical values as
    * literals. */
  def planes(bits: Int, dim: Int): Seq[Seq[Double]] =
    (0 until bits).map { p =>
      (0 until dim).map { d =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"graft-plane-$p-$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
        java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 31) - 1.0
      }
    }

  /** Random-hyperplane LSH bucketing for cosine: `bits` signed
    * projections form a bucket key; near vectors collide with high
    * probability. Deterministic hyperplanes derived from md5 of
    * (plane, dim) — engine-portable like everything else here. */
  def hyperplaneBuckets(df: DataFrame, idCol: String, vecCol: String,
      bits: Int, dim: Int): DataFrame = {
    val planesSeq = planes(bits, dim)
    val v = col(vecCol).cast("array<double>")
    val bucketBits = planesSeq.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    df.select(col(idCol).as("id"), v.as("v"),
      bucketBits.reduce(_.bitwiseOR(_)).as("bucket"))
  }
}
