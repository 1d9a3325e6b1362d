package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpora (SURVEY.md §7).
  *
  * Scale design: every operator is a pure DataFrame pipeline — one
  * shuffle per logical step, map-side partial aggregation, no driver
  * collects — so each would run unchanged on a 1000-executor cluster.
  * All hashing is md5-derived (see [[graft.functions.TextFunctions.h64]])
  * so each operator has an exact cross-engine oracle.
  */
object Dedup {

  /** Exact dedup: group rows by normalized-text fingerprint, keep the
    * smallest id. Single hash-shuffle with partial aggregation; at 100 TB
    * the shuffle carries only (fingerprint, id) pairs, not text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Deterministic 60-bit seeds for the XOR-mix MinHash family,
    * derived from md5 so both engines can embed them as literals. */
  def minhashSeeds(k: Int): Seq[Long] =
    (0 until k).map { i =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"graft-minhash-seed-$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
    }

  /** MinHash signature: for each seed, min over word-shingle hashes of
    * (h64(shingle) XOR seed). XOR-mixing is not a classically min-wise
    * independent family, but it is deterministic, engine-portable, and
    * effective for LSH banding. Returns array<long> of length k. */
  def minhashSignature(text: Column, k: Int, shingleSize: Int): Column = {
    val hashes = transform(wordShingles(text, shingleSize), s => h64(s))
    val seeds = array(minhashSeeds(k).map(lit): _*)
    transform(seeds, seed => array_min(transform(hashes, h => h.bitwiseXOR(seed))))
  }

  /** Exact word-shingle Jaccard between two texts. */
  def jaccard(a: Column, b: Column, shingleSize: Int): Column = {
    val sa = array_distinct(wordShingles(a, shingleSize))
    val sb = array_distinct(wordShingles(b, shingleSize))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** MinHash-LSH near-duplicate pairs:
    * shingle → minhash signature → band buckets → bucket self-join →
    * exact-Jaccard verification.
    *
    * Physical shape at scale: explode produces `bands` rows per doc keyed
    * by (band, md5(signature slice)); the self-join shuffles on that
    * bucket key (collision groups are tiny unless docs are true dups);
    * verification joins text back by id. No driver-side state.
    *
    * @return columns (id1, id2, jaccard) with id1 < id2, jaccard >= tau
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 12,
      bands: Int = 3,
      shingleSize: Int = 3,
      tau: Double = 0.6): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val r = k / bands

    // Stage 1 — tokenize ONCE, shingle ONCE, hash each DISTINCT shingle
    // ONCE (min-hash is duplicate-invariant), materialized by persist().
    // Chained selects keep each expensive lambda single-evaluation, and
    // the persist barrier stops Catalyst from re-inlining the hashing
    // into every downstream consumer (k seed lambdas × banding × two
    // verification joins ≈ 30-50× redundant hashing otherwise — the
    // difference between minutes and seconds at sf0.1 and between
    // feasible and not at 100 TB).
    val hashed = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        array_distinct(shinglesFromTokens(col("toks"), shingleSize)).as("sh"))
      .select(col("doc_id"), col("sh"),
        transform(col("sh"), s => h64(s)).as("hashes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Stage 2 — signatures are cheap integer folds over the cached arrays.
    val seeds = minhashSeeds(k)
    val withSig = hashed.select(col("doc_id"), col("sh"),
      array(seeds.map(seed =>
        array_min(transform(col("hashes"), h => h.bitwiseXOR(lit(seed))))): _*).as("sig"))

    val banded = withSig.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", transform(slice(col("sig"), b * r + 1, lit(r)),
          x => x.cast("string")))))).as(Seq("band", "bucket")))

    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id1"))
    val rgt = banded.select(col("band"), col("bucket"), col("doc_id").as("id2"))
    val candidates = l.join(rgt, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()

    // Verification reuses the cached distinct-shingle sets — no re-
    // shingling, no text shuffle.
    val sets = hashed.select(col("doc_id"), col("sh"))
    candidates
      .join(sets.select(col("doc_id").as("id1"), col("sh").as("s1")), Seq("id1"))
      .join(sets.select(col("doc_id").as("id2"), col("sh").as("s2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** All-pairs exact n-gram Jaccard within a blocking column (for bounded
    * block sizes; the LSH path above is the unblocked scale path). */
  def jaccardPairsBlocked(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      shingleSize: Int = 3,
      tau: Double = 0.5): DataFrame = {
    val a = df.select(col(blockCol).as("block"), col(idCol).as("id1"), col(textCol).as("t1"))
    val b = df.select(col(blockCol).as("block"), col(idCol).as("id2"), col(textCol).as("t2"))
    a.join(b, Seq("block"))
      .filter(col("id1") < col("id2"))
      .select(col("block"), col("id1"), col("id2"),
        jaccard(col("t1"), col("t2"), shingleSize).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** SimHash near-dup pairs: 60-bit simhash, banded into `chunks` bit
    * ranges (pigeonhole: hamming <= chunks-1 implies >= 1 equal chunk),
    * candidates verified by exact hamming distance. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1 // pigeonhole guarantee
    val bitsPer = 60 / chunks
    val sim = df.select(col(idCol).as("doc_id"),
      graft.functions.simhash60(tokens(col(textCol))).as("sim"))

    val chunkKeys = (0 until chunks).map(c =>
      shiftright(col("sim"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    val banded = sim.select(col("doc_id"), col("sim"),
      posexplode(array(chunkKeys: _*)).as(Seq("chunk", "key")))

    val l = banded.select(col("chunk"), col("key"), col("doc_id").as("id1"), col("sim").as("sim1"))
    val r = banded.select(col("chunk"), col("key"), col("doc_id").as("id2"), col("sim").as("sim2"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs at scale: hyperplane-LSH bucket join →
    * exact cosine verification. Unlike [[embeddingCosinePairs]] this
    * needs no pre-existing blocking column: buckets come from `bits`
    * signed random projections, so the candidate join touches only
    * colliding vectors (near-identical vectors collide with probability
    * ≈ (1 - θ/π)^bits). */
  def embeddingLshPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      bits: Int = 12,
      tau: Double = 0.95): DataFrame = {
    val bucketed = Similarity.hyperplaneBuckets(df, idCol, vecCol, bits, dim)
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bucketed.select(col("bucket"), col("id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = bucketed.select(col("bucket"), col("id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        when(col("n1") * col("n2") === 0.0, lit(0.0))
          .otherwise(Similarity.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
          .as("cos"))
      .filter(col("cos") >= tau)
      .distinct()
  }

  /** Embedding near-duplicate pairs: exact cosine within a blocking
    * column (e.g. a cluster/label id or LSH bucket). Vectors are cast to
    * double and reduced with a sequential fold — IEEE-exact. */
  def embeddingCosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      tau: Double = 0.95): DataFrame = {
    // norms precomputed ONCE per vector (O(n·d)), not per pair (O(n²·d));
    // sqrt-of-identical-double keeps the result bit-equal to a per-pair
    // formulation, so the oracle is unchanged
    val v = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nrm", sqrt(Similarity.dot(col("vec"), col("vec"))))
    val a = v.select(col("block"), col("id").as("id1"), col("vec").as("v1"), col("nrm").as("n1"))
    val b = v.select(col("block"), col("id").as("id2"), col("vec").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("block"))
      .filter(col("id1") < col("id2"))
      .select(col("block"), col("id1"), col("id2"),
        when(col("n1") * col("n2") === 0.0, lit(0.0))
          .otherwise(Similarity.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
          .as("cos"))
      .filter(col("cos") >= tau)
  }
}
