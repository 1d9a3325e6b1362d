package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Ckpt.CkptSyntax
import scala.jdk.CollectionConverters._

/** Scale soak for the LLM-layer heavyweights: blows the sf tables up
  * 10× (deterministic id offsets; non-first copies get a per-copy text
  * suffix / vector perturbation so near-dup logic does real work) and
  * runs dedupCorpus, allPairsJaccard and IvfIndex.knnJoin end to end,
  * reporting wall seconds and SHUFFLE WRITE bytes per op — the scale
  * currency that the correctness gates can't see. The blown-up corpus
  * is soak stress input only; gates and oracles always read the
  * driver-generated tables untouched.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.Soak
  * → one JSON line {"op": {"sec": .., "shuffle_mb": ..}, ...}
  */
object Soak {

  private class ShuffleMeter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  // every fixture dir THIS run creates, so cleanup deletes exactly these
  // and nothing else — a name-prefix sweep over /tmp would also delete a
  // concurrently running soak's live fixtures mid-measure (ADVICE r12)
  private val createdDirs = scala.collection.mutable.ArrayBuffer[java.io.File]()
  private def soakTempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    createdDirs.synchronized { createdDirs += d }
    touchHeartbeats(Seq(d))
    d.toString
  }

  /** Liveness marker the leaked-fixture sweep keys on: a fixture dir's
    * own mtime reflects CREATION, not last use, so a soak running longer
    * than the sweep cutoff would lose its live fixtures to a concurrent
    * run's startup sweep (ADVICE r13). Each measured phase re-touches
    * `_graft_heartbeat` inside every fixture this run owns; the sweep
    * treats a dir as live while EITHER the dir or its heartbeat is
    * fresh. The `_` prefix keeps parquet readers from seeing it. */
  private def touchHeartbeats(dirs: Seq[java.io.File]): Unit =
    dirs.foreach { d =>
      try {
        val hb = new java.io.File(d, "_graft_heartbeat")
        hb.createNewFile()
        hb.setLastModified(System.currentTimeMillis())
      } catch { case _: Exception => () } // best-effort: sweep-only signal
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SOAK_COPIES", "10").toInt
    // op filter for targeted scale points (e.g. the 50× flagship run:
    // SPARK_GRAFT_SOAK_OPS=dedup_corpus,ivf_knn_join,front_door_admission
    // SPARK_GRAFT_SOAK_COPIES=50) — unfiltered runs execute everything
    val opsFilter = sys.env.get("SPARK_GRAFT_SOAK_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(names: String*): Boolean =
      opsFilter.forall(f => names.exists(f.contains))
    val skip = (-1.0, -1.0, -1L) // marker rows, filtered before the JSON
    // reclaim fixtures leaked by a HARD-KILLED earlier run (its finally
    // never ran, and per-run tracking means no later run would touch
    // them): sweep only graft-soak-* dirs old enough that no live
    // concurrent soak can still be using them
    locally {
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      Option(new java.io.File(System.getProperty("java.io.tmpdir"))
          .listFiles()).foreach(_.foreach { f =>
        // liveness = the newer of creation mtime and the per-phase
        // heartbeat a RUNNING soak keeps touching — a concurrent soak
        // older than the cutoff but still measuring stays untouched
        val hb = new java.io.File(f, "_graft_heartbeat")
        val live = math.max(f.lastModified(),
          if (hb.exists()) hb.lastModified() else 0L)
        if (f.getName.startsWith("graft-soak-") && live < cutoff)
          rm(f)
      })
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    // fixture cleanup lives in the finally below so a FAILED run doesn't
    // leak its 10k-file fixtures either (ADVICE r12)
    try {

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val docsN = (0 until copies).map { i =>
      docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else concat(col("text"), lit(s" soakcopy$i"))).as("text"))
    }.reduce(_ unionAll _)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embN = (0 until copies).map { i =>
      emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          x => x + lit((i * 1e-4).toFloat)).as("embedding"))
    }.reduce(_ unionAll _)

    // listener events arrive asynchronously and the bus has no public
    // drain hook, so wait until the byte counter itself goes quiet —
    // a fixed sleep can still attribute a slow previous op's shuffle
    // bytes to the next op
    def quiesce(): Unit = {
      var prev = -1L
      var stableMs = 0
      var waitedMs = 0
      while (stableMs < 300 && waitedMs < 5000) {
        Thread.sleep(100); waitedMs += 100
        val b = meter.bytes.get()
        if (b == prev) stableMs += 100 else { stableMs = 0; prev = b }
      }
    }

    def measure(name: String)(f: => Long): (String, Double, Double, Long) = {
      if (!want(name)) return (name, skip._1, skip._2, skip._3)
      quiesce() // settle counters from the previous op
      // refresh fixture liveness once per phase so a long run's fixtures
      // survive a concurrent run's startup sweep
      createdDirs.synchronized { touchHeartbeats(createdDirs.toSeq) }
      val b0 = meter.bytes.get()
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      quiesce()
      val mb = (meter.bytes.get() - b0) / 1e6
      (name, sec, mb, rows)
    }

    // ---- ADVERSARIAL SKEW inputs (deterministic): the two shapes that
    // kill naive pairs pipelines at corpus scale ------------------------
    // (a) one 10^4-duplicate cluster: a single payload crawled 10,000
    //     times. Without exact-dup pre-collapse its LSH bucket would
    //     self-join to ~5·10^7 candidate pairs; with collapse it
    //     contributes ONE representative.
    val hotText = "breaking news syndicated wire copy reproduced verbatim " +
      "across mirror sites with identical boilerplate navigation and " +
      "footer text that a crawler collects ten thousand times over"
    val hotDup = spark.range(0, 10000)
      .select((col("id") + 900000000L).as("doc_id"), lit(hotText).as("text"))
    // (b) one hot BAND bucket: 5,000 DISTINCT texts sharing ~95% of
    //     their shingles (template pages differing in one trailing
    //     token), so most land in the same minhash/simhash band bucket.
    //     Pre-collapse cannot help (all distinct); only the bucket cap
    //     keeps the self-join off the O(n^2) cliff.
    val tmplText = (0 until 60).map(i => s"template$i").mkString(" ")
    val nearFam = spark.range(0, 5000)
      .select((col("id") + 910000000L).as("doc_id"),
        concat(lit(tmplText + " variant "), col("id").cast("string")).as("text"))
    val skewCorpus = docsN.unionAll(hotDup).unionAll(nearFam)

    def auditCounters(audit: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = audit.agg(count(lit(1)), max(col("bucket_sz")),
        sum(expr("bucket_sz * (bucket_sz - 1) div 2"))).collect()(0)
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var audits = Map.empty[String, (Long, Long, Long)]

    // ---- DIVERSITY-CONTROLLED dedup fixture (VERDICT r14 watch item):
    // the standard soak grows cluster SIZE with corpus size (copy i of
    // every doc near-dups copies 0..i−1), so within-cluster LSH pair
    // counts grow with the square of the multiplier and the shuffle
    // curve cannot distinguish "fixture artifact" from "cap leak". A
    // real crawl grows in DIVERSITY: more distinct documents, roughly
    // constant duplication per document. This fixture holds cluster
    // size at a FIXED 10 copies and grows the number of distinct base
    // documents by SPARK_GRAFT_SOAK_DIVERSITY instead — each diversity
    // variant rewrites the text through a d-rotated substitution cipher
    // (translate: codegen'd, deterministic), so variants share NO
    // word shingles and cannot near-dup-collide across variants, while
    // the 10 suffix copies inside a variant still form the usual
    // cluster. Healthy slope: shuffle ~linear in diversity.
    val diversity =
      sys.env.getOrElse("SPARK_GRAFT_SOAK_DIVERSITY", "1").toInt
    // the no-cross-variant-collision invariant rests on each variant
    // getting a DISTINCT rotation: rot = d % 26, so variants d and d+26
    // would share a rotation (identical text → cross-variant exact-dup
    // clusters) and a healthy run would read as a cap leak
    require(diversity >= 1 && diversity <= 26,
      s"SPARK_GRAFT_SOAK_DIVERSITY must be in 1..26, got $diversity")
    def diverseCorpus(): org.apache.spark.sql.DataFrame = {
      val abc = "abcdefghijklmnopqrstuvwxyz"
      val base = (0 until diversity).map { d =>
        val rot = abc.drop(d % 26) + abc.take(d % 26)
        docs.select((col("doc_id") + lit(d * 100000000L)).as("doc_id"),
          translate(col("text"), abc, rot).as("text"))
      }.reduce(_ unionAll _)
      (0 until 10).map { i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(col("text"), lit(s" soakcopy$i"))).as("text"))
      }.reduce(_ unionAll _)
    }

    val results = Seq(
      measure("dedup_corpus") {
        ops.Dedup.dedupCorpus(docsN, "doc_id", "text").count()
      },
      measure("dedup_corpus_diverse") {
        ops.Dedup.dedupCorpus(diverseCorpus(), "doc_id", "text").count()
      },
      // stage decomposition for the diversity slope: candidate pairs
      // alone (collapse + banding + verify, no CC / final anti-join)
      measure("dedup_diverse_pairs") {
        ops.Dedup.minhashLshPairs(diverseCorpus(), "doc_id", "text").count()
      },
      // ...and CC alone, `rows` = propagation ROUNDS: per-round shuffle
      // is O(V+E) (linear in diversity), so byte growth beyond linear
      // must show up here as extra rounds — chain-length growth, the
      // expected log factor — or it is a real leak
      measure("dedup_diverse_cc") {
        val (labels, rounds) = ops.Dedup.connectedComponentsWithRounds(
          ops.Dedup.minhashLshPairs(diverseCorpus(), "doc_id", "text"))
        labels.count()
        rounds.toLong
      },
      measure("all_pairs_jaccard") {
        // %2 subset: exact all-pairs is the heaviest op; half the blown-up
        // corpus still dwarfs any gate input
        ops.Dedup.allPairsJaccard(docsN.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", shingleSize = 3, tau = 0.5).count()
      },
      measure("ivf_knn_join") {
        // the knnJoin bound is n·nprobe·(n/nlist): a FIXED nlist turns
        // 5× more vectors into 25× more distance work, so the index is
        // sized the way a real deployment sizes it — nlist ∝ √n (cell
        // population n/nlist then grows only with √n). Anchored so the
        // recorded 10×-copies point keeps its historical nlist=32.
        val nlist = math.max(32, math.round(32 * math.sqrt(copies / 10.0)).toInt)
        ops.Similarity.ivfIndexSeeded(embN, "vec_id", "embedding", nlist = nlist)
          .knnJoin(k = 5, nprobe = 4).count()
      },
      measure("growing_admission") {
        // s39's fold shape at soak scale: 4 sequential batches, each
        // filtered against the index EXTENDED with the previous batches'
        // survivors. The claim to weigh: extend is O(batch) — the corpus
        // index is built once, and each round's added bytes track the
        // admitted batch, not the (growing) corpus. Superseded index
        // generations are RELEASED as soon as the new pins land
        // (Ckpt.release), so residency stays at one live image + one
        // in-flight — the round-17 40 GiB-driver note is retired and
        // this runs at the default 8 GiB heap at 50×.
        val idx0 = ops.Dedup.nearDupIndex(docsN, "doc_id", "text")
        var idx = idx0.copy(fingerprints = idx0.fingerprints.ckpt,
          bands = idx0.bands.ckpt, hashes = idx0.hashes.ckpt)
        var total = 0L
        (0 until 4).foreach { b =>
          val batch = docsN
            .filter(pmod((col("doc_id") / 10).cast("long"), lit(4)) === b)
            .select((col("doc_id") + 600000000L).as("doc_id"),
              reverse(col("text")).as("text"))
          val adm = ops.Dedup.nearDupFilter(idx, batch,
            "doc_id", "text", tau = 0.5).ckpt
          total += adm.count()
          val grown = ops.Dedup.NearDupIndex.extend(idx, adm, "doc_id", "text")
          val prev = idx
          idx = grown.copy(fingerprints = grown.fingerprints.ckpt,
            bands = grown.bands.ckpt, hashes = grown.hashes.ckpt)
          ops.Ckpt.release(prev.fingerprints)
          ops.Ckpt.release(prev.bands)
          ops.Ckpt.release(prev.hashes)
          ops.Ckpt.release(adm)
        }
        total
      },
      // ---- skew battery: d6 / d9 / d17 / m8 under the hot shapes ------
      measure("lsh_pairs_skew") { // d6
        ops.Dedup.minhashLshPairs(skewCorpus, "doc_id", "text").count()
      },
      measure("dup_clusters_skew") { // d9: pairs -> connected components
        ops.Dedup.connectedComponents(
          ops.Dedup.minhashLshPairs(skewCorpus, "doc_id", "text")).count()
      },
      measure("dedup_corpus_skew") { // d17 end to end on the skewed corpus
        ops.Dedup.dedupCorpus(skewCorpus, "doc_id", "text").count()
      },
      measure("simhash_skew") { // d7-path with audited drop counters
        val (pairs, audit) = ops.Dedup.simhashPairsAudited(
          skewCorpus, "doc_id", "text", maxHamming = 3)
        val n = pairs.count()
        audits += "simhash_skew" -> auditCounters(audit)
        n
      },
      measure("hamming_skew") { // m8-path: engineered hot chunk buckets
        // hash = id << 16: chunks 0, 2, 3 are constant across ALL 50k
        // DISTINCT hashes (three hot buckets of 50k -> capped; uncapped
        // they would join to 3.7e9 candidate pairs), while chunk 1 keys
        // are unique. One planted near-dup pair (hamming 1) must still
        // surface through its un-capped chunk-1 bucket: the cap drops
        // only provably-oversized buckets, not recall on healthy ones.
        val flood = spark.range(0, 50000)
          .select(col("id").as("media_id"), (col("id") * 65536L).as("dhash"))
        val f1 = 0x123456789abcdL
        val needle = spark.range(0, 2)
          .select((col("id") + 60000000L).as("media_id"),
            (lit(f1).bitwiseXOR(col("id"))).as("dhash")) // ids differ in bit 0
        val (pairs, audit) = ops.Dedup.hammingPairs64Audited(
          flood.unionAll(needle), "media_id", "dhash", maxHamming = 3)
        val n = pairs.count()
        audits += "hamming_skew" -> auditCounters(audit)
        n
      },
      measure("media_ingest_filter") { // s37's admission core at 10×
        // 50k record-local image decodes (the dominant real cost of a
        // media front door) feeding the exact s37 admission chain:
        // one decode pass emits (id, dhash, fp); intra-set min-id rep
        // collapse; fp anti-join vs the frozen corpus; pigeonhole
        // Hamming admission. Payload classes collide heavily by
        // construction (the synthetic formula is 768-periodic), so the
        // collapse does real work; bytes never shuffle — only ids,
        // hashes and fps cross an exchange.
        implicit val sp: SparkSession = spark
        val mids = docsN.select(col("doc_id").as("media_id"))
          .filter(pmod(col("media_id"), lit(3)) =!= 2) // png/jpeg only
        val corpus = ops.Multimodal.dhashWithFingerprint(
            ops.Multimodal.syntheticMedia(
              mids.filter(col("media_id") % 2 === 0), "media_id"))
          .toDF().select("media_id", "dhash", "fp")
          .localCheckpoint(eager = true)
        val feats = ops.Multimodal.dhashWithFingerprint(
            ops.Multimodal.syntheticMedia(
              mids.filter(col("media_id") % 2 === 1), "media_id"))
          .toDF().select("media_id", "dhash", "fp")
          .localCheckpoint(eager = true)
        val reps = feats.join(
          feats.groupBy("fp").agg(min("media_id").as("media_id")),
          Seq("fp", "media_id"), "left_semi")
        val freshRows = reps.join(corpus.select("fp"), Seq("fp"), "left_anti")
        ops.Dedup.hammingFilter64(corpus.select("media_id", "dhash"),
          freshRows, "media_id", "dhash", maxHamming = 3).count()
      },
      measure("containment_skew") { // d42-path behind its documented guard
        // the 10^4-duplicate cluster is the containment join's worst
        // case (every copy contains every other at 1.0 -> O(n^2)
        // DIRECTED pairs); the scaladoc-mandated exact-dup pre-collapse
        // reduces it to ONE representative before the prefix⋈index
        // join. The template family is excluded: its ~25M true pairs
        // are the ANSWER being quadratic, not a plan pathology.
        ops.Dedup.containmentPairs(
          ops.Dedup.collapseExactText(docsN.unionAll(hotDup), "doc_id", "text"),
          "doc_id", "text", shingleSize = 3, tau = 0.8).count()
      },
      measure("containment_skew_uncapped_caller") { // d42 WITHOUT the guard
        // a caller that skips pre-collapse: every shingle of the 10^4-copy
        // cluster has a 10^4-doc posting list. Before round 10 this path
        // was the one quadratic cliff (O(copies^2) candidates); now the
        // default maxPosting cap drops those hot keys from the index side
        // — bounded work, with the loss quantified in the audit instead
        // of silent. (bucket_sz here = dropped POSTING size per key.)
        val (pairs, audit) = ops.Dedup.containmentPairsAudited(
          docsN.unionAll(hotDup), "doc_id", "text",
          shingleSize = 3, tau = 0.8)
        val n = pairs.count()
        audits += "containment_skew_uncapped_caller" ->
          auditCounters(audit.select(col("h"),
            col("posting_sz").as("bucket_sz")))
        n
      },
      // ---- round-10 additions under the same skew discipline ----------
      measure("link_predict_skew") { // g11: one hot witness node
        // a supplier-like witness connected to 50k items would emit
        // C(50k,2) ≈ 1.25e9 pairs uncapped; the degree cap drops it
        // ENTIRELY (audited) while the healthy graph scores normally
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val edges = li.filter(col("l_partkey") % 20 === 0)
          .select(col("l_suppkey").cast("long").as("src"),
            (col("l_partkey").cast("long") + 1000000L).as("dst"))
        val hot = spark.range(0, 50000)
          .select(lit(999999L).as("src"), (col("id") + 2000000L).as("dst"))
        val (pairs, audit) = ops.Graph.resourceAllocationScores(
          edges.unionAll(hot), "src", "dst", minScore = 80000L, maxDeg = 25L)
        val n = pairs.count()
        audits += "link_predict_skew" ->
          auditCounters(audit.select(col("node").as("h"),
            col("deg").as("bucket_sz")))
        n
      },
      measure("frequent_ngrams_hot_template") { // d44 under the hot shapes
        // the 10^4-copy cluster contributes 10^4 (doc, ngram) rows per
        // hot trigram and the 5k template family shares ~57 trigrams
        // across all members; map-side combine collapses per-doc
        // repeats BEFORE the wire and the (ngram) roll-up shuffles
        // vocabulary-scale rows — wall/shuffle here pins that the hot
        // template costs combined rows, never copies × shingles
        ops.CorpusOps.frequentNgrams(skewCorpus, "doc_id", "text",
          n = 3, minDocFreq = 1000).count()
      },
      measure("novelty_skew") { // d51 over the 10^4-duplicate cluster
        // every copy shares every shingle: the first-carrier aggregate
        // reduces each hot hash to ONE (hash, min_id) row, so the join
        // fan-out is per-document, never per-duplicate-pair
        ops.CorpusOps.noveltyCounts(docsN.unionAll(hotDup),
          "doc_id", "text", shingleSize = 3).count()
      },
      measure("overlap_matrix_skew") { // d52 with universal shingles
        // the hot cluster's text lands in EVERY group: distinct-first
        // bounds each universal hash at C(8,2) = 28 pairs, structurally
        ops.CorpusOps.overlapMatrix(
          docsN.unionAll(hotDup)
            .withColumn("lang", pmod(col("doc_id"), lit(8)).cast("string")),
          "lang", "text", shingleSize = 3).count()
      },
      measure("ivf_rebalance_skew") { // e23: one engineered hot cell
        // a 20k-vector clump of near-identical (but DISTINCT — tiny
        // per-id perturbation on dim 0) vectors floods ONE inverted
        // list; rebalance must split it at O(oversized rows), leave
        // every healthy list unrewritten, and audit exactly which
        // lists paid. The base vector is a 1-row driver panel (the
        // same blessed-panel posture as the centroid broadcast).
        val base: Seq[Float] = spark.read
          .parquet(s"$sfDir/embeddings.parquet")
          .filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).toSeq
        val baseArr = array(base.map(f => lit(f.toDouble)): _*)
        val clump = spark.range(0, 20000)
          .select((col("id") + 500000000L).as("vec_id"),
            concat(
              array(col("id").cast("double") * 1e-7 +
                lit(base.head.toDouble)),
              slice(baseArr, 2, base.length - 1)).as("embedding"))
        val all = embN
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
          .unionAll(clump)
        val idx = ops.Similarity.ivfIndexSeeded(
          all, "vec_id", "embedding", nlist = 32)
        val (idx2, audit) = idx.rebalance(maxList = 10000L)
        audits += "ivf_rebalance_skew" -> auditCounters(
          audit.select(col("cell").cast("long").as("h"),
            col("n").as("bucket_sz")))
        idx2.assigned.count()
      },
      // ---- round-11 additions under the same skew discipline ----------
      measure("random_walks_hub") { // g12: one 100k-out-degree hub
        // the naive cur=src join would replicate every hub-resident walk
        // by the hub's degree (100k candidate rows per walk per step);
        // the (src, slot) equi-join keeps it ONE row per walk per step —
        // shuffle scales with walk count, never with hub degree
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val baseE = li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey").cast("long") + 1000000L).as("dst"))
        val hub = spark.range(0, 100000)
          .select(lit(777L).as("src"), (col("id") + 3000000L).as("dst"))
        val back = hub.select(col("dst").as("src"), col("src").as("dst"))
        ops.Graph.randomWalks(baseE.unionAll(hub).unionAll(back),
          "src", "dst", nWalks = 2, steps = 3).count()
      },
      if (!want("dv_read_sparse_delete"))
        ("dv_read_sparse_delete", skip._1, skip._2, skip._3)
      else {
        // q93 under load: a 1% takedown over the blown-up table — the
        // SPARSE-delete contract DVs are for (a heavy delete crosses the
        // documented rewrite threshold and compacts instead). The base
        // table is written once outside the timer; the measure pays the
        // predicate scan + the broadcast anti-join scan only.
        val dvDir = soakTempDir("graft-soak-dv")
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_orderkey", "l_linenumber", "l_quantity")
        (0 until copies).map { i =>
          li.select((col("l_orderkey") + lit(i * 100000000L)).as("l_orderkey"),
            col("l_linenumber"), col("l_quantity"))
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(dvDir)
        quiesce()
        measure("dv_read_sparse_delete") {
          val dv = ops.Layout.deletionVectors(spark, dvDir,
            col("l_orderkey") % 100 === 0)
          ops.Layout.readWithDeletes(spark, dvDir, dv).count()
        }
      },
      if (!want("view_refresh_delete_delta"))
        ("view_refresh_delete_delta", skip._1, skip._2, skip._3)
      else {
        // q94 at delta scale: the (key, n, min, max) view over the
        // blown-up table is PRE-BUILT state; deleting rows under 0.1%
        // of keys must recompute only those groups
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_suppkey", "l_orderkey", "l_quantity")
        val liN = (0 until copies).map { i =>
          li.select((col("l_suppkey") + lit(i * 1000000L)).as("l_suppkey"),
            col("l_orderkey"), col("l_quantity"))
        }.reduce(_ unionAll _).localCheckpoint(eager = true)
        val view = liN.groupBy("l_suppkey")
          .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("min_v"),
            max(col("l_quantity")).as("max_v"))
          .localCheckpoint(eager = true)
        quiesce()
        measure("view_refresh_delete_delta") {
          val delPred = col("l_suppkey") % 1000 === 0 &&
            col("l_orderkey") % 2 === 0
          ops.Merge.refreshAggAfterDelete(view, liN.filter(!delPred),
            liN.filter(delPred).select("l_suppkey"),
            "l_suppkey", "l_quantity").count()
        }
      },
      measure("grid_density_clump") { // e26 under a 20k-point hot cell
        // density clustering never forms a point pair: the clump adds
        // ONE dense cell (not C(20k,2) ≈ 2·10⁸ pairs), the merge graph
        // stays planner-scale, and points move through one count
        // aggregate + one join-back regardless of how hot a cell is
        val pts = embN.select(col("vec_id").as("id"),
            element_at(col("embedding"), 1).cast("double").as("x"),
            element_at(col("embedding"), 2).cast("double").as("y"))
          .unionAll(spark.range(0, 20000)
            .select((col("id") + 600000000L).as("id"),
              (lit(0.055) + col("id").cast("double") * lit(1e-9)).as("x"),
              lit(0.055).as("y")))
        ops.Similarity.gridDensityClusters(pts, "id", col("x"), col("y"),
          scale = 1000.0, cellWidth = 100.0, minPts = 20L).count()
      },
      if (!want("view_refresh_delta"))
        ("view_refresh_delta", skip._1, skip._2, skip._3)
      else {
        // q86: the maintained view is PRE-BUILT state — construct and
        // materialize it OUTSIDE the timer (at 20 copies the build's
        // 3M-row join shuffled ~44 MB and was masquerading as refresh
        // cost); the measure then sees ONLY the delta-join refresh
        val o = spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val oN = (0 until copies).map { i =>
          o.select((col("o_orderkey") + lit(i * 100000000L)).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice"))
        }.reduce(_ unionAll _).localCheckpoint(eager = true)
        val c = spark.read.parquet(s"$sfDir/customer.parquet")
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val view = oN.join(c, col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_custkey", "o_totalprice",
            "c_acctbal", "c_nationkey")
          .localCheckpoint(eager = true) // the maintained state, pre-built
        quiesce() // keep the build's shuffle out of the refresh meter
        measure("view_refresh_delta") { // 0.1%-delta refresh cost ONLY
          val dB = c.filter(col("c_custkey") % 1000 === 0)
            .select(col("c_custkey"), col("c_nationkey"),
              (col("c_acctbal") + 1.0).as("c_acctbal"),
              lit(false).as("is_delete"))
          val bNew = ops.Merge.applyChanges(c, dB, "c_custkey")
            .withColumnRenamed("c_custkey", "o_custkey")
          ops.Merge.incrementalJoinView(view, oN, bNew,
            oN.select("o_orderkey").filter(lit(false)),
            dB.select(col("c_custkey").as("o_custkey")),
            "o_orderkey", "o_custkey").count()
        }
      })

    // ---- s38's external-query probe at soak scale, build and probe
    // timed SEPARATELY (round-17 verdict: the fused timer read as a
    // probe regression — the 50× wall is dominated by the ONE-TIME
    // index build, O(n·nlist) = O(n^1.5) under the nlist ∝ √n sizing
    // rule, while probe cost is O(batch·nprobe·(n/nlist)) with
    // bytes/query flat). ivf_knn_probe keeps its historical name but
    // now times the PROBE ONLY; ivf_probe_build carries the build.
    val ivfProbeResults: Seq[(String, Double, Double, Long)] = {
      if (!want("ivf_probe_build", "ivf_knn_probe")) Seq()
      else {
        val nlist = math.max(32,
          math.round(32 * math.sqrt(copies / 10.0)).toInt)
        var idx: ops.Similarity.IvfIndex = null
        def build(): Long = {
          val built = ops.Similarity.ivfIndexSeeded(embN, "vec_id",
            "embedding", nlist = nlist)
          idx = built.copy(assigned = built.assigned.ckpt)
          idx.assigned.count() // the build, fully materialized
        }
        val rBuild = measure("ivf_probe_build") { build() }
        if (idx == null) build() // probe-only filter still needs the index
        val queries = embN.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 500000000L).as("qid"),
            reverse(col("embedding").cast("array<double>")).as("qv"))
        val rProbe = measure("ivf_knn_probe") {
          idx.knnProbe(queries, "qid", "qv", k = 5, nprobe = 4).count()
        }
        ops.Ckpt.release(idx.assigned)
        Seq(rBuild, rProbe)
      }
    }

    // ---- Layout metadata ops at 10^4 FILES (VERDICT r11 watch item):
    // the manifest family's driver-side file lists grow with #files —
    // pin that O(#files) contract with wall numbers at the file count
    // where it would first hurt. The data is small ON PURPOSE: these
    // ops' costs are per-FILE (stats pass task overhead, listing diff,
    // path collect), not per-row, so 10^4 files of 100 rows exercises
    // exactly the dimension that scales.
    // file count is a knob (SPARK_GRAFT_SOAK_MANIFEST_FILES) so the same
    // entries pin additional scale points (10^5 sits well under the
    // default spark.graft.manifest.maxFiles=10^6 ceiling)
    val mfFiles = sys.env.getOrElse("SPARK_GRAFT_SOAK_MANIFEST_FILES",
      "10000").toInt
    val mfTag = s"${mfFiles / 1000}k"
    val layoutResults: Seq[(String, Double, Double, Long)] =
      if (!want(s"manifest_build_${mfTag}_files", s"pruned_read_${mfTag}_files",
        s"manifest_extend_${mfTag}_plus_100",
        s"manifest_grouped_build_${mfTag}_files",
        s"pruned_read_grouped_${mfTag}_files",
        s"manifest_grouped_extend_${mfTag}_plus_100",
        s"takedown_address_${mfTag}_files",
        s"vacuum_orphans_${mfTag}_files")) Seq()
      else {
      val mfDir = soakTempDir("graft-soak-mf")
      val mfRows = mfFiles * 100L
      val fixture = spark.range(0, mfRows)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
      // ≤10^5 files: one range task per file (the layout every recorded
      // battery used). Past that a task-per-file write stage collapses
      // on scheduling overhead in local mode (10^6 tasks ≈ hours), so
      // the writer ROLLS files with maxRecordsPerFile inside ~10^3
      // sorted range tasks — same resulting layout (each file 100
      // contiguous-k rows; tasks' tail files may run short), at a
      // planner-scale task count
      if (mfFiles <= 100000)
        fixture.repartitionByRange(mfFiles, col("k"))
          .write.mode("overwrite").parquet(s"$mfDir/t")
      else
        fixture.repartitionByRange(1024, col("k"))
          .sortWithinPartitions("k")
          .write.option("maxRecordsPerFile", "100")
          .mode("overwrite").parquet(s"$mfDir/t")
      quiesce()
      var manifest: org.apache.spark.sql.DataFrame = null
      val rBuild = measure(s"manifest_build_${mfTag}_files") {
        manifest = ops.Layout.statsManifest(spark, s"$mfDir/t", Seq("k"))
        manifest.count()
      }
      val rPrune = measure(s"pruned_read_${mfTag}_files") {
        // the probe keeps ~10 of #files; cost = manifest filter +
        // path collect + a 10-file scan, never the full-listing walk
        ops.Layout.prunedRead(spark, s"$mfDir/t", manifest, "k",
          lit(mfRows / 2), lit(mfRows / 2 + 999L)).count()
      }
      spark.range(mfRows, mfRows + 10000L)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
        .repartitionByRange(100, col("k"))
        .write.mode("append").parquet(s"$mfDir/t")
      quiesce()
      val rExtend = measure(s"manifest_extend_${mfTag}_plus_100") {
        // O(new data): stats over the 100 fresh files + one listing diff
        // against the known paths — never a table re-scan
        ops.Layout.extendManifest(spark, s"$mfDir/t", manifest, Seq("k"))
          .count()
      }
      // two-level (manifest-of-manifests) path over the SAME fixture:
      // build groups of 256 files, then probe the same ~10-file range.
      // The grouped probe's driver collect is O(groups-touched ·
      // groupSize) paths instead of a per-probe scan of all #files
      // manifest rows — `rows` records the number of SURVIVING file
      // paths the probe collected (the data count runs separately), so
      // the soak JSON shows the driver-bytes gap directly against the
      // fixture's total file count.
      val mfpDir = soakTempDir("graft-soak-mfp")
      val rBuildG = measure(s"manifest_grouped_build_${mfTag}_files") {
        ops.Layout.statsManifestPartitioned(spark, s"$mfDir/t", Seq("k"),
          s"$mfpDir/mf", groupSize = 256L).count()
      }
      val rPruneG = measure(s"pruned_read_grouped_${mfTag}_files") {
        val pruned = ops.Layout.prunedReadGrouped(spark, s"$mfDir/t",
          s"$mfpDir/mf", "k", lit(mfRows / 2), lit(mfRows / 2 + 999L))
        pruned.count() // exercise the pruned scan end to end
        pruned.inputFiles.length.toLong // = collected surviving paths
      }
      // grouped incremental growth: another 100-file wave, absorbed at
      // O(new data) — tail-group fill + touched-rollup refresh only
      spark.range(mfRows + 10000L, mfRows + 20000L)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
        .repartitionByRange(100, col("k"))
        .write.mode("append").parquet(s"$mfDir/t")
      quiesce()
      val rExtendG = measure(s"manifest_grouped_extend_${mfTag}_plus_100") {
        ops.Layout.extendManifestGrouped(spark, s"$mfDir/t", s"$mfpDir/mf",
          Seq("k"), groupSize = 256L).count()
      }
      // LIFECYCLE COMPOSITION on the same fixture — the remaining two
      // verbs a production table runs at this file count. Takedown
      // addressing: 500 scattered keys range-join the manifest rows
      // (planner-scale) to find the touched files — `rows` records how
      // few of #files a delete wave actually addresses. Vacuum: the
      // full listing diff against the live manifest — zero deletions
      // REQUIREd (everything is tracked), the measure is the diff's
      // cost at this file count.
      val fullManifest = ops.Layout.statsManifest(spark, s"$mfDir/t",
        Seq("k")).localCheckpoint(eager = true)
      val rAddr = measure(s"takedown_address_${mfTag}_files") {
        import spark.implicits._
        val keys = spark.createDataset(
          (0 until 500).map(i => (mfRows + 20000L) / 500 * i))
          .toDF("k")
        ops.Layout.keyTouchedFiles(fullManifest, keys, "k").length.toLong
      }
      val rVac = measure(s"vacuum_orphans_${mfTag}_files") {
        val (nDel, nKeep) = ops.Layout.vacuumOrphans(spark, s"$mfDir/t",
          Seq(fullManifest))
        require(nDel == 0, s"vacuum deleted $nDel tracked files")
        nKeep.toLong
      }
      Seq(rBuild, rPrune, rExtend, rBuildG, rPruneG, rExtendG, rAddr, rVac)
    }

    // ---- CDC extraction + full-text skipping at volume: snapshotDiff
    // must cost O(changed files) regardless of table size (here the
    // delta is 1 appended file + a 1-file DV wave against a 1000-file
    // table — the full merge-on-read baseline runs beside it), and a
    // rare-term token-bloom probe must touch only admitting files.
    // `rows` records the change count (diff) / the collected file-path
    // count (probes), so the JSON shows the pruning directly.
    val cdcResults: Seq[(String, Double, Double, Long)] =
      if (!want("snapshot_diff_small_delta_1k_files",
        "snapshot_read_full_1k_files", "token_bloom_build_64_files",
        "token_bloom_probe_rare", "token_bloom_probe_absent")) Seq()
      else {
      val cdDir = soakTempDir("graft-soak-cdc")
      val cdFiles = 1000
      val cdRows = cdFiles * 1000L
      spark.range(0, cdRows)
        .select(col("id").as("k"), (col("id") % 97).as("v"),
          md5(col("id").cast("string")).as("payload"))
        .repartitionByRange(cdFiles, col("k"))
        .write.mode("overwrite").parquet(s"$cdDir/t")
      val cm1 = ops.Layout.statsManifest(spark, s"$cdDir/t", Seq("k")).ckpt
      val cdv1 = ops.Layout.deletionVectors(spark, s"$cdDir/t",
        col("k") % 100000 === 7).ckpt
      // the delta: ONE appended file, plus a DV wave confined to the
      // FIRST file's key range (k < 1000) — 2 changed files total
      spark.range(cdRows, cdRows + 1000L)
        .select(col("id").as("k"), (col("id") % 97).as("v"),
          md5(col("id").cast("string")).as("payload"))
        .coalesce(1).write.mode("append").parquet(s"$cdDir/t")
      val cm2 = ops.Layout.extendManifest(spark, s"$cdDir/t", cm1,
        Seq("k")).ckpt
      val cdv2 = cdv1.unionAll(ops.Layout.deletionVectorsForKeys(spark,
        s"$cdDir/t",
        spark.range(0, 1000L).select(col("id").as("k")), "k")).ckpt
      quiesce()
      val rFull = measure("snapshot_read_full_1k_files") {
        ops.Layout.snapshotReadWithDeletes(spark, s"$cdDir/t", cm2, cdv2)
          .count()
      }
      val rDiff = measure("snapshot_diff_small_delta_1k_files") {
        val d = ops.Layout.snapshotDiff(spark, s"$cdDir/t",
          cm1, cm2, cdv1, cdv2)
        d.count() // 1999 changes, exercised end to end
        d.inputFiles.length.toLong // = changed files scanned (2 of 1001)
      }
      val tbDir = soakTempDir("graft-soak-tb")
      // range layout clusters each soak copy into its own ~64/copies
      // file band, so the per-copy suffix token is the planted rare term
      docsN.repartitionByRange(64, col("doc_id"))
        .write.mode("overwrite").parquet(s"$tbDir/t")
      quiesce()
      var tbIdx: org.apache.spark.sql.DataFrame = null
      val rTbBuild = measure("token_bloom_build_64_files") {
        tbIdx = ops.Layout.tokenBloomIndex(spark, s"$tbDir/t", "text").ckpt
        tbIdx.count()
      }
      val rareTerm = if (copies > 1) s"soakcopy${copies - 1}" else "the"
      val rTbRare = measure("token_bloom_probe_rare") {
        val r = ops.Layout.tokenBloomRead(spark, s"$tbDir/t", tbIdx,
          "text", rareTerm)
        r.count() // exercise the pruned scan end to end
        r.inputFiles.length.toLong // = files the bloom admitted
      }
      val rTbAbsent = measure("token_bloom_probe_absent") {
        ops.Layout.tokenBloomRead(spark, s"$tbDir/t", tbIdx,
          "text", "zqxjkvbn").inputFiles.length.toLong
      }
      Seq(rFull, rDiff, rTbBuild, rTbRare, rTbAbsent)
    }

    // ---- STREAMING-TAKEDOWN fold at volume (s42's per-batch work,
    // soak-sized): 4 delete-key waves against a 1000-file table, each
    // folding the agg view forward via snapshotDiff(m, m, dvPrev, dvCur)
    // + incrementalAgg — never re-aggregating the base. The full
    // recompute baseline runs beside it; `rows` records the final view's
    // group count (fold) / the live row count (baseline).
    val takedownResults: Seq[(String, Double, Double, Long)] =
      if (!want(s"takedown_wave_fold_${copies * 100}_files",
        s"view_recompute_full_${copies * 100}_files",
        s"takedown_grouped_address_${copies * 100}_files")) Seq()
      else {
      val tdDir = soakTempDir("graft-soak-td")
      // copies scales the TABLE (100 files per copy); the 4 erase waves
      // stay fixed-size, so fold cost should stay flat while the full
      // recompute grows with the table
      val tdFiles = 100 * copies
      val tdRows = tdFiles * 1000L
      spark.range(0, tdRows)
        .select(col("id").as("k"), (col("id") % 97).as("v"),
          md5(col("id").cast("string")).as("payload"))
        .repartitionByRange(tdFiles, col("k"))
        .write.mode("overwrite").parquet(s"$tdDir/t")
      val tdm = ops.Layout.statsManifest(spark, s"$tdDir/t", Seq("k")).ckpt
      var tdv = ops.Layout.deletionVectors(spark, s"$tdDir/t",
        lit(false)).ckpt
      var tview = ops.Layout.snapshotReadWithDeletes(spark, s"$tdDir/t",
          tdm, tdv)
        .groupBy("v")
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("decimal(18,2)")).as("total")).ckpt
      quiesce()
      val rFold = measure(s"takedown_wave_fold_${tdFiles}_files") {
        // each wave erases one file's key slab — the diff scans only
        // the DV-touched files, the fold shuffles only touched groups
        (0 until 4).foreach { w =>
          val grown = tdv.unionAll(ops.Layout.deletionVectorsForKeysPruned(
            spark, s"$tdDir/t", tdm,
            spark.range(w * 1000L, w * 1000L + 1000L)
              .select(col("id").as("k")), "k")).ckpt
          val delta = ops.Layout.snapshotDiff(spark, s"$tdDir/t",
            tdm, tdm, tdv, grown)
            .withColumn("sign", when(col("_change_type") === "insert",
              lit(1L)).otherwise(lit(-1L)))
          tview = ops.Merge.incrementalAgg(tview, delta, "v", "k",
            "sign").ckpt
          tdv = grown
        }
        tview.count()
      }
      quiesce()
      val rRecompute = measure(s"view_recompute_full_${tdFiles}_files") {
        val live = ops.Layout.snapshotReadWithDeletes(spark, s"$tdDir/t",
          tdm, tdv)
        live.groupBy("v")
          .agg(count(lit(1)).as("n"),
            sum(col("k").cast("decimal(18,2)")).as("total")).count()
        live.count()
      }
      // grouped-manifest address resolution over the SAME fixture:
      // `rows` records the DV rows resolved; the claim worth a number
      // is the scan set — the wave's keys live in 2 of 1000 files, and
      // the group rollup confines the file-row read to their partitions
      val gmfDir = soakTempDir("graft-soak-tdg")
      ops.Layout.statsManifestPartitioned(spark, s"$tdDir/t", Seq("k"),
        s"$gmfDir/mf", groupSize = 64L)
      quiesce()
      val rGrouped = measure(s"takedown_grouped_address_${tdFiles}_files") {
        ops.Layout.deletionVectorsForKeysGrouped(spark, s"$tdDir/t",
          s"$gmfDir/mf",
          spark.range(tdRows / 2, tdRows / 2 + 2000L)
            .select(col("id").as("k")), "k")
          .count()
      }
      Seq(rFold, rRecompute, rGrouped)
    }

    // ---- MV-REWRITE read path at volume: the same dashboard aggregate
    // answered two ways over a merge-on-read table — rewritten onto the
    // O(#groups) view (a one-file scan, zero shuffle: the optimized
    // plan has no Aggregate left) vs the direct re-aggregation (reads
    // every live file, shuffles the partials). The rewrite's cost is
    // table-size-INDEPENDENT; the direct read is the linear cost every
    // un-rewritten dashboard refresh pays.
    val mvResults: Seq[(String, Double, Double, Long)] =
      if (!want(s"mv_rewrite_view_read_${copies * 100}_files",
        s"mv_direct_agg_${copies * 100}_files")) Seq()
      else {
      val mvDir = soakTempDir("graft-soak-mvr")
      val mvFiles = 100 * copies
      val mvRows = mvFiles * 1000L
      spark.range(0, mvRows)
        .select(col("id"), (col("id") % 997).as("g"),
          (col("id") % 1000).as("x"),
          md5(col("id").cast("string")).as("payload"))
        .repartitionByRange(mvFiles, col("id"))
        .write.mode("overwrite").parquet(s"$mvDir/t")
      ops.Layout.statsManifest(spark, s"$mvDir/t", Seq("id"))
        .write.parquet(s"$mvDir/m")
      ops.Layout.deletionVectorsForKeys(spark, s"$mvDir/t",
          spark.range(0, 1000).select(col("id")), "id")
        .write.parquet(s"$mvDir/dv")
      def mvSnap() = ops.Layout.snapshotReadWithDeletes(spark, s"$mvDir/t",
          spark.read.parquet(s"$mvDir/m"), spark.read.parquet(s"$mvDir/dv"))
        .select("g", "x")
      ops.Merge.aggView(mvSnap(), "g", "x").write.parquet(s"$mvDir/view")
      ops.Catalog.commit(spark, s"$mvDir/cat", Map(
        "manifest" -> s"$mvDir/m", "dv" -> s"$mvDir/dv",
        "view" -> s"$mvDir/view"))
      plans.MvRewrite.registerFromCatalog(spark, "soak_mv", s"$mvDir/t",
        s"$mvDir/cat", "g", "x")
      def mvQuery() = mvSnap().groupBy("g").agg(
        count(lit(1)).as("n_rows"), sum(col("x")).as("sum_x"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"))
      // plan construction is paid OUTSIDE the timers: both variants pay
      // the identical planner-scale manifest resolve (the documented
      // O(#files) consumer contract) — what the rewrite removes is the
      // DATA path, so that is what gets measured
      val qView = mvQuery()
      require(qView.queryExecution.optimizedPlan.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isEmpty, "soak mv rewrite did not fire")
      spark.conf.set(plans.MvRewrite.EnabledConf, "false")
      val qDirect = try {
        val q = mvQuery()
        q.queryExecution.optimizedPlan // pin the un-rewritten plan
        q
      } finally spark.conf.set(plans.MvRewrite.EnabledConf, "true")
      // `rows` records the SCAN SET — the number that stays flat for
      // the rewrite (1 view file) and linear for the direct read
      def scannedFiles(q: org.apache.spark.sql.DataFrame): Long =
        q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.length.toLong
              case _ => 0L
            }
        }.sum
      quiesce()
      val rMvView = measure(s"mv_rewrite_view_read_${mvFiles}_files") {
        qView.count()
        scannedFiles(qView)
      }
      val rMvDirect = measure(s"mv_direct_agg_${mvFiles}_files") {
        qDirect.count()
        scannedFiles(qDirect)
      }
      plans.MvRewrite.unregister("soak_mv")
      Seq(rMvView, rMvDirect)
    }

    // ---- Z-ORDER clustering: scan-set + maintenance-cost evidence.
    // A row-ordered table scatters BOTH box dimensions across every
    // file, so a 2-D box admits the whole table; after OPTIMIZE ZORDER
    // the same box admits O(box) files (rows records the scan set,
    // same convention as the mv entries). The delta pass then shows
    // maintenance stays O(appends): clustering a 5% append wave costs
    // a small fraction of the full rewrite and touches only the new
    // files, at every table size.
    val zorderResults: Seq[(String, Double, Double, Long)] = {
      val zFiles = 100 * copies
      if (!want(s"zorder_optimize_${zFiles}_files",
        s"zorder_box_before_${zFiles}_files",
        s"zorder_box_after_${zFiles}_files",
        s"zorder_box_cached_${zFiles}_files",
        s"zorder_delta_cluster_${zFiles}_files")) Seq()
      else {
        val zDir = soakTempDir("graft-soak-zo")
        val zRows = zFiles * 1000L
        // x and y must be INDEPENDENTLY scattered in write order (a
        // y that is a function of id-mod-1000 collapses onto x and
        // empties the box): xxhash64 decorrelates y from both id order
        // and x while staying deterministic
        def zdf(lo: Long, hi: Long) = spark.range(lo, hi)
          .select(col("id"), (col("id") % 1000).as("x"),
            pmod(xxhash64(col("id")), lit(1000L)).as("y"))
        zdf(0, zRows).repartitionByRange(zFiles, col("id"))
          .write.parquet(s"$zDir/t")
        ops.Layout.statsManifest(spark, s"$zDir/t", Seq("x", "y"))
          .write.parquet(s"$zDir/m1")
        ops.Catalog.commit(spark, s"$zDir/cat",
          Map("manifest" -> s"$zDir/m1"))
        def scannedFiles(q: DataFrame): Long =
          q.queryExecution.optimizedPlan.collect {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              lr.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.inputFiles.length.toLong
                case _ => 0L
              }
          }.sum
        def boxQuery(version: Int): DataFrame = {
          val refs = ops.Catalog.resolve(spark, s"$zDir/cat", version)
          ops.Layout.snapshotRead(spark, s"$zDir/t",
              spark.read.parquet(refs("manifest")))
            .filter(col("x").between(100L, 120L) &&
              col("y").between(200L, 220L))
        }
        quiesce()
        val rBefore = measure(s"zorder_box_before_${zFiles}_files") {
          plans.ScanPruneRewrite.registerFromCatalog(spark, "soak_z1",
            s"$zDir/t", s"$zDir/cat", version = Some(1))
          try {
            val q = boxQuery(1)
            q.count()
            scannedFiles(q)
          } finally plans.ScanPruneRewrite.unregister("soak_z1")
        }
        val rOpt = measure(s"zorder_optimize_${zFiles}_files") {
          val v = ops.Layout.optimizeZorder(spark, s"$zDir/t",
            s"$zDir/cat", zDir, "x", "y", bits = 10, numFiles = zFiles,
            statsCols = Seq("x", "y"))
          spark.read.parquet(
            ops.Catalog.resolve(spark, s"$zDir/cat", v)("manifest")).count()
        }
        // ---- the post-cluster box probe, DECOMPOSED (round-17 verdict:
        // the ~15 s wall at 4000 files didn't drop with the 6-file scan
        // set — attribute it): register = one-time catalog resolve +
        // snapshot file-index build + manifest collect; qbuild = the
        // per-query snapshotRead (a SECOND O(#files) file-index build —
        // the avoidable floor); plan = optimizer incl. the rule's
        // admission arithmetic; exec = the count job over the admitted
        // files. The `cached` entry is the steady-state per-query cost:
        // probing through ScanPruneRewrite.scan reuses the registered
        // relation, so no per-query index rebuild happens at all.
        var tReg = 0.0; var tQbuild = 0.0; var tPlan = 0.0; var tExec = 0.0
        val rAfter = measure(s"zorder_box_after_${zFiles}_files") {
          def clock[T](f: => T): (T, Double) = {
            val t0 = System.nanoTime()
            val r = f
            (r, (System.nanoTime() - t0) / 1e9)
          }
          val (_, a) = clock {
            plans.ScanPruneRewrite.registerFromCatalog(spark, "soak_z2",
              s"$zDir/t", s"$zDir/cat", version = Some(2))
          }
          tReg = a
          try {
            val (q, b) = clock { boxQuery(2) }
            tQbuild = b
            val (_, c) = clock { q.queryExecution.optimizedPlan }
            tPlan = c
            val (_, d) = clock { q.count() }
            tExec = d
            scannedFiles(q)
          } finally plans.ScanPruneRewrite.unregister("soak_z2")
        }
        val rCached = measure(s"zorder_box_cached_${zFiles}_files") {
          plans.ScanPruneRewrite.registerFromCatalog(spark, "soak_z3",
            s"$zDir/t", s"$zDir/cat", version = Some(2))
          try {
            // steady-state repeat probes: the registered relation serves
            // every query; wall here is what a dashboard's per-query
            // latency actually looks like after clustering
            def probe(): DataFrame = plans.ScanPruneRewrite
              .scan(spark, "soak_z3")
              .filter(col("x").between(100L, 120L) &&
                col("y").between(200L, 220L))
            probe().count()
            val q = probe()
            q.count()
            scannedFiles(q)
          } finally plans.ScanPruneRewrite.unregister("soak_z3")
        }
        val decomposed =
          if (rAfter._2 < 0) Seq()
          else Seq(
            (s"zorder_after_register_${zFiles}_files", tReg, 0.0, 0L),
            (s"zorder_after_qbuild_${zFiles}_files", tQbuild, 0.0, 0L),
            (s"zorder_after_plan_${zFiles}_files", tPlan, 0.0, 0L),
            (s"zorder_after_exec_${zFiles}_files", tExec, 0.0, 0L))
        // a FIXED 50-file append wave (not a table fraction — the claim
        // is that maintenance cost tracks the WAVE, so the wave must
        // stay constant across table scale points) lands via
        // commitAppend OUTSIDE the timer (ingest cost, paid
        // regardless). commitAppend, not extendManifest: the optimize
        // left superseded pre-cluster files on disk, and a directory-
        // listing diff would resurrect them into the manifest (and
        // silently hand the delta pass the whole table) — manifest
        // growth after any file-removing op must be row-union of
        // commit stats (the s44 loop's contract)
        val m2 = spark.read.parquet(
          ops.Catalog.resolve(spark, s"$zDir/cat", 2)("manifest"))
        val add = ops.Layout.commitAppend(spark,
          zdf(zRows, zRows + 50000L).repartitionByRange(50, col("id")),
          s"$zDir/t", Seq("x", "y"))
        m2.unionByName(add).write.parquet(s"$zDir/m3")
        ops.Catalog.commit(spark, s"$zDir/cat",
          Map("manifest" -> s"$zDir/m3"))
        val rDelta = measure(s"zorder_delta_cluster_${zFiles}_files") {
          val v4 = ops.Layout.optimizeZorderDelta(spark, s"$zDir/t",
            s"$zDir/cat", zDir, baseVersion = 2, "x", "y", bits = 10,
            numFiles = 50, statsCols = Seq("x", "y"))
          val mNew = spark.read.parquet(
            ops.Catalog.resolve(spark, s"$zDir/cat", v4)("manifest"))
          mNew.count() - zFiles // files the delta pass produced
        }
        Seq(rBefore, rOpt, rAfter, rCached, rDelta) ++ decomposed
      }
    }

    // ---- JOIN-DRIVEN FILE SKIPPING + MERGE-ON-READ: scan-set and
    // wave-cost evidence. A FIXED delta-scale probe (20 dim join keys /
    // a 200-key merge wave) hits a key-clustered table at 1000 and
    // 4000 files: the admitted scan set and the merge's touched-file
    // count must track the PROBE (flat), while the unassisted join's
    // scan set tracks the TABLE (linear) — the difference is the whole
    // point of file-level runtime filters and DV-targeted merges at
    // 100 TB. rows records the file counts; merge entries record wall.
    val joinSkipResults: Seq[(String, Double, Double, Long)] = {
      val jFiles = 100 * copies
      val names = Seq(s"join_skip_scan_${jFiles}_files",
        s"join_skip_bloom_scan_${jFiles}_files",
        s"join_skip_join_wall_${jFiles}_files",
        s"join_full_join_wall_${jFiles}_files",
        s"merge_mor_wave_${jFiles}_files")
      if (!names.exists(n => want(n))) Seq()
      else {
        import spark.implicits._
        val jDir = soakTempDir("graft-soak-jskip")
        val jRows = jFiles * 1000L
        // k clustered (range layout); h scattered (hash of k) — the
        // adverse layout only the bloom can skip
        spark.range(jRows)
          .select(col("id").as("k"), xxhash64(col("id")).as("h"),
            (col("id") % 13).as("payload"))
          .repartitionByRange(jFiles, col("k"))
          .write.parquet(s"$jDir/t")
        val manifest = ops.Layout.statsManifest(spark, s"$jDir/t", Seq("k"))
          .localCheckpoint(eager = true)
        val bloom = ops.Layout.bloomIndexSized(spark, s"$jDir/t", "h")
          .localCheckpoint(eager = true)
        val dimKeys = (0 until 20).map(i => i * (jRows / 20) + 17)
        val dim = dimKeys.toDF("k")
        val dimH = dimKeys.toDF("k0")
          .select(xxhash64(col("k0")).as("h"))
        quiesce()
        val rScan = measure(s"join_skip_scan_${jFiles}_files") {
          ops.Layout.joinSkipRead(spark, s"$jDir/t", Some(manifest), None,
            dim, "k").inputFiles.length.toLong
        }
        val rBloomScan = measure(s"join_skip_bloom_scan_${jFiles}_files") {
          ops.Layout.joinSkipRead(spark, s"$jDir/t", None, Some(bloom),
            dimH, "h").inputFiles.length.toLong
        }
        val rJoin = measure(s"join_skip_join_wall_${jFiles}_files") {
          ops.Layout.joinSkipRead(spark, s"$jDir/t", Some(manifest), None,
            dim, "k").join(broadcast(dim), Seq("k")).count()
        }
        val rFull = measure(s"join_full_join_wall_${jFiles}_files") {
          spark.read.parquet(s"$jDir/t")
            .join(broadcast(dim), Seq("k")).count()
        }
        // merge-on-read wave: 200 scattered updates — the DV resolution
        // must open only the files whose span holds a changed key
        // (≤200 at BOTH table sizes), never the table
        ops.Layout.statsManifest(spark, s"$jDir/t", Seq("k"))
          .write.parquet(s"$jDir/m1")
        ops.Catalog.commit(spark, s"$jDir/cat2",
          Map("manifest" -> s"$jDir/m1"))
        val changes = (0 until 200).map(i => i * (jRows / 200) + 13)
          .toDF("k")
          .select(col("k"), xxhash64(col("k") + 1).as("h"),
            lit(99L).as("payload"), lit(false).as("is_delete"))
        val rMerge = measure(s"merge_mor_wave_${jFiles}_files") {
          val v = ops.Layout.mergeOnReadCommit(spark, s"$jDir/t",
            s"$jDir/cat2", jDir, changes, "k", "is_delete", Seq("k"))
          val refs = ops.Catalog.resolve(spark, s"$jDir/cat2", v)
          spark.read.parquet(refs("dv"))
            .select("file").distinct().count() // files the wave touched
        }
        Seq(rScan, rBloomScan, rJoin, rFull, rMerge)
      }
    }

    // ---- MULTI-WRITER lake cycle at 10× scale (q105's interleaving,
    // soak-sized): append → delete wave → append → manifest extend →
    // second wave → DV compaction → vacuum, with the final merge-on-
    // read row count ASSERTED against the equivalent predicate filter.
    // The wall/shuffle number is the full maintenance cycle a daily
    // lake job would pay; correctness of every intermediate pin is the
    // q105 gate's job, this entry proves the cycle holds at volume.
    val multiwriterResult: (String, Double, Double, Long) =
      if (!want("lake_multiwriter_cycle"))
        ("lake_multiwriter_cycle", skip._1, skip._2, skip._3)
      else {
      val mwDir = soakTempDir("graft-soak-mw")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val liN = (0 until copies).map { i =>
        li.select((col("l_orderkey") + lit(i * 100000000L)).as("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
      }.reduce(_ unionAll _).localCheckpoint(eager = true)
      val want = liN.filter(
        !(col("l_orderkey") % 2 === 0 && col("l_quantity") >= 48.0) &&
          !(col("l_orderkey") % 1000 === 0)).count()
      quiesce()
      measure("lake_multiwriter_cycle") {
        liN.filter(col("l_orderkey") % 2 === 0)
          .repartitionByRange(8, col("l_orderkey"))
          .write.parquet(s"$mwDir/t")
        val m1 = ops.Layout.statsManifest(spark, s"$mwDir/t", Seq("l_orderkey"))
        val dv1 = ops.Layout.deletionVectors(spark, s"$mwDir/t",
            col("l_quantity") >= 48.0)
          .localCheckpoint(eager = true) // wave 1: epoch-1 files only
        liN.filter(col("l_orderkey") % 2 === 1)
          .repartitionByRange(8, col("l_orderkey"))
          .write.mode("append").parquet(s"$mwDir/t")
        val m2 = ops.Layout.extendManifest(spark, s"$mwDir/t", m1,
          Seq("l_orderkey"))
        val dv = dv1.unionAll(ops.Layout.deletionVectors(spark, s"$mwDir/t",
            col("l_orderkey") % 1000 === 0))
          .distinct().localCheckpoint(eager = true)
        val residual = ops.Layout.compactDeletes(spark, s"$mwDir/t",
            s"$mwDir/t2", dv, rewriteRatio = 0.25)
          .localCheckpoint(eager = true)
        val (nDel, _) = ops.Layout.vacuumOrphans(spark, s"$mwDir/t", Seq(m2))
        require(nDel == 0, s"vacuum deleted $nDel tracked file(s)")
        val got = ops.Layout.readWithDeletes(spark, s"$mwDir/t2", residual)
          .count()
        require(got == want, s"multiwriter cycle lost rows: $got != $want")
        got
      }
    }

    // ---- GENUINELY CONCURRENT catalog writers at volume: q145 proves
    // correctness for 2×20; this entry measures the CAS retry loop's
    // THROUGHPUT under heavier contention — 4 real threads × 25
    // read-modify-write commits racing one catalog. rows = committed
    // versions (REQUIREd = 100, every world = predecessor + 1). The
    // number to watch is wall/commit: each commit is a claim create +
    // tiny parquet write + marker create, and contention only costs
    // bounded backoff retries, never a lost update.
    val concurrentCommitResult: (String, Double, Double, Long) =
      if (!want("concurrent_commit_race"))
        ("concurrent_commit_race", skip._1, skip._2, skip._3)
      else {
        val ccDir = soakTempDir("graft-soak-ccr")
        val cat = s"$ccDir/cat"
        quiesce()
        measure("concurrent_commit_race") {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
          val start = new java.util.concurrent.CountDownLatch(1)
          def writer(tag: String) =
            pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
              def call(): Seq[Int] = {
                start.await()
                (1 to 25).map { i =>
                  ops.Catalog.commitRetry(spark, cat,
                    base => base + (s"$tag-$i" -> s"ref/$tag-$i"),
                    maxAttempts = 200)
                }
              }
            })
          val fs = Seq("a", "b", "c", "d").map(writer)
          start.countDown()
          val got = fs.flatMap(_.get(300,
            java.util.concurrent.TimeUnit.SECONDS))
          pool.shutdown()
          require(got.toSet.size == 100,
            s"commit collision: ${got.sorted.mkString(",")}")
          val vs = ops.Versions.listVersions(cat)(spark)
          require(vs == (1 to 100), s"history not dense: ${vs.size}")
          val finalKeys = ops.Catalog.resolveCurrent(spark, cat).keySet
          require(finalKeys.size == 100, s"lost updates: ${finalKeys.size}")
          vs.size.toLong
        }
      }

    // ---- CONTENTION SCALING: the same race at 2/4/8/16 writers with
    // the TOTAL commit count held at 96, so s/commit isolates how the
    // backoff policy degrades as writers pile onto one catalog — the
    // curve an operator needs before deploying N ingest jobs. Each
    // point runs on a fresh catalog; rows = committed versions
    // (REQUIREd dense = 96, zero lost updates).
    val ccrScalingResults: Seq[(String, Double, Double, Long)] = {
      val active = want("ccr_scaling_2", "ccr_scaling_4", "ccr_scaling_8",
        "ccr_scaling_16")
      if (active) {
        // warm the commit path OUTSIDE the timers: the first parquet
        // write in a fresh JVM costs seconds of session/codegen warmup
        // and would masquerade as 2-writer contention in the first point
        val wDir = soakTempDir("graft-soak-ccrw")
        (1 to 4).foreach { i =>
          ops.Catalog.commitRetry(spark, s"$wDir/cat",
            base => base + (s"warm-$i" -> "ref"))
        }
      }
      Seq(2, 4, 8, 16).map { nWriters =>
        val name = s"ccr_scaling_$nWriters"
        if (!active) (name, skip._1, skip._2, skip._3)
        else {
          val each = 96 / nWriters
          val dir = soakTempDir(s"graft-soak-ccrs$nWriters")
          val cat = s"$dir/cat"
          measure(name) {
            val pool =
              java.util.concurrent.Executors.newFixedThreadPool(nWriters)
            val start = new java.util.concurrent.CountDownLatch(1)
            val futs = (0 until nWriters).map { w =>
              pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
                def call(): Seq[Int] = {
                  start.await()
                  (1 to each).map { i =>
                    ops.Catalog.commitRetry(spark, cat,
                      base => base + (s"w$w-$i" -> s"ref/w$w-$i"),
                      maxAttempts = 400)
                  }
                }
              })
            }
            start.countDown()
            val got = futs.flatMap(_.get(600,
              java.util.concurrent.TimeUnit.SECONDS))
            pool.shutdown()
            require(got.toSet.size == 96,
              s"$name: commit collision (${got.toSet.size} of 96)")
            val vs = ops.Versions.listVersions(cat)(spark)
            require(vs == (1 to 96), s"$name: history not dense: ${vs.size}")
            require(ops.Catalog.resolveCurrent(spark, cat).size == 96,
              s"$name: lost updates")
            96L
          }
        }
      }
    }

    // ---- INGEST FRONT DOOR at 10× (s32's composition, soak-sized):
    // the three admission filters — near-dup vs the frozen corpus LSH
    // index, contamination vs the frozen benchmark fingerprints, token
    // budgets — run over a blown-up candidate feed with the indexes
    // built OUTSIDE the timer (the frozen-index posture every micro-
    // batch enjoys). The measure is the admission cost per candidate
    // volume: the per-batch path IS these operators.
    val frontDoorResults: Seq[(String, Double, Double, Long)] =
      if (!want("front_door_admission", "ingest_to_shards")) Seq()
      else {
      import spark.implicits._
      val corpus = docsN.localCheckpoint(eager = true)
      val bench = corpus.filter(col("doc_id") % 2 === 1)
      val nd0 = ops.Dedup.nearDupIndex(
        corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        k = 12, bands = 6, shingleSize = 3)
      val ndIdx = nd0.copy(
        fingerprints = nd0.fingerprints.localCheckpoint(eager = true),
        bands = nd0.bands.localCheckpoint(eager = true),
        hashes = nd0.hashes.localCheckpoint(eager = true))
      val ctIdx = ops.CorpusOps
        .benchmarkFingerprints(bench, "doc_id", "text")
        .localCheckpoint(eager = true)
      val budgets = (0 until 20).map(k => (s"src$k", 5000L + 977L * k))
        .toDF("source", "budget")
      val cand = corpus.filter(col("doc_id") % 10 === 2)
        .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
        .unionAll(bench.filter(col("doc_id") % 10 === 3)
          .select((col("doc_id") + 910000000L).as("doc_id"), col("text")))
        .unionAll(corpus.filter(col("doc_id") % 10 === 6)
          .select((col("doc_id") + 920000000L).as("doc_id"),
            reverse(col("text")).as("text")))
        .withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
        .localCheckpoint(eager = true)
      quiesce()
      // shared three-stage admission plan (the per-micro-batch path)
      def admitted() = {
        val nd = ops.Dedup.nearDupFilter(ndIdx,
            cand.select("doc_id", "text"), "doc_id", "text", tau = 0.5)
          .select("doc_id")
        val s1 = cand.join(nd, Seq("doc_id"), "left_semi")
        val ct = ops.CorpusOps.contaminationFilter(ctIdx,
            s1.select("doc_id", "text"), "doc_id", "text")
          .select("doc_id")
        val s2 = s1.join(ct, Seq("doc_id"), "left_semi")
        ops.CorpusOps.budgetedMix(s2, "doc_id", "text", "source",
          budgets)
      }
      Seq(
        measure("front_door_admission") { admitted().count() },
        measure("ingest_to_shards") {
          // the s36 capstone, batch-composed at soak scale: admission →
          // deterministic shard shuffle AND pack-index over the SAME
          // admitted set (text rides to its shard exactly once per
          // artifact; both layouts are pure functions of (salt, id))
          val adm = admitted().select("doc_id")
            .join(cand, Seq("doc_id")) // re-attach payloads to winners
            .localCheckpoint(eager = true)
          val sharded = ops.CorpusOps.shardShuffle(adm, "doc_id", 64)
            .filter(col("seq") >= 1)
            .agg(count(lit(1)), sum(length(col("text")))).head.getLong(0)
          val packed = ops.Multimodal.packIndex(
              adm.withColumn("payload", col("text").cast("binary")),
              "doc_id", "payload", nShards = 16)
            .filter(col("offset") >= 0).count()
          sharded + packed
        })
    }

    // ---- round-13 write-path ops at the blown-up scale: the epoch
    // plan must shuffle (id, src, tokens) triples only (hygiene-spec
    // shape, here with wire-byte evidence); the shard shuffle's bytes
    // SHOULD approximate the corpus size — rows move exactly once to
    // their shard, which is the claim worth a number. The branch cycle
    // is commit + commit + merge + snapshot read, all manifest-sized.
    val shardEpochResults: Seq[(String, Double, Double, Long)] =
      if (!want("epoch_plan", "shard_shuffle", "branch_cycle")) Seq()
      else {
      import spark.implicits._
      val src = docsN.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
        .localCheckpoint(eager = true)
      quiesce()
      Seq(
        measure("epoch_plan") {
          val budgets = (0 until 20).map(k => (s"src$k", 50000L + 9777L * k))
            .toDF("source", "budget")
          ops.CorpusOps.epochPlan(src, "doc_id", "text", "source",
            budgets).count()
        },
        measure("shard_shuffle") {
          // consume seq AND the text: a bare count() lets column pruning
          // delete the unused window (and with it the one shuffle this
          // entry weighs), and without the text the shuffle carries only
          // (hash, id) pairs — the REAL shard write moves each row once
          // WITH its payload, so that is what gets weighed
          ops.CorpusOps.shardShuffle(src, "doc_id", nShards = 64)
            .filter(col("seq") >= 1)
            .agg(count(lit(1)), sum(length(col("text"))))
            .head.getLong(0)
        },
        {
          val brDir = soakTempDir("graft-soak-br")
          val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select("l_orderkey", "l_quantity")
          quiesce()
          measure("branch_cycle") {
            val base = ops.Layout.commitAppend(spark,
                li.filter(col("l_orderkey") % 2 === 0), brDir,
                Seq("l_orderkey"))
              .localCheckpoint(eager = true)
            val cDev = ops.Layout.commitAppend(spark,
                li.filter(col("l_orderkey") % 4 === 1), brDir,
                Seq("l_orderkey"))
              .localCheckpoint(eager = true)
            val cMain = ops.Layout.commitAppend(spark,
                li.filter(col("l_orderkey") % 4 === 3), brDir,
                Seq("l_orderkey"))
              .localCheckpoint(eager = true)
            val merged = ops.Layout.mergeBranch(
              base.unionAll(cMain), base.unionAll(cDev))
            ops.Layout.snapshotRead(spark, brDir, merged).count()
          }
        })
    }

    val allResults =
      (results ++ ivfProbeResults ++ layoutResults ++ cdcResults ++
        takedownResults ++ mvResults ++ zorderResults ++ joinSkipResults ++
        shardEpochResults ++ frontDoorResults ++ ccrScalingResults
        :+ multiwriterResult :+ concurrentCommitResult)
        .filter(_._2 >= 0) // drop op-filter skip markers

    val auditJson = audits.toSeq.sortBy(_._1).map { case (n, (b, mx, p)) =>
      s""""$n": {"dropped_buckets": $b, "max_bucket_sz": $mx, "dropped_candidate_pairs": $p}"""
    }.mkString("{", ", ", "}")
    // stamp the run configuration INTO the artifact so residency claims
    // ("50× at the default heap") are carried by the JSON itself, not
    // by knowledge of how the run was launched
    val heapPeakMb = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
      .sum / 1048576
    val json = allResults.map { case (n, sec, mb, rows) =>
      f""""$n": {"sec": $sec%.2f, "shuffle_mb": $mb%.1f, "rows": $rows}"""
    }.mkString("{", ", ",
      s""", "audits": $auditJson, "copies": $copies, """ +
      s""""diversity": $diversity, "sf": "$sfDir", """ +
      s""""driver_mem_max_mb": ${Runtime.getRuntime.maxMemory / 1048576}, """ +
      s""""heap_peak_mb": $heapPeakMb, "cpus": $cpus, """ +
      s""""shuffle_partitions": ${spark.conf.get(
        "spark.sql.shuffle.partitions")}}""")
    println(json)
    // a FILTERED run must not clobber the full-suite record (Bench's
    // documented posture): write soak_results.json only for unfiltered
    // runs, unless an output path is named explicitly
    val outExplicit = sys.env.get("SPARK_GRAFT_SOAK_OUT")
    val out = outExplicit.getOrElse("soak_results.json")
    if (opsFilter.isEmpty || outExplicit.nonEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"soak_results write failed: $e") }
    else System.err.println(
      s"[soak] filtered run: NOT writing $out (set SPARK_GRAFT_SOAK_OUT)")

    } finally {
      // the soak fixtures hold 10k+ small parquet files — don't litter
      // /tmp. Delete EXACTLY the dirs this run created (tracked by
      // soakTempDir), success or failure; never sweep by name prefix.
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
      }
      createdDirs.synchronized { createdDirs.foreach(rmTree) }
      spark.stop()
    }
  }
}
