package graft

import graft.ops.Dedup

/** DuckDB SQL fragments mirroring the graft text/hash operators exactly
  * (same md5-derived hashing, same fold order, same seeds — see
  * TextFunctions/Dedup scaladoc). Used to assemble `SparkEntry.oracleSql`
  * entries for the non-trivial extension operators.
  */
object OracleSql {

  /** lower + collapse-whitespace normalization of a text expression. */
  def norm(e: String): String =
    s"lower(regexp_replace(trim($e), '\\s+', ' ', 'g'))"

  /** whitespace tokens of normalized text. */
  def toks(e: String): String =
    s"regexp_split_to_array(${norm(e)}, ' ')"

  /** portable 60-bit md5 hash of a string expression. */
  def h64(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** word n-gram shingles (space-joined) — mirrors TextFunctions.wordShingles. */
  def shingles(e: String, n: Int): String =
    s"""list_transform(
       |  range(0, greatest(len(${toks(e)}) - ${n - 1}, 1)),
       |  i -> array_to_string((${toks(e)})[(i+1):(i+$n)], ' '))""".stripMargin

  /** minhash signature as a DuckDB list literal-seeded expression. */
  def minhashSig(e: String, k: Int, n: Int): String = {
    val seeds = Dedup.minhashSeeds(k)
    val hashes = s"list_transform(${shingles(e, n)}, s -> ${h64("s")})"
    val sigs = seeds.map(seed =>
      s"list_aggregate(list_transform($hashes, h -> xor(h, ${seed}::BIGINT)), 'min')")
    sigs.mkString("[", ",\n ", "]")
  }

  /** 60-bit simhash over whitespace tokens — mirrors SimHash60.compute. */
  def simhash(e: String): String = {
    val hashes = s"list_transform(${toks(e)}, t -> ${h64("t")})"
    s"""list_reduce(list_transform(range(0, 60), j ->
       |  CASE WHEN 2 * len(list_filter($hashes, h -> (h >> j) & 1 = 1))
       |            > len($hashes)
       |       THEN (1::BIGINT << j) ELSE 0::BIGINT END),
       |  (a, b) -> a | b)""".stripMargin
  }

  /** exact word-shingle jaccard between two text expressions. */
  def jaccard(a: String, b: String, n: Int): String = {
    val sa = s"list_distinct(${shingles(a, n)})"
    val sb = s"list_distinct(${shingles(b, n)})"
    s"""(CAST(len(list_intersect($sa, $sb)) AS DOUBLE) /
       | CAST(len(list_distinct($sa || $sb)) AS DOUBLE))""".stripMargin
  }

  /** sequential-fold dot product of two DOUBLE[] expressions — mirrors
    * Similarity.dot (left fold; leading +0.0 is exact). */
  def dot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> ($a)[i] * ($b)[i]), (x, y) -> x + y)""".stripMargin

  def cosine(a: String, b: String): String =
    s"""(CASE WHEN sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}) = 0.0 THEN 0.0
       |  ELSE ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))
       |  END)""".stripMargin

  /** Full MinHash-LSH near-dup-pairs pipeline over an `aug(doc_id, text)`
    * CTE body — mirrors Dedup.minhashLshPairs stage for stage: exact-dup
    * pre-collapse (min id per normalized-text fingerprint), signatures,
    * banding, the oversized-bucket cap, candidate self-join, exact-
    * Jaccard verification. */
  def minhashLshPairs(augSql: String, k: Int, bands: Int,
      shingleSize: Int, tau: Double, maxBucket: Int): String = {
    val r = k / bands
    val sig = minhashSig("text", k, shingleSize)
    val bandKeys = (0 until bands).map { b =>
      s"md5(array_to_string(list_transform(sig[${b * r + 1}:${b * r + r}], x -> x::VARCHAR), '|'))"
    }.mkString("[", ",\n   ", "]")
    s"""WITH aug AS ($augSql),
       |reps AS (
       |  SELECT MIN(doc_id) AS doc_id, arg_min(text, doc_id) AS text
       |  FROM aug GROUP BY md5(${norm("text")})),
       |sigs AS (SELECT doc_id, text, $sig AS sig FROM reps),
       |banded AS (
       |  SELECT doc_id, unnest($bandKeys) AS bucket,
       |         unnest(range(0, $bands)) AS band
       |  FROM sigs),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bucket_sz
       |    FROM banded) WHERE bucket_sz <= $maxBucket),
       |cands AS (
       |  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
       |  FROM capped l JOIN capped r
       |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
       |SELECT id1, id2, ${hashJaccard("a.text", "b.text", shingleSize)} AS jaccard
       |FROM cands
       |JOIN reps a ON a.doc_id = id1
       |JOIN reps b ON b.doc_id = id2
       |WHERE ${hashJaccard("a.text", "b.text", shingleSize)} >= $tau
       |ORDER BY id1, id2""".stripMargin
  }

  /** Jaccard over 60-bit shingle HASH sets — mirrors the verification
    * stage of Dedup.minhashLshPairs (integer sets, not strings). */
  def hashJaccard(a: String, b: String, n: Int): String = {
    def hashes(e: String) =
      s"list_transform(list_distinct(${shingles(e, n)}), s -> ${h64("s")})"
    val ha = hashes(a)
    val hb = hashes(b)
    s"""(CAST(len(list_intersect($ha, $hb)) AS DOUBLE) /
       | CAST(len(list_distinct($ha || $hb)) AS DOUBLE))""".stripMargin
  }

  /** Winnowing fingerprints (distinct sliding-window minima over
    * positional k-shingle hashes) of a relation producing
    * (doc_id, text) — mirrors CorpusOps.winnow / WindowMin64. */
  def winnow(fromSql: String, k: Int, w: Int): String = {
    val tk = s"CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] " +
      s"ELSE ${toks("text")} END"
    s"""SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(0, greatest(len(hs) - ${w - 1}, 1)),
       |      i -> list_aggregate(hs[(i+1):(i+$w)], 'min')))) AS fp
       |FROM (
       |  SELECT doc_id,
       |    list_transform(
       |      list_transform(range(0, greatest(len(tk) - ${k - 1}, 1)),
       |        i -> array_to_string(tk[(i+1):(i+$k)], ' ')),
       |      s -> ${h64("s")}) AS hs
       |  FROM (SELECT doc_id, $tk AS tk FROM ($fromSql)))""".stripMargin
  }

  /** stopword-hit count for one language over normalized tokens. */
  def stopwordHits(e: String, lang: String): String = {
    val words = graft.functions.TextFunctions.stopwords(lang)
      .map(w => s"'${w}'").mkString("[", ",", "]")
    s"len(list_filter(${toks(e)}, t -> list_contains($words, t)))"
  }

  /** Composite quality score — mirrors TextFunctions.qualityScore
    * term for term (same literal order, so doubles match exactly). */
  def qualityScore(e: String): String = {
    val len = s"CAST(length($e) AS DOUBLE)"
    val glen = s"CAST(greatest(length($e), 1) AS DOUBLE)"
    val punct = s"CAST(length($e) - length(regexp_replace($e, '[.,;:!?''\"()-]', '', 'g')) AS DOUBLE)"
    val digit = s"CAST(length($e) - length(regexp_replace($e, '[0-9]', '', 'g')) AS DOUBLE)"
    val nToks = s"len(${toks(e)})"
    val sumLen = s"CAST(list_aggregate(list_transform(${toks(e)}, t -> length(t)), 'sum') AS DOUBLE)"
    val mtl = s"(CASE WHEN $nToks = 0 THEN 0.0 ELSE $sumLen / CAST($nToks AS DOUBLE) END)"
    s"""(least($len / 200.0, 1.0) * 0.4
       | + (1.0 - least(($punct / $glen) * 4.0, 1.0)) * 0.25
       | + (1.0 - least(($digit / $glen) * 4.0, 1.0)) * 0.15
       | + (CASE WHEN $mtl >= 3.0 AND $mtl <= 10.0 THEN 1.0 ELSE 0.5 END) * 0.2)""".stripMargin
  }

  /** Language-ID as an inline CASE (first language attaining the max
    * stopword-hit count wins) — mirrors TextFunctions.langId. */
  def langIdCase(e: String): String = {
    val langs = graft.functions.TextFunctions.languages
    val hits = langs.map(l => l -> stopwordHits(e, l)).toMap
    val best = "greatest(" + langs.map(hits).mkString(", ") + ")"
    val cases = langs.map(l =>
      s"WHEN ${hits(l)} = $best AND $best > 0 THEN '$l'").mkString("\n    ")
    s"(CASE $cases ELSE 'und' END)"
  }

  /** Hyperplane-LSH embedding near-dup-pairs CTE chain over the
    * embeddings table — mirrors Dedup.embeddingLshPairs stage for
    * stage (bit-identical-vector collapse, md5-derived plane buckets,
    * bucket cap, candidate self-join, exact cosine). Ends with an
    * `epairs(id1, id2, cos)` CTE for callers to select from. */
  def embeddingLshCtes(bits: Int, dim: Int, tau: Double, maxBucket: Int): String = {
    val bucketExpr = graft.ops.Similarity.planes(bits, dim).zipWithIndex.map {
      case (p, i) =>
        val planeLit = p.mkString("[", ", ", "]")
        s"(CASE WHEN ${dot("v", planeLit)} >= 0.0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n   + ")
    val cos = s"(CASE WHEN a.nrm * b.nrm = 0.0 THEN 0.0 " +
      s"ELSE ${dot("a.v", "b.v")} / (a.nrm * b.nrm) END)"
    s"""v0 AS (
       |  SELECT v, MIN(id) AS id FROM (
       |    SELECT CAST(embedding AS DOUBLE[]) AS v, vec_id AS id FROM embeddings)
       |  GROUP BY v),
       |bkt AS (
       |  SELECT id, v, CAST($bucketExpr AS BIGINT) AS bucket,
       |         sqrt(${dot("v", "v")}) AS nrm
       |  FROM v0),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bucket_sz FROM bkt)
       |  WHERE bucket_sz <= $maxBucket),
       |epairs AS (
       |  SELECT id1, id2, cos FROM (
       |    SELECT a.id AS id1, b.id AS id2, $cos AS cos
       |    FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.id < b.id)
       |  WHERE cos >= $tau)""".stripMargin
  }

  /** Streaming VECTOR admission replay — mirrors
    * Dedup.vectorNearDupIndex + vectorNearDupFilter over a static
    * corpus: corpus vectors collapse to (v, min id), bucket by the
    * same md5-derived hyperplanes, cap hot buckets; a candidate (from
    * `candSql`, yielding (vec_id, v DOUBLE[])) is admitted iff no
    * capped corpus vector sharing its bucket reaches cosine ≥ tau.
    * Because candidates are tested against the static corpus only,
    * this whole-set filter equals the micro-batched fold exactly. */
  def vectorAdmitSql(candSql: String, bits: Int, dim: Int, tau: Double,
      maxBucket: Int): String =
    s"""WITH ${vectorAdmitCtes("", CorpusIdV, candSql, bits, dim, tau,
           maxBucket)}
       |SELECT id AS vec_id FROM adm
       |ORDER BY vec_id""".stripMargin

  /** The default vector-admission corpus: the whole embeddings table
    * as (id, v DOUBLE[]). */
  val CorpusIdV: String =
    "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"

  /** [[vectorAdmitSql]]'s CTE chain, name-prefixed so two admission
    * rounds can nest in one statement (a maintenance cycle's day-2
    * corpus references day-1's `${p}adm`). `corpusSql` yields (id, v),
    * `candSql` yields (vec_id, v); the chain ends in
    * `${p}adm(id, v)` — the admitted candidate representatives. */
  def vectorAdmitCtes(p: String, corpusSql: String, candSql: String,
      bits: Int, dim: Int, tau: Double, maxBucket: Int): String = {
    def bucketExpr(v: String) = graft.ops.Similarity.planes(bits, dim)
      .zipWithIndex.map { case (pl, i) =>
        val planeLit = pl.mkString("[", ", ", "]")
        s"(CASE WHEN ${dot(v, planeLit)} >= 0.0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("\n   + ")
    val cos = s"(CASE WHEN c.nrm * k.nrm = 0.0 THEN 0.0 " +
      s"ELSE ${dot("c.v", "k.v")} / (c.nrm * k.nrm) END)"
    s"""${p}k0 AS (
       |  SELECT v, MIN(id) AS id FROM ($corpusSql)
       |  GROUP BY v),
       |${p}kbkt AS (
       |  SELECT id, v, CAST(${bucketExpr("v")} AS BIGINT) AS bucket,
       |         sqrt(${dot("v", "v")}) AS nrm
       |  FROM ${p}k0),
       |${p}kcap AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bucket_sz
       |    FROM ${p}kbkt)
       |  WHERE bucket_sz <= $maxBucket),
       |${p}cand0 AS ($candSql),
       |${p}cand AS (SELECT v, MIN(vec_id) AS id FROM ${p}cand0 GROUP BY v),
       |${p}cbkt AS (
       |  SELECT id, v, CAST(${bucketExpr("v")} AS BIGINT) AS bucket,
       |         sqrt(${dot("v", "v")}) AS nrm
       |  FROM ${p}cand),
       |${p}hits AS (
       |  SELECT DISTINCT c.id
       |  FROM ${p}cbkt c JOIN ${p}kcap k ON c.bucket = k.bucket
       |  WHERE $cos >= $tau),
       |${p}adm AS MATERIALIZED (
       |  SELECT id, v FROM ${p}cbkt
       |  WHERE id NOT IN (SELECT id FROM ${p}hits))""".stripMargin
  }

  /** Seeded-IVF kNN-join CTE chain over the embeddings table — mirrors
    * Similarity.ivfIndexSeeded(...).knnJoin stage for stage (centroid
    * seeds = first `nlist` ids, assignment by best cosine, `nprobe`
    * probe cells, per-query top-k by (cos DESC, nid)). Ends with a
    * `knn(id, rank, nid, cos)` CTE for callers to select from. */
  /** Unrolled MMR greedy over the embeddings table: stage-1 candidate
    * panel (top-`fetch` by cosine to query vec `qid`, query excluded),
    * then one CTE per pick — each re-scores the remaining candidates
    * as relW·rel − divW·GREATEST(cos to every prior pick) and takes
    * the (score DESC, id ASC) head. Mirrors Similarity.mmrRerank pick
    * for pick; relW/divW arrive as literal strings so the SQL doubles
    * are the exact literals Spark used. */
  def mmrCtes(qid: Long, fetch: Int, k: Int,
      relW: String = "0.7", divW: String = "0.3"): String = {
    val base =
      s"""v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
         |       FROM embeddings),
         |qv AS (SELECT v AS q FROM v WHERE id = $qid),
         |cand AS (
         |  SELECT id, v, ${cosine("v", "q")} AS rel
         |  FROM v, qv WHERE id <> $qid
         |  ORDER BY rel DESC, id LIMIT $fetch)""".stripMargin
    val steps = (1 to k).map { i =>
      if (i == 1)
        s"""p1 AS (
           |  SELECT id, v, rel, $relW * rel - $divW * 0.0 AS score, 1 AS rank
           |  FROM cand ORDER BY score DESC, id LIMIT 1)""".stripMargin
      else {
        val prevs = (1 until i).map(j => s"p$j")
        val sims = prevs.map(p => cosine("c.v", s"$p.v")).mkString(",\n    ")
        s"""p$i AS (
           |  SELECT c.id, c.v, c.rel,
           |    $relW * c.rel - $divW * GREATEST(
           |    $sims) AS score, $i AS rank
           |  FROM cand c, ${prevs.mkString(", ")}
           |  WHERE c.id NOT IN (${prevs.map(p => s"$p.id").mkString(", ")})
           |  ORDER BY score DESC, c.id LIMIT 1)""".stripMargin
      }
    }
    val union = (1 to k).map(i =>
      s"SELECT rank, id, rel, score FROM p$i").mkString("\n  UNION ALL ")
    s"""$base,
       |${steps.mkString(",\n")},
       |mmr AS (
       |  $union)""".stripMargin
  }

  /** Full PQ encode replay (gates e8 and e29): each vector's m sub-space
    * codes against the ids-0..k−1 seeded codebook, via the same
    * ‖a‖²−2ab+‖b‖² expansion as `Similarity.productQuantize` — term-for-
    * term, so doubles compare exactly. e29 runs the identical query:
    * a codebook that survives a disk round trip must encode every
    * vector to the identical (sub, code, dist) rows. */
  def pqEncodeSql(m: Int, k: Int, sub: Int): String =
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |      FROM embeddings WHERE vec_id < $k),
       |subs AS (SELECT s FROM range(0, $m) t(s)),
       |sliced AS (
       |  SELECT v.id, subs.s, c.cid,
       |    (v.v)[subs.s * $sub + 1 : (subs.s + 1) * $sub] AS vs,
       |    (c.cv)[subs.s * $sub + 1 : (subs.s + 1) * $sub] AS cs
       |  FROM v CROSS JOIN subs CROSS JOIN c),
       |d AS (
       |  SELECT id, s, cid,
       |    ((${dot("vs", "vs")} - 2.0 * ${dot("vs", "cs")})
       |      + ${dot("cs", "cs")}) AS dist
       |  FROM sliced)
       |SELECT id, CAST(s AS INT) AS sub, CAST(cid AS INT) AS code, dist FROM (
       |  SELECT id, s, cid, dist,
       |    ROW_NUMBER() OVER (PARTITION BY id, s ORDER BY dist, cid) AS rn
       |  FROM d) WHERE rn = 1
       |ORDER BY id, sub""".stripMargin

  def ivfKnnCtes(nlist: Int, nprobe: Int, k: Int): String =
    ivfKnnCtes(nlist, nprobe, k, candWhere = "")

  /** As above with an optional candidate-side predicate (`el` aliases
    * the embeddings row of the candidate) — mirrors
    * `IvfIndex.knnJoinFiltered`'s pre-filter semantics. */
  def ivfKnnCtes(nlist: Int, nprobe: Int, k: Int, candWhere: String): String = {
    val candJoin = if (candWhere.isEmpty) ""
      else s"\n  JOIN embeddings el ON el.vec_id = a.id AND ($candWhere)"
    ivfKnnCtesImpl(nlist, nprobe, k, candJoin)
  }

  /** As [[ivfKnnCtes]] with a CUSTOM vector-set SQL (columns `id`,
    * `v DOUBLE[]`) replacing the plain embeddings scan — the oracle
    * shape for maintenance cycles where the probed set is
    * (build ∪ added) − removed while the centroid panel stays the
    * BUILD's seeds (`addVectors`/`remove` never refit). */
  def ivfKnnCtesOver(nlist: Int, nprobe: Int, k: Int, vSql: String): String =
    ivfKnnCtesImpl(nlist, nprobe, k, candJoin = "", vSql = vSql)

  /** As [[ivfKnnCtesOver]] with every CTE name prefixed, so two index
    * versions' replays can nest in one statement (the versioned-publish
    * gate selects from `${p}knn` for each retained version). */
  def ivfKnnCtesPrefixed(p: String, nlist: Int, nprobe: Int, k: Int,
      vSql: String): String =
    ivfKnnCtesImpl(nlist, nprobe, k, candJoin = "", vSql = vSql, p = p)

  private def ivfKnnCtesImpl(nlist: Int, nprobe: Int, k: Int,
      candJoin: String,
      vSql: String =
        "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
      p: String = "")
      : String =
    s"""${p}c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |           FROM embeddings WHERE vec_id < $nlist),
       |${p}v AS ($vSql),
       |${p}scored AS (SELECT id, v, cid, ${cosine("v", "cv")} AS cs
       |           FROM ${p}v CROSS JOIN ${p}c),
       |${p}assigned AS (
       |  SELECT id, v, cid AS cell FROM (
       |    SELECT id, v, cid,
       |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cs DESC, cid) AS rn
       |    FROM ${p}scored) WHERE rn = 1),
       |${p}probes AS (
       |  SELECT id, cid FROM (
       |    SELECT id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cs DESC, cid) AS rn
       |    FROM ${p}scored) WHERE rn <= $nprobe),
       |${p}cand AS (
       |  SELECT p.id, a.id AS nid, ${cosine("q.v", "a.v")} AS cos
       |  FROM ${p}probes p
       |  JOIN ${p}v q ON q.id = p.id
       |  JOIN ${p}assigned a ON a.cell = p.cid AND a.id <> p.id$candJoin),
       |${p}knn AS (
       |  SELECT id, rank, nid, cos FROM (
       |    SELECT id, nid, cos,
       |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cos DESC, nid) AS rank
       |    FROM ${p}cand) WHERE rank <= $k)""".stripMargin

  /** IVF kNN PROBE for an external query set — mirrors
    * `IvfIndex.knnProbe`: the index (centroid panel + assignment) comes
    * from the plain embeddings table exactly as in [[ivfKnnCtes]], but
    * the query side is `qSql` (columns `id`, `v DOUBLE[]`) and there is
    * no self-exclusion (query ids live in their own id space). */
  def ivfKnnProbeCtes(nlist: Int, nprobe: Int, k: Int, qSql: String): String =
    s"""c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |           FROM embeddings WHERE vec_id < $nlist),
       |v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings),
       |scored AS (SELECT id, v, cid, ${cosine("v", "cv")} AS cs
       |           FROM v CROSS JOIN c),
       |assigned AS (
       |  SELECT id, v, cid AS cell FROM (
       |    SELECT id, v, cid,
       |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cs DESC, cid) AS rn
       |    FROM scored) WHERE rn = 1),
       |q AS ($qSql),
       |qscored AS (SELECT q.id, q.v, c.cid, ${cosine("q.v", "c.cv")} AS cs
       |            FROM q CROSS JOIN c),
       |probes AS (
       |  SELECT id, cid FROM (
       |    SELECT id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cs DESC, cid) AS rn
       |    FROM qscored) WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.id, a.id AS nid, ${cosine("q.v", "a.v")} AS cos
       |  FROM probes p
       |  JOIN q ON q.id = p.id
       |  JOIN assigned a ON a.cell = p.cid),
       |knn AS (
       |  SELECT id, rank, nid, cos FROM (
       |    SELECT id, nid, cos,
       |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cos DESC, nid) AS rank
       |    FROM cand) WHERE rank <= $k)""".stripMargin

  /** Unrolled fixed-point Lloyd's k-means over the embeddings table —
    * mirrors Similarity.kmeansFixedPoint iteration for iteration:
    * floor-scaled integer components, ‖v−c‖² = v·v − 2v·c + c·c on
    * exactly-representable integer-valued doubles, argmin by
    * (dist, cid) struct-min, centroid update by trunc-division mean
    * (DuckDB `//` and Spark `div` both truncate toward zero). */
  /** Shared k-means CTE chain through the FINAL assignment `af(id, cid)`
    * — returns (cteBlock, lastCentroidCte). */
  private def kmeansCtes(k: Int, iters: Int, dim: Int,
      scale: String): (String, String) = {
    def dist(v: String, c: String) =
      s"(${dot(v, v)} - 2.0 * ${dot(v, c)} + ${dot(c, c)})"
    def iteration(i: Int, prev: String): String =
      s"""d$i AS (
         |  SELECT v.id, c.cid, ${dist("v.v", "c.c")} AS dist
         |  FROM v CROSS JOIN $prev c),
         |a$i AS (
         |  SELECT id, min(struct_pack(dist := dist, cid := cid)).cid AS cid
         |  FROM d$i GROUP BY id),
         |m$i AS (
         |  SELECT a$i.cid, t.i - 1 AS dim,
         |         SUM(CAST(v.v[t.i] AS BIGINT)) // COUNT(*) AS m
         |  FROM a$i JOIN v USING (id), range(1, ${dim + 1}) AS t(i)
         |  GROUP BY 1, 2),
         |c$i AS (
         |  SELECT cid, list_transform(list(m ORDER BY dim),
         |                             x -> CAST(x AS DOUBLE)) AS c
         |  FROM m$i GROUP BY cid)""".stripMargin
    val iterSql = (1 to iters).map(i => iteration(i, s"c${i - 1}")).mkString(",\n")
    val last = s"c$iters"
    val ctes =
      s"""v AS (
         |  SELECT CAST(vec_id AS BIGINT) AS id,
         |         list_transform(CAST(embedding AS DOUBLE[]),
         |                        x -> floor(x * $scale)) AS v
         |  FROM embeddings),
         |c0 AS (SELECT id AS cid, v AS c FROM v WHERE id < $k),
         |$iterSql,
         |df AS (
         |  SELECT v.id, c.cid, ${dist("v.v", "c.c")} AS dist
         |  FROM v CROSS JOIN $last c),
         |af AS (
         |  SELECT id, min(struct_pack(dist := dist, cid := cid)).cid AS cid
         |  FROM df GROUP BY id)""".stripMargin
    (ctes, last)
  }

  def kmeansFixedPoint(k: Int, iters: Int, dim: Int, scale: String = "1000000.0"): String = {
    val (ctes, last) = kmeansCtes(k, iters, dim, scale)
    s"""WITH $ctes,
       |sz AS (SELECT cid, COUNT(*) AS n_members FROM af GROUP BY cid)
       |SELECT c.cid, CAST(t.i - 1 AS INT) AS dim,
       |       CAST(c.c[t.i] AS BIGINT) AS c, sz.n_members
       |FROM $last c JOIN sz USING (cid), range(1, ${dim + 1}) AS t(i)
       |ORDER BY cid, dim""".stripMargin
  }

  /** Cluster-balanced sample — mirrors `Similarity.clusterBalancedSample`:
    * the same k-means assignment chain, then the d15 salted-hash
    * row_number pick of `perCell` ids per cell. */
  def kmeansBalancedSample(k: Int, iters: Int, dim: Int, perCell: Int,
      salt: String = "graft-sample", scale: String = "1000000.0"): String = {
    val (ctes, _) = kmeansCtes(k, iters, dim, scale)
    s"""WITH $ctes
       |SELECT cid, id FROM (
       |  SELECT cid, id, ROW_NUMBER() OVER (PARTITION BY cid
       |    ORDER BY ${h64(s"'$salt-' || CAST(id AS VARCHAR)")}, id) AS rn
       |  FROM af) WHERE rn <= $perCell
       |ORDER BY cid, id""".stripMargin
  }

  /** BPE merge-table learning, unrolled to `merges` rounds — mirrors
    * CorpusOps.bpeLearn exactly: same vocabulary filter, same
    * space-joined symbol form, same argmax tiebreak (count desc, then
    * (lhs, rhs) lexicographic), and the same left-to-right
    * non-overlapping replace() for the merge application. DuckDB can't
    * loop over data-dependent aggregates, so each round is one CTE
    * triple (pair counts → argmax → merged words); an exhausted
    * vocabulary empties every later round on both engines. */
  def bpeMerges(sourceSql: String, merges: Int, maxWordLen: Int = 30): String = {
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"""w0 AS (
         |  SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS w,
         |         freq
         |  FROM (SELECT word, COUNT(*) AS freq
         |        FROM (SELECT unnest(${toks("text")}) AS word FROM ($sourceSql))
         |        WHERE regexp_matches(word, '^[a-z]+${"$"}')
         |          AND len(word) <= $maxWordLen
         |        GROUP BY word))""".stripMargin)
    for (k <- 1 to merges) {
      val p = k - 1
      ctes += s"""p$k AS (
         |  SELECT sym[i] AS l, sym[i+1] AS r, SUM(freq) AS cnt
         |  FROM (SELECT string_split(trim(w), ' ') AS sym, freq FROM w$p),
         |       range(1, ${maxWordLen + 1}) t(i)
         |  WHERE i < len(sym) GROUP BY 1, 2)""".stripMargin
      ctes += s"m$k AS (SELECT $k AS step, l, r, cnt FROM p$k " +
        "ORDER BY cnt DESC, l, r LIMIT 1)"
      if (k < merges)
        ctes += s"""w$k AS (
           |  SELECT replace(w, ' ' || l || ' ' || r || ' ',
           |                 ' ' || l || r || ' ') AS w, freq
           |  FROM w$p, m$k)""".stripMargin
    }
    val union = (1 to merges)
      .map(k => s"SELECT CAST(step AS INT) AS step, l AS lhs, r AS rhs, " +
        s"CAST(cnt AS BIGINT) AS pair_count FROM m$k")
      .mkString("\n UNION ALL ")
    s"WITH ${ctes.mkString(",\n")}\n$union ORDER BY step"
  }

  /** Incremental near-dup admission — mirrors `Dedup.nearDupFilter`
    * over a static index of `corpusSql` stage for stage: intra-batch
    * exact collapse, corpus-fingerprint anti-join, banding with the
    * per-side bucket caps (index build caps corpus buckets, the filter
    * caps batch buckets), bucket probe against the corpus bands, and
    * shingle-hash-set Jaccard verification. */
  def nearDupIncremental(corpusSql: String, batchSql: String, k: Int,
      bands: Int, shingleSize: Int, tau: Double, maxBucket: Int): String =
    s"""WITH ${nearDupAdmitCtes("", corpusSql, batchSql, k, bands,
           shingleSize, tau, maxBucket)}
       |SELECT doc_id, text FROM adm
       |ORDER BY doc_id""".stripMargin

  /** [[nearDupIncremental]]'s CTE chain, name-prefixed so several
    * admission rounds can nest in one statement (a growing-index fold's
    * round-k corpus references rounds 0..k−1's `${p}adm`). Ends in
    * `${p}adm(doc_id, text)` — the admitted batch representatives —
    * marked AS MATERIALIZED: each round's corpus references every
    * earlier round's result, so default CTE inlining would expand the
    * chain exponentially with the round count. */
  def nearDupAdmitCtes(p: String, corpusSql: String, batchSql: String,
      k: Int, bands: Int, shingleSize: Int, tau: Double,
      maxBucket: Int): String = {
    val r = k / bands
    val sig = minhashSig("text", k, shingleSize)
    val bandKeys = (0 until bands).map { b =>
      s"md5(array_to_string(list_transform(sig[${b * r + 1}:${b * r + r}], x -> x::VARCHAR), '|'))"
    }.mkString("[", ",\n   ", "]")
    def banded(src: String) =
      s"""SELECT doc_id, unnest($bandKeys) AS bucket,
         |       unnest(range(0, $bands)) AS band
         |FROM $src""".stripMargin
    def capped(src: String) =
      s"""SELECT * FROM (
         |  SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bucket_sz
         |  FROM $src) WHERE bucket_sz <= $maxBucket""".stripMargin
    s"""${p}corpus AS ($corpusSql),
       |${p}batch AS ($batchSql),
       |${p}cfp AS (SELECT DISTINCT md5(${norm("text")}) AS fp FROM ${p}corpus),
       |${p}creps AS (
       |  SELECT MIN(doc_id) AS doc_id, arg_min(text, doc_id) AS text
       |  FROM ${p}corpus GROUP BY md5(${norm("text")})),
       |${p}csigs AS (SELECT doc_id, text, $sig AS sig FROM ${p}creps),
       |${p}cband AS (${banded(s"${p}csigs")}),
       |${p}ccap AS (${capped(s"${p}cband")}),
       |${p}bfresh AS (
       |  SELECT * FROM (
       |    SELECT MIN(doc_id) AS doc_id, arg_min(text, doc_id) AS text
       |    FROM ${p}batch GROUP BY md5(${norm("text")}))
       |  WHERE md5(${norm("text")}) NOT IN (SELECT fp FROM ${p}cfp)),
       |${p}bsigs AS (SELECT doc_id, text, $sig AS sig FROM ${p}bfresh),
       |${p}bband AS (${banded(s"${p}bsigs")}),
       |${p}bcap AS (${capped(s"${p}bband")}),
       |${p}cands AS (
       |  SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
       |  FROM ${p}bcap b JOIN ${p}ccap c
       |    ON b.band = c.band AND b.bucket = c.bucket),
       |${p}dup AS (
       |  SELECT DISTINCT ${p}cands.bid FROM ${p}cands
       |  JOIN ${p}bfresh bb ON bb.doc_id = ${p}cands.bid
       |  JOIN ${p}creps cc ON cc.doc_id = ${p}cands.cid
       |  WHERE ${hashJaccard("bb.text", "cc.text", shingleSize)} >= $tau),
       |${p}adm AS MATERIALIZED (
       |  SELECT doc_id, text FROM ${p}bfresh
       |  WHERE doc_id NOT IN (SELECT bid FROM ${p}dup))""".stripMargin
  }
}
