package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions.{cosine_sim, simhash64}
import graft.sources.Tables

/** Record-deduplication family (north-star ops, SURVEY.md §2): exact,
  * n-gram-Jaccard, MinHash-LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design — the non-negotiable at 100 TB is NO O(n²): every fuzzy
  * variant goes through a candidate-generation step that is linear-ish
  * (inverted shingle index, LSH band buckets, SimHash blocks, hyperplane
  * buckets) and only verifies candidates pairwise. Exact dedup shuffles a
  * 16-byte digest, never the document text.
  */
object DedupOps {

  /** Default stop-shingle cutoff for [[jaccardPairs]]: shingles present in
    * more than this many documents are dropped before pair generation. The
    * posting-list pair expansion is C(df, 2) PER SHINGLE — a natural-language
    * corpus at 100 TB has stop-shingles ("of the and" …) with df in the
    * millions, which would explode quadratically. Such shingles carry ~zero
    * Jaccard signal (they're in everything), so dropping them changes scores
    * negligibly while bounding every posting list. Production entry points
    * get this default; only the oracle-parity query passes an explicit
    * `None` (the DuckDB recompute is unguarded, so parity requires it). */
  val DefaultMaxDf = 1000

  // ---- shingling ----

  /** Contiguous k-token shingles (space-joined). Documents shorter than k
    * tokens produce no shingles — mirrored by the oracle's WHERE len >= k. */
  def shingles(tokens: Column, k: Int): Column =
    transform(sequence(lit(0), size(tokens) - k),
      i => array_join(slice(tokens, i + lit(1), lit(k)), " "))

  /** doc_id → exploded distinct shingle, the inverted-index input. */
  def shingleIndex(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("t"), k))).as("shingle"))

  /** Same index with shingles reduced to 64-bit hashes: the shuffle moves
    * 8-byte keys instead of ~20-char strings and set-intersections compare
    * longs. Collision odds over 10^6 distinct shingles ≈ 2·10⁻⁸ — fine for
    * candidate generation and Jaccard estimation at scale (q_dedup_ngram
    * keeps exact strings because its DuckDB oracle recomputes them). */
  def hashedShingleIndex(docs: DataFrame, k: Int): DataFrame =
    shingleIndex(docs, k)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))

  // ---- exact dedup ----

  /** q_dedup_exact — keeper assignment per duplicate group. Groups on
    * md5(text) (16-byte shuffle key), not the text itself: at 100 TB the
    * shuffle moves digests, and text only rides along as the per-group
    * min-doc payload. */
  def qExact(spark: SparkSession, sfDir: String): DataFrame =
    exactKeepers(Tables.documents(spark, sfDir))

  /** Same, over any (doc_id, text) frame. */
  def exactKeepers(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("digest"))
    docs
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("keeper_id")).cast("int"))
      .select(col("doc_id"), col("keeper_id"), col("is_dup"))
      .orderBy(col("doc_id"))
  }

  // ---- n-gram Jaccard ----

  /** All ordered doc-id pairs sharing a shingle, with shared-shingle counts:
    * group the inverted index by shingle into its posting list and emit the
    * C(m,2) ordered pairs per list with higher-order functions. ONE shuffle
    * of the index (by shingle) — a self-join would shuffle it twice and scan
    * the index lineage twice. Posting lists are bounded by the maxDf cutoff
    * (or the corpus's natural shingle df), so the per-row pair explosion is
    * bounded too.
    *
    * The index rows carry each doc's shingle-set size (`n_sh`), so the
    * posting lists emit pairs WITH both sizes attached and the aggregated
    * pair table — the largest intermediate of the whole dedup family —
    * needs no join at all afterwards (r16: this replaced two sort-merge
    * joins of the pair table against a per-doc sizes aggregate; the sizes
    * are functionally determined by the ids, so grouping on them changes
    * nothing). */
  private def cooccurrencePairs(sh: DataFrame): DataFrame = {
    def pairCombos(sorted: Column): Column =
      flatten(transform(sorted, (x, i) =>
        transform(slice(sorted, i + lit(2), size(sorted)),
          y => struct(x.as("a"), y.as("b")))))
    sh.groupBy(col("shingle"))
      .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairCombos(array_sort(col("ids")))).as("p"))
      .select(col("p.a.doc_id").as("id_a"), col("p.b.doc_id").as("id_b"),
        col("p.a.n_sh").as("n_a"), col("p.b.n_sh").as("n_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("common"))
  }

  /** Inverted index for [[jaccardPairs]]/[[qMinhash]]: hashed shingles, the
    * optional maxDf stop-shingle cutoff, cached — the index feeds multiple
    * consumers (pair generation + per-doc sizes + signatures/verification)
    * and caching beats recomputing the tokenize→shingle→explode lineage per
    * consumer. ~16 bytes/row, spills to disk if it ever outgrows memory.
    * Repeat calls do NOT stack cache entries: CacheManager dedups by
    * canonicalized logical plan, so the same (docs, k, maxDf) re-registers
    * the existing entry ("Asked to cache already cached data" warning);
    * distinct inputs get one bounded entry each for the session. */
  private def cachedIndex(docs: DataFrame, k: Int,
                          maxDf: Option[Int]): DataFrame = {
    val sh0 = hashedShingleIndex(docs, k)
    val sh = maxDf match {
      case Some(m) =>
        val hot = sh0.groupBy("shingle").count().filter(col("count") > m)
          .select("shingle")
        sh0.join(hot, Seq("shingle"), "left_anti")
      case None => sh0
    }
    sh.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** [[cachedIndex]] twin carrying each doc's shingle-set size on every
    * index row — (doc_id, n_sh, shingle). With maxDf unset the size is
    * computed MAP-SIDE from the distinct-shingle array before the explode
    * (zero extra shuffle); with a cutoff the surviving rows are re-counted
    * with a per-doc window (partitions bounded by a single document's
    * shingle count, so no skew). Feeding [[jaccardPairs]], this is what
    * lets the pair table skip its former sizes joins entirely. */
  private def cachedSizedIndex(docs: DataFrame, k: Int,
                               maxDf: Option[Int]): DataFrame = {
    val base = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), array_distinct(shingles(col("t"), k)).as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("n_sh"),
        explode(col("arr")).as("s"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("s")).as("shingle"))
    val sized = maxDf match {
      case Some(m) =>
        val hot = base.groupBy("shingle").count().filter(col("count") > m)
          .select("shingle")
        // post-cutoff sizes: the Jaccard denominator counts only the
        // shingles that survived the stop-shingle drop (same contract as
        // the former sizes aggregate over the filtered index)
        base.join(hot, Seq("shingle"), "left_anti")
          .withColumn("n_sh",
            count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      case None => base
    }
    sized.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact Jaccard over distinct k-shingle sets for all pairs sharing ≥1
    * shingle (inverted-index pair generation — pairs that share nothing are
    * never materialized). `maxDf` drops shingles present in more than that
    * many documents: stop-shingle skew control at scale (off for oracle
    * runs).
    *
    * The index carries 64-bit shingle hashes: the shuffle moves 8-byte
    * longs instead of ~20-char strings. Collision odds
    * (§[[hashedShingleIndex]]) are ~1e-8 over a million distinct shingles —
    * the DuckDB oracle on exact strings still hash-matches. */
  def jaccardPairs(docs: DataFrame, k: Int = 3,
                   maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame =
    // the per-doc sizes ride the index rows into the posting lists
    // ([[cooccurrencePairs]]), so the aggregated pair table is never
    // shuffled again: its former two sort-merge sizes joins (hinted merge
    // because neither side was statically safe to broadcast — sizes is
    // O(docs), and the pair side's explode-blind size estimate once got a
    // 10 GiB table broadcast and killed the job) are gone outright, which
    // is strictly better at every scale — the pair table is the largest
    // intermediate of the family and now crosses the network exactly once.
    cooccurrencePairs(cachedSizedIndex(docs, k, maxDf))
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")), 6))

  /** q_dedup_ngram — top-20 most-similar pairs by 3-gram Jaccard
    * (deterministic: rounded score desc, then ids).
    *
    * `maxDf = None` is the ORACLE-PARITY configuration only: the DuckDB
    * recompute has no stop-shingle cutoff, so hash-equality requires the
    * unguarded index. Do not copy this into a pipeline — every production
    * entry point defaults to [[DefaultMaxDf]] for exactly that reason. */
  def qNgram(spark: SparkSession, sfDir: String): DataFrame =
    jaccardPairs(Tables.documents(spark, sfDir), k = 3, maxDf = None)
      .select(col("id_a"), col("id_b"), col("common"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(20)

  // ---- MinHash + LSH ----

  /** MinHash signatures: numHashes mins per doc. The hash family is
    * xxhash64(shingle, i) — i as a second hashed column gives independent
    * draws without the a·x+b arithmetic (which ANSI mode rejects on long
    * overflow). One aggregate pass — numHashes min() columns, all map-side
    * partial. */
  def minhashSignatures(docs: DataFrame, k: Int = 3,
                        numHashes: Int = 64): DataFrame =
    signaturesFromIndex(hashedShingleIndex(docs, k), numHashes)

  /** Same, from a prepared hashed index (lets one cached index feed both
    * signatures and verification). */
  private def signaturesFromIndex(sh: DataFrame,
                                  numHashes: Int = 64): DataFrame = {
    // hashed index: the 64 per-row hash evaluations each digest 8 bytes
    // instead of re-hashing the shingle string
    val mins = (0 until numHashes).map { i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"m$i")
    }
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: bands buckets of rows-per-band signature slices; docs
    * sharing any (band, bucket) become candidate pairs. bands=16 × rows=4
    * over 64 hashes ≈ 0.5 Jaccard threshold knee. */
  def minhashCandidates(signatures: DataFrame, bands: Int = 16,
                        rowsPerBand: Int = 4): DataFrame = {
    val banded = signatures.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + lit(1),
          lit(rowsPerBand))))).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    // merge: both sides are the banding explode of the whole signature
    // table — unbounded and estimate-blind (see the jaccardPairs note)
    a.join(b.hint("merge"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard for an explicit candidate-pair set: joins each side's
    * collected shingle set and intersects — O(|candidates|), never touching
    * non-candidate pairs. This is the verify half of every LSH scheme. */
  def verifyJaccard(cands: DataFrame, docs: DataFrame, k: Int = 3): DataFrame =
    verifyFromIndex(cands, hashedShingleIndex(docs, k))

  /** Verification against a prepared hashed index. */
  private def verifyFromIndex(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sets = sh
      .groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("sh_set"),
        count(lit(1)).as("n_sh"))
    // merge: sets is O(docs) and carries each doc's FULL shingle set —
    // the worst possible broadcast payload (see the jaccardPairs note)
    cands
      .join(sets.select(col("doc_id").as("id_a"), col("sh_set").as("set_a"),
        col("n_sh").as("n_a")).hint("merge"), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("sh_set").as("set_b"),
        col("n_sh").as("n_b")).hint("merge"), "id_b")
      .withColumn("common", size(array_intersect(col("set_a"), col("set_b")))
        .cast("long"))
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")), 6))
      .select(col("id_a"), col("id_b"), col("common"), col("jaccard"))
  }

  /** q_dedup_minhash — MinHash-LSH candidates verified with exact Jaccard
    * (verification touches only candidate pairs — the whole point of LSH;
    * an all-pairs verify would re-pay the O(shared-shingle pairs) join the
    * banding just avoided). Hash-matched against a generated DuckDB
    * oracle that reads the signature and hashed-shingle tables as parquet
    * side-inputs ([[sides]] — the xxhash64 family itself is the one part
    * DuckDB cannot replay) and REPLAYS banding, candidate pairing, exact
    * Jaccard and the top-20 cut. The oracle bands by slice EQUALITY where
    * Spark bands by murmur3(slice): hash-collision candidates are a
    * superset with near-zero Jaccard, so the verified top-20 agrees. */
  def qMinhash(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = cachedIndex(Tables.documents(spark, sfDir), k = 3, maxDf = None)
    val cands = minhashCandidates(signaturesFromIndex(sh))
    verifyFromIndex(cands, sh)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  // ---- SimHash ----

  /** 64-bit SimHash per document: majority vote of token-hash bits, fused
    * into the native [[simhash64]] kernel — one map-side projection, zero
    * shuffle (documents are one row each; the former explode → 64
    * conditional-sum aggregates → repack pipeline paid a full shuffle and a
    * 64-column aggregate for a per-row computation). Token hashing is
    * bit-identical to `xxhash64(token)`, so results are unchanged. */
  def simhash(docs: DataFrame): DataFrame =
    docs
      // same contract as the old explode/aggregate form: a null text
      // produced no token rows, so the doc was absent from the output —
      // not present with a NULL hash
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        simhash64(TextAnalysis.tokens(col("text"))).as("simhash"))

  /** Candidate pairs by 16-bit block collision (4 blocks; guarantees all
    * pairs at hamming ≤ 3, approximates above), verified by bit_count. */
  def simhashPairs(sims: DataFrame, maxHamming: Int = 8): DataFrame = {
    val blocked = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("block", "blockval")))
    val a = blocked.select(col("block"), col("blockval"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = blocked.select(col("block"), col("blockval"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    // merge: block-collision self-join of the whole corpus (see the
    // jaccardPairs note)
    a.join(b.hint("merge"), Seq("block", "blockval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** q_dedup_simhash — closest pairs by SimHash hamming distance.
    * Hash-matched against a generated DuckDB oracle that reads the
    * per-doc simhash table as a parquet side-input ([[sides]] — the
    * xxhash64 majority vote is the one part DuckDB cannot replay) and
    * REPLAYS block extraction (`(h >> 16b) & 0xffff` — the mask makes
    * arithmetic and logical shift agree), block-collision pairing,
    * bit_count hamming and the top-20 cut. */
  def qSimhash(spark: SparkSession, sfDir: String): DataFrame =
    simhashPairs(simhash(Tables.documents(spark, sfDir)), maxHamming = 16)
      .orderBy(col("hamming"), col("id_a"), col("id_b"))
      .limit(20)

  // ---- embedding near-dup ----

  /** q_dedup_embedding — near-duplicate vectors by cosine ≥ threshold, via
    * random-hyperplane LSH candidates + native cosine_sim verification.
    * See [[Similarity.hyperplaneBuckets]] for the bucketing. Hash-matched
    * against a generated DuckDB oracle that reads the seeded 8-plane
    * matrix as a parquet side-input ([[sides]]) and REPLAYS sign-bit
    * bucketing, same-bucket pairing and the cosine top-20. */
  def qEmbedding(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val bucketed = Similarity.hyperplaneBuckets(emb, nPlanes = 8, seed = 7L)
    val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("e_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("e_b"))
    // merge: bucket-collision self-join carrying full embeddings (see
    // the jaccardPairs note)
    a.join(b.hint("merge"), "bucket").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine_sim(col("e_a"), col("e_b")), 6).as("cosine"))
      .distinct()
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  /** q_dedup_stats — duplicate-group-size histogram, the dedup audit query:
    * run before AND after a dedup pass, the before shows how much duplicated
    * mass exists, the after must be a single group_size=1 row. Shuffles only
    * 16-byte digests, then a tiny second aggregate. */
  def qDedupStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(count(lit(1)).as("group_size"))
      .groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(col("group_size"))

  /** q_shingle_df — the stop-shingle diagnostic that calibrates
    * [[DefaultMaxDf]]: top shingles by document frequency. At 100 TB this
    * IS the query you run to pick the cutoff — posting-list pair cost is
    * C(df, 2), so the head of this ranking is the entire skew budget. */
  def qShingleDf(spark: SparkSession, sfDir: String): DataFrame =
    shingleIndex(Tables.documents(spark, sfDir), 3)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(10)

  /** Benchmark decontamination: per-source accounting of training docs that
    * share ≥1 k-shingle with an eval set. The eval set is tiny by nature,
    * so its shingle set BROADCASTS and the corpus-side index never shuffles
    * for the membership join — the only shuffle is the per-doc rollup of
    * actual hits (matched rows only). This is the standard n-gram-overlap
    * decontamination pass of an LLM data pipeline, shaped so 100 TB of
    * training text streams past a few MB of benchmark shingles. */
  def contaminationBySource(docs: DataFrame, benchDocs: DataFrame,
                            k: Int = 3): DataFrame = {
    val hits = contaminationHits(docs, benchDocs, k)
    docs.select(col("doc_id"), col("source"))
      // merge: hits is O(contaminated docs) — unbounded (see jaccardPairs)
      .join(hits.hint("merge"), Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_shared") > 0).cast("long")).as("n_contaminated"),
        max(col("n_shared")).as("max_shared"))
      .orderBy(col("source"))
  }

  /** Per-doc contamination hits: (doc_id, n_shared) for every doc of
    * `docs` sharing ≥1 k-shingle with `benchDocs`. The single definition
    * behind both [[contaminationBySource]] and the Curation funnel — the
    * eval shingle set broadcasts, the corpus index never shuffles for the
    * membership join. */
  def contaminationHits(docs: DataFrame, benchDocs: DataFrame,
                        k: Int = 3): DataFrame =
    shingleIndex(docs, k)
      .join(broadcast(
        shingleIndex(benchDocs, k).select(col("shingle")).distinct()),
        Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // index shingles are per-doc distinct

  /** q_decontaminate — docs 0–1 stand in as the eval set; every other doc
    * is checked for 3-gram overlap against them. */
  def qDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    contaminationBySource(docs.filter(col("doc_id") >= 2),
      docs.filter(col("doc_id") < 2))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate" -> (qDecontaminate _),
    "q_dedup_stats" -> (qDedupStats _),
    "q_shingle_df" -> (qShingleDf _),
    "q_dedup_exact" -> (qExact _),
    "q_dedup_ngram" -> (qNgram _),
    "q_dedup_minhash" -> (qMinhash _),
    "q_dedup_simhash" -> (qSimhash _),
    "q_dedup_embedding" -> (qEmbedding _))

  /** Oracle side-inputs — the xxhash64-derived model tables the DuckDB
    * replays read via `{OUT_DIR}` (resolved by Verify at dump time).
    * Both are exact-integer aggregations, so a re-run lands the
    * identical table the query run computed. */
  val sides: Map[String, (SparkSession, String, String) => Unit] = Map(
    "q_dedup_minhash" ->
      ((spark: SparkSession, sfDir: String, dir: String) => {
        val sh = hashedShingleIndex(Tables.documents(spark, sfDir), k = 3)
        sh.write.mode("overwrite").parquet(s"$dir/shingles")
        signaturesFromIndex(sh).write.mode("overwrite")
          .parquet(s"$dir/sigs")
      }),
    "q_dedup_simhash" ->
      ((spark: SparkSession, sfDir: String, dir: String) =>
        simhash(Tables.documents(spark, sfDir))
          .write.mode("overwrite").parquet(s"$dir/sims")),
    "q_dedup_embedding" ->
      ((spark: SparkSession, sfDir: String, dir: String) =>
        Similarity.planesTable(spark, nTables = 1, bitsPerTable = 8,
          dim = 64, seed = 7L).coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/planes")))

  val oracles: Map[String, String] = Map(
    "q_dedup_minhash" ->
      """WITH sigs AS (
        |  SELECT doc_id, sig
        |  FROM read_parquet('{OUT_DIR}/_side/q_dedup_minhash/sigs/*.parquet')),
        |sh AS (
        |  SELECT doc_id, shingle
        |  FROM read_parquet('{OUT_DIR}/_side/q_dedup_minhash/shingles/*.parquet')),
        |banded AS (
        |  SELECT doc_id, b.band, sig[b.band*4+1 : b.band*4+4] AS slice
        |  FROM sigs, (SELECT unnest(range(0, 16)) AS band) b),
        |cands AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.slice = b.slice
        |  WHERE a.doc_id < b.doc_id),
        |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        |  FROM cands c
        |  JOIN sh x ON x.doc_id = c.id_a
        |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
        |  GROUP BY c.id_a, c.id_b)
        |SELECT c.id_a, c.id_b,
        |  ROUND(CAST(COALESCE(cm.n_common, 0) AS DOUBLE) /
        |    (na.n_sh + nb.n_sh - COALESCE(cm.n_common, 0)), 6) AS jaccard
        |FROM cands c
        |JOIN counts na ON na.doc_id = c.id_a
        |JOIN counts nb ON nb.doc_id = c.id_b
        |LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
        |ORDER BY jaccard DESC, c.id_a, c.id_b LIMIT 20""".stripMargin,
    "q_dedup_simhash" ->
      """WITH sims AS (
        |  SELECT doc_id, simhash
        |  FROM read_parquet('{OUT_DIR}/_side/q_dedup_simhash/sims/*.parquet')),
        |blocked AS (
        |  SELECT doc_id, simhash,
        |    b.block, (simhash >> (b.block * 16)) & 65535 AS blockval
        |  FROM sims, (SELECT unnest(range(0, 4)) AS block) b),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM blocked a JOIN blocked b
        |    ON a.block = b.block AND a.blockval = b.blockval
        |  WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 16
        |ORDER BY hamming, id_a, id_b LIMIT 20""".stripMargin,
    "q_dedup_embedding" ->
      """WITH planes AS (
        |  SELECT bit, CAST(vec AS DOUBLE[]) AS pvec
        |  FROM read_parquet('{OUT_DIR}/_side/q_dedup_embedding/planes/*.parquet')),
        |base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |buckets AS (
        |  SELECT b.vec_id, b.emb,
        |    SUM(CASE WHEN list_inner_product(b.emb, p.pvec) > 0
        |      THEN 1 << p.bit ELSE 0 END) AS bucket
        |  FROM base b CROSS JOIN planes p
        |  GROUP BY b.vec_id, b.emb),
        |pairs AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        |    ROUND(list_inner_product(a.emb, b.emb) /
        |      sqrt(list_inner_product(a.emb, a.emb) *
        |        list_inner_product(b.emb, b.emb)), 6) AS cosine
        |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket
        |  WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM pairs
        |ORDER BY cosine DESC, id_a, id_b LIMIT 20""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(t) - 3 + 2),
        |        i -> array_to_string(t[i:i+2], ' '))) AS s
        |    FROM toks WHERE len(t) >= 3)),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 2),
        |hits AS (
        |  SELECT sh.doc_id, COUNT(*) AS n_shared
        |  FROM sh JOIN bench USING (s)
        |  WHERE sh.doc_id >= 2
        |  GROUP BY 1)
        |SELECT d.source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN COALESCE(h.n_shared, 0) > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_contaminated,
        |  CAST(MAX(COALESCE(h.n_shared, 0)) AS BIGINT) AS max_shared
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id >= 2
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q_dedup_stats" ->
      """SELECT group_size, COUNT(*) AS n_groups FROM (
        |  SELECT md5(text) AS digest, COUNT(*) AS group_size
        |  FROM documents GROUP BY 1) g
        |GROUP BY group_size
        |ORDER BY group_size""".stripMargin,
    "q_shingle_df" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(t) - 3 + 2),
        |        i -> array_to_string(t[i:i+2], ' '))) AS s
        |    FROM toks WHERE len(t) >= 3))
        |SELECT s AS shingle, COUNT(*) AS df FROM sh
        |GROUP BY s
        |ORDER BY df DESC, shingle
        |LIMIT 10""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, keeper_id, CAST(is_dup AS INT) AS is_dup FROM (
        |  SELECT doc_id,
        |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
        |    doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(t) - 3 + 2),
        |        i -> array_to_string(t[i:i+2], ' '))) AS s
        |    FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, common,
        |  ROUND(common / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |ORDER BY jaccard DESC, id_a, id_b
        |LIMIT 20""".stripMargin)
}
