package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.TextShingles
import scala.util.chaining._

/** Near-duplicate detection for training-data pipelines (SURVEY §2.10
  * [EXT], BASELINE north star). All plans are banding-join shaped: no
  * cross product ever touches the corpus, so the same plan runs at
  * 100 TB — candidate generation is an equi-join on (band, key), and
  * expensive verification only runs on candidates.
  */
object Dedup {

  /** Exact dedup: sha256 text fingerprint, keep min(id) per group
    * (hash-groupBy — one shuffle on the fingerprint).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), sha2(col(textCol), 256).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper"))

  /** MinHash-LSH candidate pairs, verified with exact Jaccard.
    *
    * shingle(n words) → md5-based minhash signature (numPerms) → split
    * into bands of rowsPerBand → equi-join docs sharing any band key →
    * distinct candidate pairs → exact Jaccard on candidates only.
    *
    * Scale shape: explode is numBands rows/doc; the join shuffles on
    * (band index, band key); hot buckets are bounded because identical
    * band keys imply near-identical signatures. Verification re-joins
    * the (small) candidate set against per-doc shingle sets.
    */
  def minhashLsh(docs: DataFrame, shingleLen: Int = 3, numPerms: Int = 16,
                 bands: Int = 8, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    requireBandParams(numPerms, bands)
    val hb = lshHashBands(docs, shingleLen, numPerms, bands, idCol, textCol, fan = true)
    val hashSets = lshHashSets(hb)
    val sigs = lshBandRows(hb)

    // Explicit repartition by the band key on both sides: the sigs
    // checkpoint is byte-tiny, so AQE would otherwise broadcast one side
    // and run the whole band-bucket pair emission on the checkpoint's
    // 1-2 scan partitions (the measured simhashPairs pathology — see
    // the repartition comment there; explicit numPartitions also keeps
    // AQE from byte-coalescing CPU-heavy partitions).
    val para = docs.sparkSession.sparkContext.defaultParallelism
    val a = sigs.select(col("doc_id").as("doc_a"), col("band"), col("key"))
      .repartition(para, col("band"), col("key"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("band"), col("key"))
      .repartition(para, col("band"), col("key"))
    // shuffle_hash for the same reason as simhashPairs: co-partitioned
    // sides, and AQE's broadcast conversion would add a driver collect
    // + re-broadcast on top of the explicit exchange already paid
    val candidates = a.hint("shuffle_hash").join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")

    // exact Jaccard (over hash sets) only on the small candidate set
    val candA = candidates
      .join(hashSets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(hashSets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
    val inter = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
    val uni = size(array_union(col("hs_a"), col("hs_b"))).cast("double")
    candA.select(col("doc_a"), col("doc_b"), (inter / uni).as("jaccard"))
  }

  private def requireBandParams(numPerms: Int, bands: Int): Unit =
    require(bands > 0 && numPerms > 0 && numPerms % bands == 0,
      s"numPerms ($numPerms) must be a positive multiple of bands ($bands) — " +
        "bands > numPerms would make every band key empty (an O(N²) cross " +
        "product), and a remainder would silently waste trailing perms")

  /** The distinct 60-bit shingle-HASH set per doc (array<long>,
    * ~8 B/shingle) — shingle strings are never retained or shuffled. It
    * feeds the signature build AND candidate verification (Jaccard over
    * hash sets == Jaccard over string sets under the same hash on both
    * engines); checkpointed so band joins and verify joins reuse one
    * materialization instead of recomputing shingling+md5.
    */
  /** ONE materialization of (doc_id, shingle-hash set, band-key array):
    * shingling + md5 + the numPerms-perm signature + banding all run in
    * a single fused pass and checkpoint together — the former
    * hashSets-then-bandRows shape paid TWO sequential materialization
    * actions per pipeline (and kept two block sets alive) for the same
    * data. [[lshHashSets]]/[[lshBandRows]] are views over this: the
    * band explode is a codegen Generate over an 8-element array, cheap
    * to re-run per consumer from checkpoint blocks.
    *
    * `fan=true` floors the scan's parallelism before the shingle kernel
    * (guide §2.5 unsplittable input; identity at scale) — worth one
    * extra local exchange only for FULL-corpus builds where the kernel
    * dominates (minhashLsh: measured −0.3 s at sf0.1); the incremental
    * path passes false because its per-batch inputs are small and the
    * exchange costs more than the kernel saves (measured +0.33 s on the
    * q69 gate).
    */
  private def lshHashBands(docs: DataFrame, shingleLen: Int, numPerms: Int,
                           bands: Int, idCol: String, textCol: String,
                           fan: Boolean = false): DataFrame =
    (if (fan) graft.core.Scans.fanOut(docs) else docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.ShingleHash64(col(textCol), shingleLen).as("hs"))
      .filter(size(col("hs")) > 0)
      // sig stays a NAMED intermediate: bandKeys references the
      // signature once per band, so inlining the minhash tree into it
      // would duplicate that tree per band key — in plan-inspection mode
      // (checkpoints disabled, nothing truncates) iterative consumers
      // then multiply the duplication per round (measured: OOM while
      // copying the un-truncated nearDupClusters plan)
      .withColumn("sig", TextHash.minhashFromHashes(col("hs"), numPerms))
      .withColumn("bkeys", TextHash.bandKeys(col("sig"), bands, numPerms / bands))
      .select(col("doc_id"), col("hs"), col("bkeys"))
      .pipe(graft.core.Checkpoints.stable)

  /** The (doc_id, hs) view of [[lshHashBands]]. */
  private def lshHashSets(hashBands: DataFrame): DataFrame =
    hashBands.select(col("doc_id"), col("hs"))

  /** The exploded (doc_id, band, key) view of [[lshHashBands]] — carries
    * ONLY ids and keys, never the hash sets.
    */
  private def lshBandRows(hashBands: DataFrame): DataFrame =
    hashBands.select(col("doc_id"),
      posexplode(col("bkeys")).as(Seq("band", "key")))

  // ---- persisted LSH band index (incremental ingest dedup) ----
  //
  // Layout under `root` (any Hadoop-visible filesystem — local, HDFS,
  // object store):
  //   meta.json  {"shingle_len":L,"num_perms":P,"bands":B}
  //   bands/     parquet (band int, key string, doc_id long)
  //   hashes/    parquet (doc_id long, hs array<long>)
  // The band table is exactly the join side minhashLsh computes per run;
  // persisting it turns whole-corpus re-dedup (O(corpus) work per batch)
  // into an append-only index: each new batch shuffles only ITS band
  // rows against the index. The shingle-hash sets are persisted too so
  // candidate verification (exact Jaccard) never touches original text.

  private val bandSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType)))

  private val hashSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("hs",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))

  import graft.storage.{IndexFile, IndexManifest}

  private def lshMetaOf(text: String): (Int, Int, Int) = {
    def field(k: String): Int =
      ("\"" + k + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(text)
        .getOrElse(throw new IllegalStateException(s"lsh index meta missing $k"))
        .group(1).toInt
    (field("shingle_len"), field("num_perms"), field("bands"))
  }

  /** Create an empty persisted index: publishes the band-parameter meta
    * document as manifest version 1 — a CAS, so two racing initializers
    * (or an init on an existing index) lose loudly on any FS with an
    * exactly-one-winner publish. Band parameters are immutable for the
    * life of an index (rows banded under different params must never
    * join).
    */
  def initLshIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                   shingleLen: Int = 3, numPerms: Int = 16, bands: Int = 8): Unit = {
    requireBandParams(numPerms, bands)
    if (IndexManifest.exists(root))
      throw new IllegalStateException(
        s"lsh index already exists at $root - band params are immutable")
    IndexManifest.commit(root, adds = Seq.empty,
      metaJson = Some(
        s"""{"shingle_len":$shingleLen,"num_perms":$numPerms,"bands":$bands}"""),
      expectedSeq = 0L)
    ()
  }

  /** Plan over exactly the pinned state's live files of `sub` — no
    * directory listing, no partition inference, and (because commits
    * are atomic manifest publishes) no crash window in which a reader
    * can see half an append.
    */
  private def readLshSub(spark: org.apache.spark.sql.SparkSession, root: String,
                         st: graft.storage.IndexState, sub: String,
                         schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val files = st.files.iterator.filter(_.sub == sub).map(f => s"$root/${f.path}").toSeq
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).option("recursiveFileLookup", "true")
      .parquet(files: _*)
  }

  /** Write a commit payload into a fresh per-writer uuid dir and return
    * its manifest entries; nothing is visible until they are committed.
    */
  private def writeLshFlat(df: DataFrame, root: String, sub: String): Seq[IndexFile] = {
    val uuid = java.util.UUID.randomUUID().toString
    val rel = s"files/$uuid"
    df.write.parquet(s"$root/$rel")
    val local = if (root.startsWith("file:")) root.stripPrefix("file:") else root
    Option(new java.io.File(s"$local/$rel").listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => IndexFile(sub, -1, s"$rel/${f.getName}", f.length()))
  }

  /** Snapshot read of the live band rows (band, key, doc_id); `asOf`
    * pins a published manifest seq — index time travel, the same q71
    * shape [[graft.llm.SemanticIndex.decisionsAsOf]] exposes on the
    * semantic index (valid until [[vacuumLshIndex]] reaps history).
    */
  def lshIndexBands(spark: org.apache.spark.sql.SparkSession, root: String,
                    asOf: Option[Long] = None): DataFrame =
    readLshSub(spark, root, IndexManifest.state(root, asOf), "bands", bandSchema)

  /** Snapshot read of the live hash-set rows (doc_id, hs); `asOf` as in
    * [[lshIndexBands]].
    */
  def lshIndexHashes(spark: org.apache.spark.sql.SparkSession, root: String,
                     asOf: Option[Long] = None): DataFrame =
    readLshSub(spark, root, IndexManifest.state(root, asOf), "hashes", hashSchema)

  /** Latest published manifest seq of an LSH index — the handle a
    * caller pins BEFORE more ingest/compaction lands, to replay reads
    * against via `asOf`.
    */
  def lshIndexSeq(root: String): Long = IndexManifest.currentSeq(root)

  /** Physically reclaim space (checkpoint + drop old versions + delete
    * unreferenced payloads — crashed writers' orphans and compacted-away
    * files). THE one operation that invalidates pinned reads; schedule
    * it like compaction. Returns (data files deleted, log versions
    * deleted).
    */
  def vacuumLshIndex(spark: org.apache.spark.sql.SparkSession,
                     root: String, retain: Int = 0): (Long, Long) =
    graft.storage.SeriesLease.withDirLease(root)(IndexManifest.vacuum(root, retain))

  /** Incremental near-dup: dedup a NEW batch against the persisted index
    * WITHOUT recomputing the corpus — the ingest-pipeline shape (the
    * dedup analog of the T1 watermark resume). Returns verified pairs
    * (doc_a, doc_b, jaccard), ids normalized ascending, covering
    * new-vs-index and new-vs-new; with `append=true` the batch's band
    * rows and hash sets are committed to the index afterwards IN ONE
    * ATOMIC MANIFEST PUBLISH, so incremental(batch1)..incremental(batchN)
    * over a partition of the corpus yields EXACTLY the full-rebuild pair
    * set, each pair once (spec: IncrementalLshSpec).
    *
    * Delivery contract: COMMITTING ingest is IDEMPOTENT on doc id — an
    * id already committed is absorbed (first write wins; revised text
    * under a reused id is NOT picked up), and a fully-replayed batch
    * publishes nothing at all, so at-least-once delivery (a streaming
    * foreachBatch replay, a retry after a crash) commits each doc
    * exactly once. Because bands and hashes land in one commit, there is
    * no partial-commit window: a crash before the publish leaves orphan
    * payload files (invisible; [[vacuumLshIndex]] reaps them) and the
    * retry re-derives the batch — the r16 "duplicate band rows live
    * forever after a bands-landed/hashes-lost retry" storage leak is
    * structurally gone. Dry-runs (`append=false`) stay a pure candidate
    * QUERY: they process the batch whether or not its ids are in the
    * index. Committing appends serialize through the index root's dir
    * lease AND the manifest CAS; an id must still mean the same document
    * everywhere.
    *
    * Scale shape: per batch the work is O(|batch| band rows) shuffled
    * against the index's (band,key) table — the index side is an
    * equi-join probe, never rewritten (commits only add files). Both
    * join sides pin their exchange (explicit numPartitions on the full
    * band key) for the measured byte-based-planner pathology: a
    * byte-tiny new batch would otherwise broadcast and serialize the
    * bucket-pair evaluation onto the index scan's partitioning.
    */
  def minhashLshIncremental(newDocs: DataFrame, root: String,
                            append: Boolean = true,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    // committing ingests serialize through the index's dir lease (two
    // unserialized appends would each MISS the other batch's cross
    // pairs — a silent under-merge, not a crash); dry-runs are pure
    // reads of a pinned manifest state and take no lease
    if (append)
      graft.storage.SeriesLease.withDirLeaseHandle(root) { h =>
        minhashLshIncrementalBody(newDocs, root, append, idCol, textCol, Some(h))
      }
    else
      minhashLshIncrementalBody(newDocs, root, append, idCol, textCol, None)
  }

  private def minhashLshIncrementalBody(newDocs: DataFrame, root: String,
                                        append: Boolean, idCol: String, textCol: String,
                                        lease: Option[graft.storage.SeriesLease.Handle]): DataFrame = {
    val spark = newDocs.sparkSession
    // state read INSIDE the critical section for committing calls; the
    // commit CAS at st.seq makes any serialization failure loud
    val st = IndexManifest.state(root)
    val (shingleLen, numPerms, bands) = lshMetaOf(st.metaJson)
    val idxBands = readLshSub(spark, root, st, "bands", bandSchema)
    val idxHashes = readLshSub(spark, root, st, "hashes", hashSchema)
    // COMMITTING idempotence: doc ids already committed are ABSORBED
    // (first write wins), keyed on the hashes table. Dry-runs are a
    // pure CANDIDATE QUERY — they process the batch regardless, so
    // probing docs that already live in the index keeps returning their
    // candidates.
    val freshDocs =
      if (!append) newDocs
      else newDocs.join(
        idxHashes.select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
    val newHb = lshHashBands(freshDocs, shingleLen, numPerms, bands, idCol, textCol)
    val newHashes = lshHashSets(newHb)
    val newBands = lshBandRows(newHb)
      .select(col("band").cast("int").as("band"), col("key"), col("doc_id"))

    val para = spark.sparkContext.defaultParallelism
    val a = newBands.select(col("doc_id").as("doc_a"), col("band"), col("key"))
      .repartition(para, col("band"), col("key"))
    val b = idxBands.withColumn("is_new", lit(false))
      .union(newBands.withColumn("is_new", lit(true)))
      .select(col("doc_id").as("doc_b"), col("band"), col("key"), col("is_new"))
      .repartition(para, col("band"), col("key"))
    // shuffle_hash: same co-partitioned-sides rationale as minhashLsh
    val candidates = a.hint("shuffle_hash").join(b, Seq("band", "key"))
      .filter(col("doc_a") =!= col("doc_b"))
      // new-vs-new appears in both orientations — keep one; new-vs-index
      // appears once (a-side is new-only) — keep it whatever the order
      .filter(!col("is_new") || col("doc_a") < col("doc_b"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    val allHashes = idxHashes.union(newHashes)
    val candA = candidates
      .join(allHashes.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(allHashes.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
    val inter = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
    val uni = size(array_union(col("hs_a"), col("hs_b"))).cast("double")
    val result = candA.select(col("doc_a"), col("doc_b"), (inter / uni).as("jaccard"))

    // a fully-replayed (or shingle-empty) batch commits nothing: replay
    // is a true no-op, not a version bump — newHashes is checkpointed,
    // so the emptiness probe is O(1) (a flat write of an empty frame
    // would otherwise stage a schema-only file and publish it)
    if (append && !newHashes.isEmpty) {
      val adds = writeLshFlat(newBands, root, "bands") ++
        writeLshFlat(newHashes, root, "hashes")
      lease.foreach(_.assertOwned()) // loud failure on a stolen lease
      IndexManifest.commit(root, adds = adds, expectedSeq = st.seq)
    }
    result
  }

  /** Compact the persisted LSH index: each incremental batch commits one
    * file set to bands and hashes, so after many batches the probe side
    * of every future dedup is a small-files scan — the same disease
    * `LakeMaintenance.compactSeries` and q70 cure for the lake. Rewrites
    * each sub clustered on the probe key ((band, key) for bands, doc_id
    * for hashes) and sorted within partitions so row groups RLE-compress
    * and min/max prune. `targetFiles` is a FLOOR, not a cap: the rewrite
    * partition count scales with the sub's bytes (~256 MB of compressed
    * input per task, sizes read from the MANIFEST, not a listing) so
    * compacting a corpus-scale index never funnels gigabytes through one
    * sort task — at small scale the output is exactly `targetFiles`
    * files; at 100 TB it is size-proportional large files, which bounds
    * the small-files count just as well (the point of compaction) while
    * every rewrite task sorts a bounded slice.
    *
    * Same single-writer contract as the append path (lease + manifest
    * CAS): run it between batches, not during one. Both subs' rewrites
    * land in ONE atomic publish that removes the replaced files; nothing
    * is renamed, nothing parked, and readers holding the prior seq keep
    * reading the old files until [[vacuumLshIndex]]. Returns
    * (filesBefore, filesAfter) live counts summed over both subs; a
    * no-op (already ≤ target) returns equal counts and publishes
    * nothing.
    */
  def compactLshIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                      targetFiles: Int = 4): (Long, Long) = {
    graft.storage.SeriesLease.withDirLeaseHandle(root) { leaseH =>
      val st = IndexManifest.state(root) // fail fast on a non-index dir

      def compactSub(sub: String, schema: org.apache.spark.sql.types.StructType,
                     clusterCols: Seq[String]): (Long, Seq[IndexFile], Seq[IndexFile]) = {
        val files = st.files.filter(_.sub == sub)
        val before = files.length.toLong
        if (before <= targetFiles) return (before, Seq.empty, Seq.empty)
        // ~256 MB of compressed input per rewrite task: bounded sort
        // memory at any index size (see the scaling note in the doc)
        val parts = math.max(targetFiles,
          (files.map(_.bytes).sum / (256L << 20)).toInt + 1)
        if (parts >= before) return (before, Seq.empty, Seq.empty) // already size-proportional
        val rewritten = readLshSub(spark, root, st, sub, schema)
          .repartition(parts, clusterCols.map(col): _*)
          .sortWithinPartitions(clusterCols.map(col): _*)
        (before, writeLshFlat(rewritten, root, sub), files)
      }

      val (b0, bAdds, bRemoves) = compactSub("bands", bandSchema, Seq("band", "key"))
      val (h0, hAdds, hRemoves) = compactSub("hashes", hashSchema, Seq("doc_id"))
      val adds = bAdds ++ hAdds
      val removes = bRemoves ++ hRemoves
      if (adds.nonEmpty || removes.nonEmpty) {
        leaseH.assertOwned() // commit point
        IndexManifest.commit(root, adds = adds, removes = removes, expectedSeq = st.seq)
      }
      (b0 + h0, b0 + h0 - removes.length + adds.length)
    }
  }


  /** SimHash fingerprints: 32-bit per doc over whitespace tokens. Pairs
    * within a Hamming radius are found by joining on byte-bands (any of
    * the 4 bytes equal ⇒ candidate — exact for radius ≤ 3 by pigeonhole
    * when radius < bands).
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    // one fused pass: tokenize + md5 + 32 bit-votes per row (no fanOut:
    // the kernel is cheaper than an extra exchange — measured)
    docs.select(col(idCol).as("doc_id"),
      graft.functions.SimHash32Expr(col(textCol)).as("simhash"))

  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // 4 byte-bands are pigeonhole-complete ONLY for radius ≤ 3: with 4+
    // differing bits every band can differ and the candidate set silently
    // loses pairs — refuse rather than under-report
    require(maxHamming >= 0 && maxHamming <= 3,
      s"simhashPairs: 4 byte-bands are exact only for maxHamming <= 3, got $maxHamming")
    // tiny (id + 1 long) and feeds a self-join → materialize once
    val fp = simhash(docs, idCol, textCol).pipe(graft.core.Checkpoints.stable)
    val banded = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 8) % 256): _*)).as(Seq("band", "key")))
    // Block-decomposed self-join for hot buckets: a (band,key) bucket
    // is ONE key group to the join — a saturated fingerprint region (a
    // dense corpus can put ~25% of all docs into one 8-bit band value)
    // makes that group a single task evaluating |bucket|²/2 pairs
    // serially with the whole side buffered in memory. Each doc is
    // chunked by id into k(bucket) blocks and the join key extended to
    // (band, key, blockA, blockB): a hot bucket becomes k(k+1)/2
    // independently-scheduled key groups — exact same pair set, k²-way
    // parallel, per-task memory bounded by blockSize. k is ADAPTIVE
    // (ceil(|bucket|/blockSize), capped): the bucket-count aggregate is
    // tiny (≤ 4·256 rows here, ≤ bands·2^bits in general) and comes
    // back as a broadcast, so cold buckets get k=1 — zero replication,
    // zero overhead — and only saturated buckets pay the split.
    val blockSize = 1024
    val maxBlocks = 16
    val counts = banded.groupBy("band", "key")
      .agg(count(lit(1)).as("bucket_n"))
    val bk = banded.join(broadcast(counts), Seq("band", "key"))
      .withColumn("k",
        least(lit(maxBlocks), ceil(col("bucket_n") / blockSize)).cast("int"))
    // Pin the join's parallelism to the cluster, not to the input's
    // partition count: both sides are explicitly repartitioned by the
    // FULL join key. Without this, a corpus whose fingerprint table is
    // broadcast-small lets AQE pick a broadcast join whose probe side
    // inherits the few partitions of the tiny fp scan — the whole
    // bucket²-pair evaluation then runs on 1-2 cores no matter how hot
    // the buckets are (measured at sf1: 40 s wall, 1.6-core average,
    // while 10× the data ran FASTER because it crossed the broadcast
    // threshold into a shuffled join). An explicit numPartitions is
    // exempt from AQE partition coalescing, which would otherwise
    // re-merge these CPU-heavy-but-byte-light partitions; with both
    // sides co-partitioned the join itself adds no further exchange.
    val para = docs.sparkSession.sparkContext.defaultParallelism
    val joinKey = Seq(col("band"), col("key"), col("ci"), col("cj"))
    val a = bk
      .withColumn("ci", pmod(col("doc_id"), col("k")).cast("int"))
      .withColumn("cj", explode(sequence(col("ci"), col("k") - 1)))
      .select(col("doc_id").as("doc_a"), col("simhash").as("fp_a"),
        col("band"), col("key"), col("ci"), col("cj"))
      .repartition(para, joinKey: _*)
    val b = bk
      .withColumn("cj", pmod(col("doc_id"), col("k")).cast("int"))
      .withColumn("ci", explode(sequence(lit(0), col("cj"))))
      .select(col("doc_id").as("doc_b"), col("simhash").as("fp_b"),
        col("band"), col("key"), col("ci"), col("cj"))
      .repartition(para, joinKey: _*)
    // Both dedup decisions happen MAP-SIDE on the join output (fp_a and
    // fp_b are already in the row), so the pair stream needs no further
    // shuffle at all:
    //  - hamming filter: xor+popcount cuts the bucket² candidate fan-out
    //    to true near-dups;
    //  - first-matching-band emission: a hamming-0 pair matches all 4
    //    bands and would surface 4×; emitting only from the lowest
    //    matching band makes every pair unique BY CONSTRUCTION, deleting
    //    the dropDuplicates shuffle that previously re-keyed the whole
    //    (multi-band × pairs) stream. At sf1 that shuffle was ~2-4× the
    //    9.5M-pair result.
    val earlierBandMatches = (0 until 3).map { i =>
      // mirror the banding expression exactly so "matches in band i"
      // means "would have joined in band i"
      col("band") > i &&
        (shiftright(col("fp_a"), i * 8) % 256 === shiftright(col("fp_b"), i * 8) % 256)
    }.reduce(_ || _)
    // shuffle_hash: both sides are already co-partitioned on the full
    // join key by the explicit repartitions above, so a shuffled-hash
    // join reads them in place with ZERO further data movement. Without
    // the hint AQE converts to broadcast when one side looks small —
    // paying the a-side exchange AND a driver collect + re-broadcast on
    // top of it (measured in the r18 before-plan). The hint never
    // changes the pair set, only the algorithm.
    a.hint("shuffle_hash").join(b, Seq("band", "key", "ci", "cj"))
      // same-block groups see both orientations (dedup by id order);
      // cross-block groups see exactly one orientation (keep it even
      // when doc_a > doc_b — least/greatest below normalizes)
      .filter(col("ci") =!= col("cj") || col("doc_a") < col("doc_b"))
      .withColumn("hamming", TextHash.hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming && !earlierBandMatches)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("hamming"))
  }

  /** Order-sensitive rolling-hash document fingerprint (content identity
    * robust to whitespace normalization choices made upstream).
    */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextHash.rollingFingerprint(split(col(textCol), " ")).as("fingerprint"))

  /** Near-dup CLUSTERS from a candidate pair set — the step that turns
    * pairwise similarity into a dedup decision: connected components by
    * synchronous min-label propagation, `rounds` fixed iterations
    * (label(x) ← min(label(x), min over neighbors)), then cluster id =
    * component-min doc id and `is_canonical` marks the kept document.
    *
    * Each round takes the min over three label sources — own, neighbors',
    * and the label OF the current label (pointer jumping) — so r rounds
    * cover chains of length ~2^(r-1), not r: the log-diameter recipe of
    * the published hash-to-min / large-star CC algorithms. The default 4
    * rounds cover diameter-8 chains (plain propagation would need 8
    * sequential rounds); near-dup components are overwhelmingly small
    * (dup families, not webs), so this is headroom, not a limit.
    *
    * Determinism: rounds are synchronous (every term reads the PREVIOUS
    * round's labels), so the result is independent of execution order,
    * and a FIXED round count makes it bit-identical to the generated
    * DuckDB oracle even if a pathological chain has not fully converged
    * (both engines stop at the same state).
    *
    * Scale shape: edges ≪ corpus (LSH already pruned); each round is one
    * shuffle keyed by doc id over (id,label)+(edge,label)+(label,label)
    * unions; the pointer-jump join is labels-with-labels (tiny both
    * sides); lineage is truncated per round so the plan stays flat.
    */
  def nearDupClusters(pairs: DataFrame, rounds: Int = 4,
                      aCol: String = "doc_a", bCol: String = "doc_b",
                      assertConverged: Boolean = false): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .union(pairs.select(col(bCol).cast("long").as("x"), col(aCol).cast("long").as("y")))
      .pipe(graft.core.Checkpoints.stable)
    var labels = edges.select(col("x").as("id")).distinct()
      .withColumn("label", col("id"))
    for (_ <- 0 until rounds) labels = propagate(edges, labels)
    if (assertConverged) {
      // one probe round: if ANY label would still move, the fixed round
      // count silently split a connected component — fail loudly instead
      // of returning deterministic-but-wrong clusters (VERDICT r5 #2).
      val changed = changedCount(propagate(edges, labels))
      if (changed > 0) throw new IllegalStateException(
        s"nearDupClusters: $changed labels still moving after $rounds rounds — " +
          "a component exceeds the diameter this round count covers; " +
          "use nearDupClustersFixedPoint or raise `rounds`")
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster"),
      (col("id") === col("label")).as("is_canonical"))
  }

  /** Iterate-to-fixed-point form of [[nearDupClusters]]: identical
    * per-round arithmetic, but rounds continue until no label changes,
    * so arbitrarily deep components fully merge. Pointer jumping makes
    * covered diameter ~2^rounds, so even a 10^9-node path needs ~31
    * rounds; `maxRounds` is a runaway bound, not a semantic knob.
    * Each round is checkpointed (constant-depth lineage). The
    * convergence probe is FOLDED into the round: [[propagate]] carries
    * each id's previous label through the same shuffle, so "did anything
    * change" is a filter-count over the round's own checkpointed blocks
    * (no second join job), and the probe runs every 2 rounds — pointer
    * jumping overshoots convergence by at most one no-op round, the
    * labels at exit are identical either way. Nothing is collected to
    * the driver.
    *
    * Reach for this ONLY on genuinely unstructured edge sets (LSH band
    * pipelines — q55/q59): if edges are confined to a blocking key use
    * [[blockConfinedComponents]] (one shuffle), and if nodes span blocks
    * but edges don't, [[blockBridgedComponents]] (one shuffle + a
    * fixed-point over just the cross-block quotient) — see the decision
    * table on [[blockBridgedComponents]].
    */
  def nearDupClustersFixedPoint(pairs: DataFrame, maxRounds: Int = 40,
                                aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .union(pairs.select(col(bCol).cast("long").as("x"), col(aCol).cast("long").as("y")))
      .pipe(graft.core.Checkpoints.stable)
    var labels = edges.select(col("x").as("id")).distinct()
      .withColumn("label", col("id"))
      .pipe(graft.core.Checkpoints.stable)
    var round = 0
    var changed = 1L
    while (changed > 0) {
      if (round >= maxRounds) throw new IllegalStateException(
        s"nearDupClustersFixedPoint: not converged after $maxRounds rounds " +
          "(pointer jumping covers diameter ~2^rounds — this indicates a bug, " +
          "not a deep graph)")
      val next = propagate(edges, labels)
      round += 1
      // probe on even rounds (and at the runaway bound): at worst one
      // extra round runs on already-converged labels, a no-op that
      // changes nothing in the result
      if (round % 2 == 0 || round >= maxRounds) changed = changedCount(next)
      labels = next
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster"),
      (col("id") === col("label")).as("is_canonical"))
  }

  /** Connected components of an edge set whose edges are CONFINED to a
    * blocking key — e.g. SemDeDup's within-IVF-cluster pairs, where the
    * candidate join is keyed on the cluster so no edge can straddle two
    * blocks. That confinement makes the global fixed-point iteration
    * (O(rounds) shuffles + barriers) unnecessary: components can never
    * span blocks, so ONE shuffle on the block key + an in-task
    * union-find per block computes the exact same components.
    *
    * Task memory is O(distinct nodes in the block) longs (the union-find
    * parent map); edges STREAM through the group iterator — a block with
    * k(k+1)/2 decomposed pair-rows never materializes its edge list.
    * The block is the same bounded unit the pair join's block
    * decomposition already assumes, so any corpus the pair stage can
    * process, this stage can too.
    *
    * Output is bit-identical to [[nearDupClustersFixedPoint]] on the
    * same edges: union always links the larger root UNDER the smaller,
    * so every component's final root IS its min node id — the same
    * canonical rule as min-label propagation at convergence.
    */
  def blockConfinedComponents(pairs: DataFrame, blockCol: String,
                              aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    componentsPerBlock(pairs, blockCol, aCol, bCol)
      .select(col("doc_id"), col("root").as("cluster"),
        (col("doc_id") === col("root")).as("is_canonical"))

  /** [[blockConfinedComponents]] with the BLOCK retained on every output
    * row (`block`, `doc_id`, `root`) — for callers that must route the
    * labels back to block-local storage, e.g. [[SemanticIndex]]'s
    * per-cluster label partitions. Identical components and identical
    * min-id root rule; `blockConfinedComponents` is this plus a
    * projection.
    */
  def blockConfinedComponentsKeyed(pairs: DataFrame, blockCol: String,
                                   aCol: String = "doc_a",
                                   bCol: String = "doc_b"): DataFrame =
    componentsPerBlock(pairs, blockCol, aCol, bCol)

  private def componentsPerBlock(pairs: DataFrame, blockCol: String,
                                 aCol: String, bCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(blockCol).cast("long").as("_1"),
        col(aCol).cast("long").as("_2"), col(bCol).cast("long").as("_3"))
      .as[(Long, Long, Long)]
    // MAP-SIDE CONTRACTION (the two-level CC recipe): a τ-similarity
    // graph in the dense regime carries O(|cluster|²) edges (measured
    // 536 M at sf10), but connectivity per partition is captured by a
    // SPANNING set of ≤ one edge per distinct (block, node). Running
    // the same union-find per input partition first and emitting only
    // (node → partition-local root) collapses the block shuffle from
    // edge-count to node-count rows. ANY spanning subset yields the
    // same components, and the block-level pass still unions by min
    // root, so labels stay bit-identical to the uncontracted plan —
    // partition boundaries cannot affect the result.
    val contracted = edges.mapPartitions { it =>
      val byBlock = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.LongMap[Long]]
      def find(p: scala.collection.mutable.LongMap[Long], x0: Long): Long = {
        var x = x0
        while (p(x) != x) { p(x) = p(p(x)); x = p(x) }
        x
      }
      it.foreach { case (blk, a, b) =>
        val p = byBlock.getOrElseUpdate(blk, scala.collection.mutable.LongMap.empty[Long])
        if (!p.contains(a)) p(a) = a
        if (!p.contains(b)) p(b) = b
        val ra = find(p, a); val rb = find(p, b)
        if (ra < rb) p(rb) = ra else if (rb < ra) p(ra) = rb
      }
      byBlock.iterator.flatMap { case (blk, p) =>
        val ids = p.keysIterator.toArray
        ids.iterator.map(id => (blk, id, find(p, id)))
      }
    }
    contracted
      .groupByKey(_._1)
      .flatMapGroups { (blk, edges) =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var x = x0
          while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
          x
        }
        edges.foreach { case (_, a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          // union by min root: the root of a merged set is the smaller
          // of the two roots, so the min id is never linked under
          // anything and ends up the root of its whole component
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        // snapshot ids before the final finds: path compression mutates
        // the map, which must not race the keys iterator
        val ids = parent.keysIterator.toArray
        ids.iterator.map(id => (blk, id, find(id)))
      }
      .toDF("block", "doc_id", "root")
  }

  /** Connected components of a block-keyed edge set where every EDGE is
    * block-confined but a NODE may appear in several blocks — the
    * multi-probe SemDeDup shape (q96): each vector joins its nProbe
    * clusters and pairs are generated within a probe cluster, so the
    * pair join is still keyed on the cluster, yet components can span
    * clusters through shared vectors.
    *
    * Two phases. Phase 1 contracts all block-confined edges with
    * [[blockConfinedComponents]] (ONE shuffle, in-task union-find per
    * block) — a node in b blocks gets b local roots. Phase 2 builds the
    * QUOTIENT graph — edges linking each node's local roots — and
    * solves it with a bounded driver-side union-find when it is
    * broadcast-small (the common case: ≤ one link per multi-block
    * node), falling back to [[nearDupClustersFixedPoint]] past the
    * bound. Either way the connectivity iteration runs over cross-block
    * LINKS, not the full edge set — the same class of reduction the q95
    * one-shuffle plan got over global propagation. Feeding the full
    * edge set into the fixed-point is the scale anti-pattern this
    * replaces (VERDICT r13 What's-wrong #1).
    *
    * Bit-identical to [[nearDupClustersFixedPoint]] on the deduped
    * union of all edges: every local root is the min id of its local
    * component, the global min id m of a component is the min of every
    * local component containing it — hence itself a root and a quotient
    * node — and min-label over the quotient yields exactly m, so both
    * plans label every node with its component's min id.
    *
    * Which component finder to use (the decision table):
    *   - edges confined to a block, nodes too → [[blockConfinedComponents]]
    *     (one shuffle; q95);
    *   - edges confined, nodes span blocks → this (q96);
    *   - genuinely unstructured edge sets (LSH band pipelines, q55/q59)
    *     → [[nearDupClustersFixedPoint]].
    */
  def blockBridgedComponents(pairs: DataFrame, blockCol: String,
                             aCol: String = "doc_a", bCol: String = "doc_b",
                             bridgeCollectMax: Int = 1 << 22): DataFrame =
    bridgeLocalRoots(
      blockConfinedComponents(pairs, blockCol, aCol, bCol), "cluster",
      bridgeCollectMax)

  /** Phase 2 of [[blockBridgedComponents]] standalone: global components
    * from per-block LOCAL root labels (`doc_id`, `rootCol`) — for
    * callers that already hold the phase-1 output, e.g.
    * [[SemanticIndex]]'s PERSISTED per-cluster star labels, where the
    * local union-find ran incrementally at ingest time and only the
    * quotient solve remains at read time. Same output contract:
    * (doc_id, cluster = global min-id root, is_canonical).
    */
  def bridgeLocalRoots(local: DataFrame, rootCol: String = "cluster",
                       bridgeCollectMax: Int = 1 << 22): DataFrame = {
    val spark = local.sparkSession
    import spark.implicits._
    // per node: all its local roots, bridged to the node's min root —
    // a node in b blocks contributes b−1 quotient edges, so the quotient
    // graph is bounded by Σ(blocks per node − 1), tiny vs the edge set
    val rootsPerDoc = local.select(col("doc_id"), col(rootCol).as("cluster"))
      .groupBy(col("doc_id"))
      .agg(min(col("cluster")).as("r_lo"), collect_set(col("cluster")).as("roots"))
      .pipe(graft.core.Checkpoints.stable)
    val bridges = rootsPerDoc
      .select(col("r_lo"), explode(col("roots")).as("r"))
      .filter(col("r_lo") < col("r"))
    // broadcast-small fast path (the BloomJoin/SimilaritySearch pattern):
    // a cheap count() gates the driver solve — bridges hangs off the
    // CHECKPOINTED rootsPerDoc, so the count is a one-stage scan, and
    // past the bound the full quotient graph never reaches the driver
    // at all (the r14 probe paid the whole collect before discarding
    // it). Under the bound, collect as a primitive Dataset[(Long,Long)]
    // (specialized tuples, ~32 B/row ≈ 128 MB at the 4M default — not
    // boxed Rows), run the identical union-by-min-root rule, and ship
    // the labels back via parallelize + createDataset so a multi-million
    // -row result rides task data, not a LocalRelation embedded (and
    // re-serialized) inside every copy of the logical plan. Labels are
    // bit-identical to the distributed fixed-point either way; the win
    // is latency — the fixed-point pays O(rounds) scheduling barriers
    // even on a 10-edge quotient graph (measured 2.3 s at sf0.1).
    // the count gate and the collect are ONE action: take(max+1) pulls
    // at most the bound plus a witness row — a result within the bound
    // IS the full bridge set (same rows the former count+collect pair
    // fetched in two driver round-trips); one extra row proves overflow
    // and routes to the distributed fixed-point without the driver ever
    // holding the full quotient graph
    val probe: Array[(Long, Long)] =
      bridges.select(col("r_lo"), col("r")).as[(Long, Long)]
        .take(bridgeCollectMax + 1)
    val rootLabels =
      if (probe.length <= bridgeCollectMax) {
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var x = x0
          while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
          x
        }
        probe.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val labeled = parent.keysIterator.toArray.map(id => (id, find(id)))
        val slices = math.max(1, labeled.length / (1 << 20))
        spark.createDataset(spark.sparkContext.parallelize(labeled.toIndexedSeq, slices))
          .toDF("__root", "__glabel")
      } else
        nearDupClustersFixedPoint(bridges, aCol = "r_lo", bCol = "r")
          .select(col("doc_id").as("__root"), col("cluster").as("__glabel"))
    rootsPerDoc
      .join(rootLabels, col("r_lo") === col("__root"), "left")
      .select(col("doc_id"),
        coalesce(col("__glabel"), col("r_lo")).as("cluster"),
        (col("doc_id") === coalesce(col("__glabel"), col("r_lo"))).as("is_canonical"))
  }

  /** One synchronous min-label round: own label, neighbors' labels, and
    * the label of the current label (pointer jump) — all read from the
    * PREVIOUS round, so the result is execution-order independent.
    * Checkpointed: constant-depth lineage regardless of round count.
    *
    * Output carries `prev_label` (the id's label BEFORE this round)
    * through the same shuffle — the own-label branch contributes it
    * exactly once per id, the other two branches contribute null, and
    * `max` picks the one non-null — so convergence detection is a
    * filter over this round's checkpoint, not a join of two rounds.
    */
  private def propagate(edges: DataFrame, labels: DataFrame): DataFrame = {
    val nullPrev = lit(null).cast("long").as("prev_label")
    val viaNeighbor = edges
      .join(labels.select(col("id").as("y"), col("label")), Seq("y"))
      .select(col("x").as("id"), col("label"), nullPrev)
    // pointer jump: label(x) <- label(label(x)); every label is a node
    // id present in `labels`, so the join never drops rows
    val viaPointer = labels.as("a")
      .join(labels.select(col("id").as("lid"), col("label").as("plabel")).as("b"),
        col("a.label") === col("b.lid"))
      .select(col("a.id").as("id"), col("plabel").as("label"), nullPrev)
    labels.select(col("id"), col("label"), col("label").as("prev_label"))
      .union(viaNeighbor).union(viaPointer)
      .groupBy("id").agg(min("label").as("label"), max("prev_label").as("prev_label"))
      .pipe(graft.core.Checkpoints.stable)
  }

  /** Number of ids whose label moved in the [[propagate]] round that
    * produced `next` — a single-stage scan of its checkpointed blocks.
    */
  private def changedCount(next: DataFrame): Long =
    next.filter(col("label") =!= col("prev_label")).count()

  /** DuckDB: `rounds` synchronous min-label + pointer-jump iterations
    * over an `edges(doc_a, doc_b)` CTE — identical arithmetic to
    * [[nearDupClusters]] (same three label sources per round). Returns
    * the chained CTE text ending in a relation `lN(id, label)`.
    */
  def duckClusterCtes(rounds: Int): String = {
    val base =
      """edgesu AS MATERIALIZED (
        |  SELECT doc_a AS x, doc_b AS y FROM edges
        |  UNION ALL SELECT doc_b AS x, doc_a AS y FROM edges),
        |l0 AS MATERIALIZED (SELECT DISTINCT x AS id, x AS label FROM edgesu)""".stripMargin
    val iters = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT id, MIN(label) AS label FROM (
         |    SELECT id, label FROM l${i - 1}
         |    UNION ALL
         |    SELECT e.x AS id, l.label FROM edgesu e JOIN l${i - 1} l ON l.id = e.y
         |    UNION ALL
         |    SELECT a.id, b.label FROM l${i - 1} a JOIN l${i - 1} b ON b.id = a.label)
         |  GROUP BY id)""".stripMargin
    }
    (base +: iters).mkString(",\n")
  }
}
