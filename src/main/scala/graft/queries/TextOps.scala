package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** LLM-data-pipeline text operators over `documents` (SURVEY §2.10 [EXT] /
  * BASELINE north star): exact dedup, token stats, quality scoring,
  * language-ID heuristic, shingling and n-gram Jaccard near-dup.
  *
  * Scale design: everything here is a scan + per-row array ops + hash agg
  * or an equi-join on a shingle/fingerprint key — no cross products, no
  * driver-side collects. The Jaccard pair search joins on shingle buckets
  * (candidate generation) before scoring, which is the same banding trick
  * MinHash-LSH uses, so the plan shape survives 100 TB.
  */
object TextOps {

  /** Exact dedup fingerprint (sha256 of text) + per-fingerprint counts. */
  val exactDedup: Q = Q(
    "q30_exact_dedup",
    """SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
      |FROM (SELECT doc_id, sha256(text) AS fp FROM documents)
      |GROUP BY fp
      |ORDER BY fp""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), sha2(col("text"), 256).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy("fp")
  }

  /** Token counting + vocabulary stats per document (whitespace tokens). */
  val tokenStats: Q = Q(
    "q31_token_stats",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_letters"))
      .orderBy("doc_id")
  }

  /** Quality scoring: stopword ratio, mean token length, type-token ratio —
    * the length/stopword heuristics of a training-data quality filter.
    * Ratios are exact-int divisions done in DOUBLE on both sides.
    */
  val qualityScore: Q = Q(
    "q32_quality_score",
    """WITH t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks,
      |         length(replace(text, ' ', '')) AS letters
      |  FROM documents)
      |SELECT source,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN len(list_filter(toks, x -> x IN ('a','the'))) * 1.0 / len(toks) > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_stopword_heavy,
      |  CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
      |  CAST(SUM(letters) AS BIGINT) AS total_letters
      |FROM t
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), toks.as("toks"),
        length(regexp_replace(col("text"), " ", "")).as("letters"))
      .withColumn("stop_ratio",
        size(filter(col("toks"), x => x.isin("a", "the"))) * lit(1.0) / size(col("toks")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("stop_ratio") > 0.1, 1).otherwise(0)).cast("long").as("n_stopword_heavy"),
        sum(size(col("toks"))).cast("long").as("total_tokens"),
        sum(col("letters")).cast("long").as("total_letters"))
      .orderBy("source")
  }

  /** Language-ID heuristic: score = fraction of tokens that are common
    * English function words; classify en/unknown. (Real n-gram LID lives in
    * graft.llm.LangId; this is its SQL-expressible core.)
    */
  val langId: Q = Q(
    "q33_lang_id",
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('a','the','of','and','to','in'))) * 1.0
      |      / len(string_split(text, ' ')) AS en_score
      |  FROM documents)
      |SELECT CASE WHEN en_score >= 0.02 THEN 'en' ELSE 'unknown' END AS predicted,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_actual_en
      |FROM scored
      |GROUP BY predicted
      |ORDER BY predicted""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        (size(filter(toks, x => x.isin("a", "the", "of", "and", "to", "in"))) * lit(1.0) /
          size(toks)).as("en_score"))
      .select(
        when(col("en_score") >= 0.02, "en").otherwise("unknown").as("predicted"),
        col("lang"))
      .groupBy(col("predicted"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang") === "en", 1).otherwise(0)).cast("long").as("n_actual_en"))
      .orderBy("predicted")
  }

  /** Word-3-gram shingle inventory per doc (the candidate-generation input
    * for near-dup detection). Distinct shingles per doc, global stats.
    */
  val shingleStats: Q = Q(
    "q34_shingle_stats",
    s"""WITH sh AS (
      |  SELECT doc_id, UNNEST(${graft.llm.TextHash.duckShingles(3)}) AS shingle
      |  FROM documents)
      |SELECT shingle, COUNT(*) AS df
      |FROM sh
      |GROUP BY shingle
      |HAVING COUNT(*) >= 5
      |ORDER BY shingle""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(graft.functions.ShingleStrings(col("text"), 3)).as("shingle"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 5)
      .orderBy("shingle")
  }

  /** Document-frequency cap for exact Jaccard candidate generation
    * (q35). A shingle shared by more than this many documents is
    * corpus-stopword-like: it contributes ~zero Jaccard signal (a pair
    * that is a real near-dup shares plenty of *rare* shingles too) but
    * quadratic pair fan-out — one shingle in 10^6 docs would make a
    * single task materialize a 10^6-element list and emit ~10^12 pairs.
    * Capping df bounds per-key work at MaxDf^2/2 pairs, which is what
    * makes exact pair enumeration survive a skewed 100 TB corpus.
    * The DuckDB oracle applies the identical predicate, so the query
    * stays hash-green at every sf.
    */
  val JaccardMaxDf = 64

  /** Exact n-gram Jaccard near-dup pairs: explode distinct shingles,
    * equi-join on shingle (banding-style candidate generation), score
    * |A∩B| / |A∪B|, threshold. This is the exact oracle that the MinHash
    * LSH pipeline (graft.llm.MinHashDedup) approximates.
    *
    * Hot-shingle safety: shingles with df > [[JaccardMaxDf]] are dropped
    * BEFORE any list is collected — the df pre-pass is a count-only hash
    * aggregate (map-side partial, constant state per key), so a
    * pathological shingle shared by every document costs one counter,
    * not a collected list. Intersections are then computed only over
    * surviving shingles (denominator stays the full set size; both
    * engines agree bit-for-bit).
    */
  val jaccardPairs: Q = Q(
    "q35_jaccard_pairs", {
      import graft.llm.TextHash
      s"""WITH sh AS MATERIALIZED (
         |  SELECT doc_id, UNNEST(${TextHash.duckShingleHashes(3)}) AS shingle
         |  FROM documents),
         |keep AS (SELECT shingle FROM sh GROUP BY shingle
         |         HAVING COUNT(*) BETWEEN 2 AND $JaccardMaxDf),
         |shk AS MATERIALIZED (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b,
         |  ROUND(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
         |FROM pairs
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.12
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, d) =>
    // One pass over the shingle-HASH table (8-byte shuffle keys, not
    // ~25-byte strings — both engines hash identically so results are
    // equal): group by hash collecting doc lists, emit all in-list
    // ordered pairs, count per pair. Shuffles the exploded table ONCE
    // instead of a two-sided self-join (the scale-relevant difference).
    // fanOut: the shingle kernel dominates this query (measured 1.63 s
    // in ONE task at sf0.1 — the single-row-group file scans as one
    // split); at scale the scan already has >= cores splits and fanOut
    // is the identity
    val docs = graft.core.Scans.fanOut(Tables.documents(s, d))
    val sh = docs
      .select(col("doc_id"),
        explode(graft.functions.ShingleHash64(col("text"), 3)).as("shingle"))
    // |shingle set| = array size (the kernel already dedups): map-only,
    // instead of re-running the kernel + an explode + a groupBy shuffle
    val sizes = docs
      .select(col("doc_id"),
        size(graft.functions.ShingleHash64(col("text"), 3)).cast("long").as("n"))
    // Hot-shingle safety folded INTO the collect: [[BoundedLongSet]]
    // caps the buffer at MaxDf values and finishes overflowing groups
    // EMPTY, so the former count-only pre-pass + semi-join (a second
    // corpus-wide shuffle of the exploded table) is gone while the
    // pathological-key guarantee is identical — a shingle in 10^6 docs
    // costs a 64-slot buffer and a boolean, never a collected list.
    // The size filter keeps exactly df ∈ [2, MaxDf] (df=1 shingles
    // produce no pairs; the oracle's HAVING applies the same band).
    val bset = graft.functions.BoundedLongSet.udaf(JaccardMaxDf)
    // The pair EXPLOSION is quadratic in list size while the per-shingle
    // doc lists are byte-tiny, so AQE's byte-based coalescing would
    // funnel the CPU-heavy explode into ~4 tasks (measured 859 ms at
    // sf0.1). Round-robin repartition of the AGGREGATED lists — after
    // the partial+final collect, so map-side aggregation is preserved —
    // spreads the quadratic work evenly; the count is the session's
    // initial shuffle-partition count (harness-scaled with input bytes),
    // not a local constant. Pairs come from a double explode with a
    // value filter (ids are a distinct set, so doc_a < doc_b keeps each
    // unordered pair exactly once) — whole-stage-codegen generators
    // instead of the interpreted nested transform/slice/struct builder.
    val shufP = s.conf.get("spark.sql.shuffle.partitions").toInt
    val pairs = sh
      .groupBy(col("shingle")).agg(bset(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, JaccardMaxDf))
      .repartition(shufP)
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter") * lit(1.0) /
      (col("sa.n") + col("sb.n") - col("inter"))
    // No broadcast hint on `sizes`: it is one row PER DOCUMENT, so at a
    // 10^9-doc corpus a forced broadcast materializes a multi-GB table on
    // the driver and every executor. A plain shuffle join on doc_id is
    // always safe, and AQE still picks broadcast when the table is
    // actually small (as at bench scale).
    pairs
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(jac >= 0.12)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** PII scrubbing (the redaction pass a corpus runs before training):
    * count and redact email addresses and IPv4 literals. Patterns are
    * deliberately RE2-and-Java-compatible so Spark and DuckDB agree
    * byte-for-byte (verified by the scrubbed-text hash).
    *
    * Scale shape: map-only per-row regex; no shuffle except the final
    * presentation sort.
    */
  val piiScrub: Q = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    Q(
      "q61_pii_scrub",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ips,
         |  sha256(regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
         |                        '$ip', '<IP>', 'g')) AS scrub_sha
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(text, '$email', 0)")).cast("long").as("n_emails"),
          size(expr(s"regexp_extract_all(text, '$ip', 0)")).cast("long").as("n_ips"),
          sha2(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            ip, "<IP>"), 256).as("scrub_sha"))
        .orderBy("doc_id")
    }
  }

  /** Sliding-window document chunking (context-window prep): tokens cut
    * into `chunkSize`-token windows advancing by `chunkSize − overlap`,
    * each chunk identified by its token count and content hash. Chunk
    * arithmetic is pure integers; the content hash pins the exact slice
    * boundaries cross-engine.
    *
    * Scale shape: per-row explode of ~n/step chunk indices — map-only
    * fan-out; text leaves the row only as per-chunk hashes.
    */
  val chunking: Q = {
    val chunkSize = 64; val overlap = 16; val step = chunkSize - overlap
    Q(
      "q62_chunking",
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents WHERE doc_id < 500),
         |c AS (
         |  SELECT doc_id,
         |    UNNEST(generate_series(0,
         |      CAST(GREATEST((len(toks) - $overlap + $step - 1) // $step, 1) AS INT) - 1))
         |      AS chunk_idx,
         |    toks
         |  FROM t)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(len(toks[chunk_idx * $step + 1 : chunk_idx * $step + $chunkSize]) AS BIGINT)
         |    AS n_chunk_tokens,
         |  ${graft.llm.TextHash.duckMd5Long(
                s"array_to_string(toks[chunk_idx * $step + 1 : chunk_idx * $step + $chunkSize], ' ')")}
         |    AS chunk_hash
         |FROM c
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      val nChunks = greatest(
        floor((size(toks) - lit(overlap) + lit(step - 1)) / lit(step)).cast("int"), lit(1))
      Tables.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), toks.as("toks"),
          explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          slice(col("toks"), col("chunk_idx") * step + 1, lit(chunkSize)).as("chunk"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).cast("long").as("n_chunk_tokens"),
          graft.llm.TextHash.md5Long(concat_ws(" ", col("chunk"))).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    }
  }

  val all: Seq[Q] = Seq(
    exactDedup, tokenStats, qualityScore, langId, shingleStats, jaccardPairs,
    piiScrub, chunking)
}

/** Shared shingling helpers (column-level, codegen-friendly built-ins). */
object TextShingles {
  import org.apache.spark.sql.Column

  /** Distinct word n-gram shingles of a text column, as array<string>.
    * Pure built-ins (split/sequence/transform/element_at) — stays inside
    * whole-stage codegen; no UDF.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    // Spark sequence(1, 0) counts DOWN, unlike DuckDB generate_series —
    // guard short docs with an explicit empty array.
    when(size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }
}
