package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing for the LLM dedup operators.
  *
  * Everything is built on md5 — the one hash both Spark and DuckDB
  * implement identically — so every signature here is verifiable against
  * a DuckDB oracle bit-for-bit (Spark `hash()` is Murmur3-with-seed,
  * DuckDB `hash()` is its own thing; neither matches the other).
  *
  * All arithmetic stays below 2^62: hashes are reduced mod P = 1e9+7
  * (< 2^30) before the affine `(a*h + b) mod P` step, so products fit a
  * signed 64-bit lane in both engines.
  */
object TextHash {
  /** Prime modulus for MinHash permutations (fits 30 bits). */
  val P: Long = 1000000007L

  /** Deterministic per-permutation affine constants (odd multiplier). */
  def aConst(i: Int): Long = ((i.toLong * 2654435761L) % P) | 1L
  def bConst(i: Int): Long = (i.toLong * 40503L * 65537L + 17L) % P

  /** First 15 md5 hex chars as a positive long (60 bits). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** First 8 md5 hex chars as a positive long (32 bits) — token hash for
    * SimHash bit voting.
    */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Shingle array → full 60-bit md5 hash array, computed ONCE — the
    * signature perms below reuse it, so md5 cost is O(|shingles|), not
    * O(|shingles| × numPerms). The 60-bit value is ALSO the set element
    * for exact-Jaccard verification, so it must NOT be reduced mod P
    * here (a 2^30 universe would make corpus-wide hash-join candidate
    * generation collision-prone; 2^60 keeps expected collisions ≈ 0
    * even at 10^8 distinct shingles). P-reduction happens only inside
    * the minhash affine step, which needs products to fit 63 bits.
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => md5Long(s))

  /** MinHash signature from pre-hashed (60-bit) shingles: for
    * permutation i, min over hashes of (a_i * (h mod P) + b_i) mod P.
    * Pure built-ins (transform + array_min) — no UDF.
    */
  def minhashFromHashes(hashes: Column, numPerms: Int): Column =
    array((0 until numPerms).map { i =>
      array_min(transform(hashes, h =>
        (lit(aConst(i)) * (h % P) + lit(bConst(i))) % P))
    }: _*)

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`,
    * each group rendered "v1_v2_..." — equal band key ⇒ LSH candidate.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("_",
        (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** Token array → md5-derived 32-bit hash array (compute ONCE — the 32
    * bit votes below reuse it, so md5 cost is O(|tokens|), not
    * O(32·|tokens|)).
    */
  def tokenHashes(tokens: Column): Column = transform(tokens, t => md5Int(t))

  /** 32-bit SimHash from pre-hashed tokens: bit j is set iff the sum
    * over tokens of ±1 votes (sign of bit j) is positive.
    */
  def simhash32FromHashes(hashes: Column): Column = {
    val votes = (0 until 32).map { j =>
      aggregate(hashes, lit(0L), (acc, h) =>
        acc + (shiftright(h, j) % 2) * 2 - 1)
    }
    (0 until 32).map(j => when(votes(j) > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
  }

  /** 32-bit SimHash of a token array (hash-once form — callers that can
    * should project [[tokenHashes]] separately, see Dedup.simhash).
    */
  def simhash32(tokens: Column): Column = simhash32FromHashes(tokenHashes(tokens))

  /** Hamming distance between two long fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling polynomial fingerprint of a token array:
    * fold h -> (h*31 + md5(token) mod P) mod P. Order-sensitive (it's a
    * document fingerprint, not a set signature).
    */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => (acc * 31L + md5Long(t) % P) % P)

  // ---- DuckDB oracle fragments (same constants, same arithmetic) ----

  /** DuckDB: md5-based 60-bit hash of an expression. */
  def duckMd5Long(e: String): String =
    s"('0x' || substr(md5($e),1,15))::BIGINT"

  def duckMd5Int(e: String): String =
    s"('0x' || substr(md5($e),1,8))::BIGINT"

  /** DuckDB: word n-gram shingle list of `text` (same tokenization as
    * TextShingles.wordShingles) — the ONE copy every oracle shares.
    */
  def duckShingles(n: Int, textExpr: String = "text"): String = {
    val toks = s"string_split($textExpr,' ')"
    val gram = (0 until n).map(k => s"$toks[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(generate_series(1, len($toks) - ${n - 1}), i -> $gram))"
  }

  /** DuckDB: distinct 60-bit shingle-hash list — parity with
    * `array_distinct(shingleHashes(wordShingles(text, n)))`.
    */
  def duckShingleHashes(n: Int, textExpr: String = "text"): String =
    s"list_distinct(list_transform(${duckShingles(n, textExpr)}, s -> ${duckMd5Long("s")}))"

  /** DuckDB: minhash signature from a pre-hashed 60-bit BIGINT list,
    * same perms and P-reduction as [[minhashFromHashes]].
    */
  def duckMinhashFromHashes(hashesExpr: String, numPerms: Int): String =
    "[" + (0 until numPerms).map { i =>
      s"list_min(list_transform($hashesExpr, h -> (${aConst(i)} * (h % $P) + ${bConst(i)}) % $P))"
    }.mkString(", ") + "]"

  /** DuckDB: band keys for a signature list column named `sigCol`. */
  def duckBandKeys(sigCol: String, bands: Int, rowsPerBand: Int): String =
    "[" + (0 until bands).map { b =>
      (0 until rowsPerBand).map(r => s"$sigCol[${b * rowsPerBand + r + 1}]::VARCHAR")
        .mkString("concat_ws('_', ", ", ", ")")
    }.mkString(", ") + "]"

  /** DuckDB: 32-bit simhash over a token-list expression. */
  def duckSimhash32(toksExpr: String): String =
    (0 until 32).map { j =>
      s"(CASE WHEN list_aggregate(list_transform($toksExpr, t -> ((${duckMd5Int("t")} >> $j) % 2) * 2 - 1), 'sum') > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
