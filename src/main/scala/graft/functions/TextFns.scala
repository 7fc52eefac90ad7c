package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash Column builders.
  *
  * Everything here is codegen'd built-ins (`split`, `md5`, `conv`,
  * `transform`) — no UDFs — so the hot path stays inside whole-stage
  * codegen. The hash pipeline is deliberately reproducible in plain SQL
  * (md5 → first 8 hex digits → int) so DuckDB oracles can mirror it
  * bit-for-bit; `HashingScheme` centralizes the MinHash/SimHash constants
  * so the Spark plans and the generated oracle SQL share one source.
  */
object TextFns {
  /** whitespace tokens */
  def tokens(text: Column): Column = split(text, " ")

  /** Stable 32-bit content hash as a non-negative long:
    * value of the first 8 hex digits of md5. Equals DuckDB
    * `('0x' || substr(md5(x), 1, 8))::BIGINT`. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** w-gram shingles over a token-array column (w consecutive tokens
    * joined by a space). Built in-row with `transform` — no shuffle.
    * CASE guard: sequence(1, 0) in Spark is the DESCENDING [1, 0]. */
  def shingles(toksCol: String, w: Int): Column =
    expr(s"CASE WHEN size($toksCol) >= $w THEN " +
      s"transform(sequence(1, size($toksCol) - ${w - 1}), " +
      s"i -> array_join(slice($toksCol, i, $w), ' ')) ELSE array() END")
}

/** MinHash / SimHash parameterization shared by Spark plans and the
  * generated DuckDB oracle SQL. Universal hashing h_i(x) = (a_i·x + b_i)
  * mod p over the Mersenne prime 2^31−1: with x < 2^31 and a_i < 2^31
  * the product stays < 2^62 — no int64 overflow on either engine. */
/** Embedding-LSH production parameters — ONE definition shared by the
  * GraftOps core defaults, the implicit syntax, and the Dedup operator
  * whose DuckDB oracle inlines the corresponding hyperplanes. Retune
  * here and every caller (and the generated oracle) moves together. */
object EmbLsh {
  val Tables = 16
  val Bits = 4
  val Dims = 64

  /** Bits to use at a given corpus size: expected per-table candidate
    * pairs ≈ N²/2^bits (uniform buckets), so holding candidate volume
    * ≈ 2^budgetLog2 · N per table means bits ≈ log₂N − budgetLog2,
    * floored at the oracle-verified default. budgetLog2 = 8 (256
    * candidates/doc/table) suits recall-first sweeps; 6 is the tighter
    * near-dup setting (high thresholds tolerate narrower buckets, and
    * recall is recovered by raising `Tables`: 1-(1-p^bits)^tables). */
  def suggestedBits(corpusSize: Long, budgetLog2: Int = 8): Int = {
    require(corpusSize > 0, s"corpus size must be positive, got $corpusSize")
    // exact ceil-log2: the float log ratio lands above the integer at
    // powers of two (log2(2^29) evaluates to 29.000000000000004) and
    // ceil would then charge an extra bit, halving per-table recall
    val ceilLog2 =
      if (corpusSize <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(corpusSize - 1)
    math.max(Bits, ceilLog2 - budgetLog2)
  }

  /** Per-bucket row count past which the embedding-LSH pair join takes
    * the salted path (r15): the adaptive-bits rule bounds AVERAGE
    * occupancy, but a dup-heavy corpus concentrates whole near-dup
    * families into single buckets — at the sf10 decade the mm feature
    * space put one bucket's f²/2 enumeration on one task and OOM'd the
    * witness run before any filter could reject a pair. Salting splits
    * a hot bucket's enumeration across [[SaltWays]] tasks; the pair
    * SET is identical (GraftOps.bucketPairs), so the oracles are
    * untouched. 4096 rows ≈ 8M enumerated pairs per task — well past
    * every measured bench-SF bucket (worst observed occupancy ≤ ~1.2k
    * at sf0.1-sf1), so bench plans take slot 0 (the plain join) and
    * timings are unchanged; the decade scales spread. */
  val SaltHotBucket = 4096L
  val SaltWays = 8
}

object HashingScheme {
  val P: Long = 2147483647L // 2^31 - 1
  val NumHashes = 16
  // 8 bands × 2 rows: candidate s-curve threshold (1/8)^(1/2) ≈ 0.35,
  // so pairs at the 0.5 Jaccard dedup cutoff are found with ~high
  // probability (4×4 banding put the knee at ≈0.71 — too blunt).
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands
  val SimHashBits = 32

  def a(i: Int): Long = { val v = ((i + 1) * 2654435761L) % P; if (v == 0) 1L else v }
  def b(i: Int): Long = ((i + 1) * 1013904223L) % P

  /** Spark-side: minhash_i of a 32-bit hash column (reduced mod p first). */
  def minhashExpr(hCol: String, i: Int): String =
    s"min((${a(i)}L * ($hCol % $P) + ${b(i)}L) % $P)"

  /** DuckDB-side: identical formula (BIGINT arithmetic). */
  def minhashSql(hSql: String, i: Int): String =
    s"min((${a(i)} * ($hSql % $P) + ${b(i)}) % $P)"
}
