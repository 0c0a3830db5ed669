package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches for corpus reporting — the
  * 100 TB answer to "how many distinct tokens/shingles/urls does this
  * slice hold" when the exact `docFrequency`-style groupBy would
  * shuffle the whole token stream to build a mostly-hapax table.
  *
  * HyperLogLog (Flajolet et al. 2007) with a twist that keeps the
  * oracle EXACT: the operator returns the REGISTERS — per-bucket
  * max leading-zero ranks, all integers derived from md5 bits — and
  * the float estimate is a reader-side helper ([[hllEstimate]]).
  * md5 is bit-identical in any engine, so DuckDB re-derives every
  * register from the raw text: bucket = the hash's first
  * `bucketHexDigits` hex digits, rank ρ = 1 + leading zero BITS of
  * the next 12 hex digits (computed by string arithmetic — strip
  * leading '0' hex digits, then a 4-way CASE on the first nonzero
  * digit — so no engine-specific bit intrinsics are involved).
  *
  * Scale shape: one narrow tokenize+hash pass, then ONE aggregate
  * keyed by (group, bucket) with map-side partial max — the exchange
  * carries at most `groups × 2^bits × partitions` rows of three
  * integers, CONSTANT in corpus size. Registers merge by per-bucket
  * max (spec-pinned: sketch(A) ⊔ sketch(B) == sketch(A ∪ B)
  * bit-for-bit), which is exactly how per-partition/per-day sketches
  * roll up on a real lake without touching the data again.
  *
  * Reference scope: the reference pipeline has no sketching; extends
  * the engine's reporting family per the build brief's training-data
  * mandate. */
object SketchOps {

  /** ρ for one md5 tail (12 hex digits = 48 bits): 1 + leading zero
    * bits, 49 when the tail is all-zero. Pure string arithmetic so
    * the DuckDB replay is verbatim. */
  private def rho(tailHex: Column): Column = {
    val stripped = ltrim(tailHex, "0")
    val zHexDigits = lit(12) - length(stripped)
    val firstDigit = conv(substring(stripped, 1, 1), 16, 10).cast("int")
    val lzInDigit = when(firstDigit >= 8, 0).when(firstDigit >= 4, 1)
      .when(firstDigit >= 2, 2).otherwise(3)
    when(length(stripped) === 0, lit(49))
      .otherwise((zHexDigits * 4 + lzInDigit + 1).cast("int"))
  }

  /** HLL registers over the distinct TOKENS of `docs(textCol)`, per
    * `groupCol`: one row per (group, bucket) with the max rank.
    * `bucketHexDigits` ∈ [1, 4] sets m = 16^digits buckets (3 →
    * m = 4096, standard error 1.04/√m ≈ 1.6%). Buckets with no
    * hashes are absent (their register is implicitly 0) — readers
    * must count absent buckets as zeros, which [[hllEstimate]]
    * does. */
  def hllTokenRegisters(docs: DataFrame, textCol: String,
      groupCol: String, bucketHexDigits: Int = 3): DataFrame = {
    require(bucketHexDigits >= 1 && bucketHexDigits <= 4,
      s"bucketHexDigits=$bucketHexDigits outside [1, 4]")
    val h = md5(col("token"))
    docs
      .select(coalesce(col(groupCol).cast("string"), lit(""))
        .as("group"), explode(TextOps.tokens(col(textCol))).as("token"))
      .select(col("group"),
        conv(substring(h, 1, bucketHexDigits), 16, 10).cast("long")
          .as("bucket"),
        rho(substring(h, bucketHexDigits + 1, 12)).as("r"))
      .groupBy("group", "bucket").agg(max(col("r")).as("max_rho"))
  }

  /** Merge register frames by per-bucket max — how per-partition /
    * per-day sketches roll up. Union-exact: merging sketches of A
    * and B yields the sketch of A ∪ B bit-for-bit. */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("group", "bucket")
      .agg(max(col("max_rho")).as("max_rho"))

  /** Count-min sketch cells over the token OCCURRENCES of
    * `docs(textCol)`, per `groupCol` (Cormode & Muthukrishnan 2005):
    * `rows` independent hash rows (row r's hash = md5("r:" + token)),
    * each mapping a token to one of 16^`colHexDigits` columns; a
    * cell's value is the exact total occurrence count of the tokens
    * landing in it. The cells are the oracle-checked OUTPUT (exact
    * integers from md5 bits — the [[hllTokenRegisters]] convention);
    * point estimates ([[cmEstimate]]: min over rows, a one-sided
    * overestimate within εN w.h.p.) stay reader-side. Cells merge by
    * SUM ([[mergeCells]]) — the additive counterpart to HLL's
    * max-merge, so per-day sketches roll up and deltas subtract.
    * One narrow pass + one (group, row, col)-keyed map-side-combined
    * aggregate; exchange ≤ groups·rows·16^digits·partitions cells,
    * constant in corpus size. */
  def cmTokenCells(docs: DataFrame, textCol: String, groupCol: String,
      rows: Int = 4, colHexDigits: Int = 3): DataFrame = {
    require(rows >= 1 && rows <= 16, s"rows=$rows outside [1, 16]")
    require(colHexDigits >= 1 && colHexDigits <= 4,
      s"colHexDigits=$colHexDigits outside [1, 4]")
    val occ = docs
      .select(coalesce(col(groupCol).cast("string"), lit(""))
        .as("group"), explode(TextOps.tokens(col(textCol))).as("token"))
      .select(col("group"), col("token"),
        explode(sequence(lit(0), lit(rows - 1))).as("row"))
    occ
      .select(col("group"), col("row"),
        conv(substring(md5(concat(col("row").cast("string"), lit(":"),
          col("token"))), 1, colHexDigits), 16, 10).cast("long")
          .as("col"))
      .groupBy("group", "row", "col")
      .agg(count(lit(1)).as("n"))
  }

  /** Merge cell frames by cell-wise sum — additive roll-up. */
  def mergeCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("group", "row", "col")
      .agg(sum(col("n")).as("n"))

  /** Reader-side point estimate for one group's cells: min over rows
    * of the token's cell (absent cell = 0). One-sided: always ≥ the
    * true count. Driver-side — deliberately NOT oracle-checked. */
  def cmEstimate(cells: Seq[(Int, Long, Long)], token: String,
      rows: Int = 4, colHexDigits: Int = 3): Long = {
    val byCell = cells.map { case (r, c, n) => (r, c) -> n }.toMap
    (0 until rows).map { r =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$token".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val c = java.lang.Long.parseLong(h.substring(0, colHexDigits), 16)
      byCell.getOrElse((r, c), 0L)
    }.min
  }

  /** Bloom-filter words over the DISTINCT values of `keyCol`
    * (Bloom 1970, under the register-exact convention): `hashes`
    * bit positions per key ([[bloomPositions]]) — packed 32 bits per
    * long word by a `bit_or(shiftleft(1, pos % 32))` aggregate keyed
    * on `pos div 32`. 32-bit (not 64-bit) packing is deliberate:
    * the DuckDB oracle replays the words with signed-BIGINT
    * `bit_or`/shift arithmetic, and `1 << 63` would flip the sign
    * bit — capping shifts at 31 keeps every word a small positive
    * integer in ANY engine's signed-64 semantics. Output (word_idx,
    * word): exact integers from md5 bits, so the oracle replays
    * every word verbatim; absent word_idx rows are implicitly zero.
    * Words merge by bitwise OR ([[mergeBloom]]) — union-exact, the
    * per-shard roll-up. One narrow pass + one aggregate whose
    * exchange is ≤ mBits/32 rows. */
  def bloomWords(keys: DataFrame, keyCol: String, mBits: Int = 1 << 18,
      hashes: Int = 4): DataFrame = {
    require(mBits >= 32 && mBits % 32 == 0, s"mBits=$mBits")
    require(hashes >= 1 && hashes <= 16, s"hashes=$hashes")
    val pos = bloomPositions(col(keyCol), mBits, hashes)
    keys
      .select(explode(array(pos: _*)).as("__pos"))
      .groupBy((col("__pos") / 32).cast("long").as("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("__pos"), lit(32)).cast("int"))).as("word"))
  }

  /** Merge Bloom word frames by bitwise OR — union-exact. */
  def mergeBloom(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("word_idx").agg(bit_or(col("word")).as("word"))

  /** The `hashes` bit positions of one key (long columns in
    * [0, mBits)), by Kirsch–Mitzenmacher double hashing ("Less
    * hashing, same performance", ESA 2006): pos_i = (h1 + i·h2) mod
    * m where h1/h2 are the first/second 8-hex-digit slices of ONE
    * md5 — the k independent seeded md5s this replaces were the
    * measured CPU bottleneck of the q148 pre-screen (~100M md5 ≈
    * 32 s at f100, BENCH_NOTES r17), and KM's positions preserve the
    * Bloom asymptotics. h2 is forced odd so the stride is a unit
    * mod the power-of-two m and one key's k positions never
    * collapse onto a single bit. h1 + i·h2 < 2^32·(1+i) stays far
    * inside signed-64, so the DuckDB replay is verbatim signed
    * arithmetic: `('0x'||substr(md5(k),1,8))::BIGINT` etc. Shared by
    * build and probe sides so the two can never drift. */
  private def bloomPositions(key: Column, mBits: Int, hashes: Int)
      : Seq[Column] = {
    val h = md5(key)
    val h1 = conv(substring(h, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(h, 9, 8), 16, 10).cast("long").bitwiseOR(1L)
    // relational form, used on the BUILD side only (the eval set is
    // tiny); all k positions sit in one unconditional array() so the
    // shared md5 is CSE-eligible. The corpus-scale PROBE side uses
    // [[graft.functions.BloomKernel]] instead — see
    // [[bloomMightContain]].
    (0 until hashes).map(i =>
      pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong)))
  }

  /** Membership-test column against a DRIVER-COLLECTED word table
    * (mBits/32 longs at 32 bits per word — e.g. 64 KB of long slots
    * at m = 2^18, a plan constant like the centroid tables; see
    * [[bloomWords]] for why 32-bit packing): true iff ALL `hashes`
    * bits are set. No
    * join — a pure narrow expression, which is the point: the
    * 100 TB corpus scan pays k array lookups per row instead of a
    * corpus↔eval exchange, and only the (tiny) survivor set reaches
    * the exact verification join. No false negatives by
    * construction; false positives are bounded by the standard
    * (1 − e^{−kn/m})^k and always caught by the exact stage. */
  def bloomMightContain(key: Column, words: Map[Long, Long],
      mBits: Int = 1 << 18, hashes: Int = 4): Column = {
    val arr = Array.tabulate(mBits / 32)(i => words.getOrElse(i.toLong, 0L))
    // the fused kernel, not a relational AND-of-probes: && evaluates
    // short-circuit, which makes every probe after the first a
    // CONDITIONAL subtree — ineligible for subexpression elimination,
    // so the shared md5 would re-evaluate per probe (measured 2x the
    // k-seeded-md5 cost it was meant to beat). The kernel digests
    // once per row and loops the k probes over the table as a plan
    // reference object; position arithmetic is [[bloomPositions]]
    // verbatim.
    graft.functions.BloomKernel.mightContain(key, arr, mBits, hashes)
  }

  /** Reader-side estimate from one group's registers (absent buckets
    * count as zeros): the standard HLL estimator with the
    * small-range (linear counting) correction. Driver-side Double —
    * deliberately NOT part of any oracle-checked output. */
  def hllEstimate(registers: Seq[(Long, Int)], bucketHexDigits: Int = 3)
      : Double = {
    val m = math.pow(16.0, bucketHexDigits).toInt
    val byBucket = registers.toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var b = 0L
    while (b < m) {
      val r = byBucket.getOrElse(b, 0)
      if (r == 0) zeros += 1
      sum += math.pow(2.0, -r)
      b += 1
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
