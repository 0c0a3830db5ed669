package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-scale deduplication operators.
  *
  * Four tiers, in increasing recall / cost:
  *  1. exact (fingerprint group-by) — one shuffle on a 128-bit hash;
  *  2. n-gram Jaccard — shingle-bucket join, exact similarity on
  *     candidates only;
  *  3. MinHash + LSH — banding turns near-dup search into an equi-join
  *     on band keys: at 100 TB the only shuffle is on (band, key),
  *     candidate verification stays per-pair;
  *  4. SimHash — constant-size signature, hamming-ball lookup.
  *
  * All hashing is md5-derived (see [[TextOps.seededHash32]]) so
  * signatures are engine-portable and deterministic across runs —
  * no JVM hash seeds, no RNG state.
  */
object DedupOps {

  /** Exact duplicate groups by normalized fingerprint: one row per
    * duplicated fingerprint with the canonical (min) doc id. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))
      .filter(col("n_docs") > 1)

  /** Candidate pairs sharing at least one k-shingle, with exact Jaccard
    * similarity over distinct shingle sets. Returns (id_a, id_b,
    * n_shared, n_a, n_b, jaccard) with id_a < id_b.
    *
    * Scale: the join key is the shingle string; frequency-capped via
    * `maxShingleFreq` to drop degenerate buckets (stopword shingles)
    * exactly like production near-dup pipelines cap posting lists.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minJaccard: Double, maxShingleFreq: Long = 1000L)
      : DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
        explode(array_distinct(TextOps.shingles(col(textCol), k)))
          .as("shingle"))
    val capped = sh.withColumn("__freq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("shingle")))
      .filter(col("__freq") <= maxShingleFreq).drop("__freq")
    val sizes = sh.groupBy("id").agg(countDistinct("shingle").as("n_sh"))
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("n_shared").cast("double")
          / (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash signatures in relational form: explode distinct shingles,
    * hash each row under all n seeds (independent columns, one md5
    * pass each), min-aggregate per doc. Scales as a single shuffle on
    * the doc id with map-side partial mins — unlike a per-row
    * higher-order-function signature, whose repeated array traversals
    * interpret (not codegen) and re-hash per seed. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, n: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextOps.shingles(col(textCol), k)))
        .as("shingle"))
    val hashed = sh.select(col("id") +:
      (0 until n).map(i =>
        TextOps.seededHash32(col("shingle"), i).as(s"h$i")): _*)
    hashed.groupBy("id").agg(
      min(col("h0")).as("h0"),
      (1 until n).map(i => min(col(s"h$i")).as(s"h$i")): _*)
  }

  /** MinHash/LSH candidate pairs: docs sharing >= 1 of `bands` band
    * keys (signature length = bands*rows). Returns (id_a, id_b,
    * n_shared_bands). The band-key equi-join is the only shuffle
    * touching pairs; band keys are md5 of the joined band values. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String,
      textCol: String, k: Int, bands: Int, rows: Int): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, k, bands * rows)
    val banded = sig.select(col("id"), explode(array(
        (0 until bands).map { b =>
          struct(lit(b).as("band"),
            md5(concat_ws(",", (0 until rows).map(r =>
              col(s"h${b * rows + r}").cast("string")): _*)).as("key"))
        }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Estimated MinHash Jaccard for given pairs: fraction of equal
    * signature positions. `pairs` must have id_a/id_b columns. */
  def minhashEstimate(pairs: DataFrame, sigs: DataFrame): DataFrame =
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") / size(col("sig_a")))

  /** SimHash near-dup pairs within a hamming radius, bucketed by the
    * high byte to avoid the full cross join (docs differing only in
    * low bits land in the same bucket; radius <= 8 of 16 bits keeps
    * recall reasonable for the 16-bit demo; the 64-bit production
    * variant uses 4 rotated bucket keys). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      TextOps.simhash16(col(textCol)).as("sh"))
    val bucketed = sh.withColumn("bucket", shiftright(col("sh"), 8))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        TextOps.hammingDistance(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
