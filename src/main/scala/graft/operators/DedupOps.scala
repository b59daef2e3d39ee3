package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Near-duplicate detection for training-data pipelines: MinHash+LSH,
  * SimHash, and exact n-gram Jaccard. Built entirely from codegen'd
  * built-in functions (md5 as the cross-engine hash primitive).
  *
  * Scale posture (the whole point of LSH): candidate generation is a
  * self-equi-join on band keys — rows shuffle once on the band hash,
  * and only documents sharing a band collide, so the join never goes
  * quadratic. Exact pairwise verification runs only on that candidate
  * set. At 100 TB the shingle explode is a narrow map; the band join is
  * the single shuffle; skewed bands (boilerplate docs) are handled by
  * AQE skew-join splitting.
  */
object DedupOps {

  /** doc_id + distinct word-trigram shingles of the tokenized text,
    * persisted: every consumer (signatures, sizes, intersection) reuses
    * one materialization instead of re-running the tokenize+explode —
    * the same materialize-the-CTE choice a columnar engine makes.
    */
  private def shingles(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), TextOps.toksCol.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(ws) - 3)," +
          " i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))"))).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the minimum md5 over the document's shingle set (md5 keeps Spark
    * and any SQL oracle bit-identical; a production deployment would
    * swap in xxhash64 for speed — same topology).
    */
  def minhashSignatures(documents: DataFrame, numHashes: Int): DataFrame =
    shingles(documents)
      .select(col("doc_id"), col("sh"),
        explode(expr(s"sequence(0, ${numHashes - 1})")).as("seed"))
      .select(col("doc_id"), col("seed"),
        md5(concat(col("seed").cast("string"), lit(":"), col("sh"))).as("h"))
      .groupBy("doc_id", "seed")
      .agg(min(col("h")).as("minhash"))

  /** MinHash+LSH near-dup pairs: band the signature (rowsPerBand
    * consecutive minhashes per band key), bucket-join on (band, key),
    * then verify candidates with exact shingle Jaccard >= threshold.
    * Output: (doc_a, doc_b, jaccard).
    */
  def minhashLsh(documents: DataFrame, numHashes: Int = 16,
      rowsPerBand: Int = 2, threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(documents, numHashes)
    val bands = sigs
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy("doc_id", "band")
      // within a band, order by seed so the key concat is deterministic
      .agg(md5(concat_ws("|", sort_array(collect_list(
        concat(lpad(col("seed").cast("string"), 4, "0"), lit("="), col("minhash"))))))
        .as("band_key"))
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(documents, candidates, threshold)
  }

  /** Exact word-trigram Jaccard over a candidate pair set. */
  private def verifyJaccard(documents: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame = {
    val sh = shingles(documents)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard all-pairs via sparse shared-shingle join
    * (docs sharing zero shingles never meet — the join IS the blocking;
    * background sharing is what limits scale, which is why minhashLsh
    * is the 100 TB path).
    */
  def ngramJaccard(documents: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles(documents)
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash (32-bit here; 64-bit in production — 32 keeps the value
    * inside an exactly-representable SQL BIGINT for oracle parity):
    * per distinct token, a 32-bit hash from the md5 hex prefix; each
    * bit contributes +1/-1; signature bit b set iff the sum is
    * positive. Narrow map + one groupBy(doc) shuffle.
    */
  def simhash(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(array_distinct(TextOps.toksCol)).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      .select(col("doc_id"), col("h"),
        explode(expr("sequence(0, 31)")).as("b"))
      .withColumn("contrib",
        when(expr("shiftright(h, b) & 1") === 1, 1).otherwise(-1))
      .groupBy("doc_id", "b")
      .agg(sum(col("contrib")).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, b)")).otherwise(0L))
        .as("simhash"))
      .orderBy("doc_id")

  /** SimHash near-dup pairs: 4 bands of 8 bits as LSH keys — any pair
    * within Hamming distance 3 differs in at most 3 bands, so at least
    * one band matches (pigeonhole): banding is EXACT for distance<=3,
    * not probabilistic. Verification = bit_count(xor) on candidates.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(documents)
    val bands = sig.select(col("doc_id"), col("simhash"),
      explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("band_key", expr("shiftright(simhash, band * 8) & 255"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
