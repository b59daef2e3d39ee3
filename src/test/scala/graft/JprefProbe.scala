package graft

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: where dedup_jaccard_prefix's wall time goes (not a
  * test). Decomposes DedupOps.ngramJaccardPrefix into its pipeline
  * stages and times each in isolation at sf0.1 — run2 of the r14
  * PlanProfile showed two ~31.5 CPU-s stages whose operator attribution
  * is ambiguous from the stage table alone.
  */
object JprefProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables(spark, d, "documents")
    val threshold = 0.7

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROBE $name%-28s min=${ts.map(_._1).min}%7.3f s  all=${ts.map(t => f"${t._1}%.2f").mkString(",")}  rows=${ts.head._2}")
    }

    // warm-up on the small sf (codegen/JIT)
    DedupOps.ngramJaccardPrefix(Tables(spark, "/root/testdata/sf0.001", "documents"), threshold).count()

    val sh = DedupOps.shingleRows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sh_materialize")(sh.count())

    val df = sh.groupBy("sh").agg(count(lit(1)).as("freq"))
    time("df_counts")(df.count())

    val prefixLen = (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int")
    val prefixes = sh.join(df, "sh")
      .groupBy("doc_id", "n")
      .agg(sort_array(collect_list(struct(col("freq"), col("sh")))).as("ordered"))
      .select(col("doc_id"), col("n"),
        explode(slice(col("ordered.sh"), lit(1), prefixLen)).as("sh"))
    time("prefix_build")(prefixes.count())

    val candidates = prefixes.groupBy("sh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(graft.functions.GraftFunctions.pair_explode(col("ds"))
        .as(Seq("a", "b")))
      .filter(col("b.n") * threshold <= col("a.n") &&
        col("a.n") * threshold <= col("b.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint(true)
    time("candidates_ckpt")(candidates.count())

    // verifyJaccard body inlined (it is private)
    val aIds = candidates.select(col("doc_a").as("doc_id")).distinct()
    val bIds = candidates.select(col("doc_b").as("doc_id")).distinct()
    val shA = sh.join(broadcast(aIds), Seq("doc_id"), "left_semi")
    val shB = sh.join(broadcast(bIds), Seq("doc_id"), "left_semi")
    time("shA_count")(shA.count())
    val j1 = candidates
      .join(shA.select(col("doc_id").as("doc_a"), col("n").as("na"), col("sh")), "doc_a")
    time("join1_witnesses")(j1.count())
    val j2 = j1
      .join(shB.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("sh")),
        Seq("doc_b", "sh"))
    time("join2_intersect")(j2.count())
    val ver = j2
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("i"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
    time("verify_full")(ver.count())

    // the array-shaped verify alternative (r13 note: faster for the
    // high-threshold prefix path): per-doc sorted shingle arrays +
    // one intersect per pair
    val arrs = sh.groupBy("doc_id", "n")
      .agg(sort_array(collect_list(col("sh"))).as("arr"))
      .localCheckpoint(true)
    time("arrs_ckpt")(arrs.count())
    val verArr = candidates
      .join(arrs.select(col("doc_id").as("doc_a"), col("n").as("na"), col("arr").as("aa")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("arr").as("ab")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        size(array_intersect(col("aa"), col("ab"))).as("i"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
    time("verify_by_arrays")(verArr.count())

    time("whole_operator")(DedupOps.ngramJaccardPrefix(docs, threshold).count())
    spark.stop()
  }
}
