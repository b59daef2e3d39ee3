package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or the
  * LLM-pipeline extension set), expressed as a declarative DataFrame
  * pipeline over the driver-provisioned parquet tables; `oracleSql`
  * carries the equivalent DuckDB SQL. Column names and numeric types are
  * aligned on both sides (exact decimal accumulation for aggregated
  * doubles) so the driver's hash compare is deterministic.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    Tables(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(Tables(spark, "/root/testdata/sf0.001", "lineitem"))

  // Deterministic constants shared by Spark pipelines and oracle SQL.
  private val Watermark = "1998-06-01 00:00:00"
  private val SchedulerNow = "2024-01-31 00:10:00"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => Relational.q1Agg(t(s, d)("lineitem"))),
    "q3_join" -> ((s, d) =>
      Relational.q3Join(t(s, d)("customer"), t(s, d)("orders"), t(s, d)("lineitem"))),
    "q5_broadcast_join" -> ((s, d) =>
      Relational.q5BroadcastJoin(t(s, d)("region"), t(s, d)("nation"), t(s, d)("customer"))),
    "p1_projection" -> ((s, d) => Relational.p1Projection(t(s, d)("customer"))),
    "p2_drop_rule" -> ((s, d) => Relational.p2DropRule(t(s, d)("orders"))),
    "p3_struct_flatten" -> ((s, d) => Relational.p3StructFlatten(t(s, d)("customer"))),
    "f1_where" -> ((s, d) => Relational.f1Where(t(s, d)("lineitem"))),
    "f2_watermark" -> ((s, d) => Relational.f2Watermark(t(s, d)("orders"), Watermark)),
    "f3_softdelete" -> ((s, d) => Relational.f3SoftDelete(t(s, d)("events"))),
    "f5_due_filter" -> ((s, d) => Relational.f5DueFilter(t(s, d)("events"), SchedulerNow)),
    "l1_limit" -> ((s, d) => Relational.l1Limit(t(s, d)("part"), 25)),
    "a1_count" -> ((s, d) => Relational.a1Count(t(s, d)("lineitem"))),
    "a2_max_watermark" -> ((s, d) => Relational.a2MaxWatermark(t(s, d)("events"))),
    "t1_csv_encode" -> ((s, d) => Relational.t1CsvEncode(t(s, d)("events"))),
    "t6_ts_format" -> ((s, d) => Relational.t6TsFormat(t(s, d)("orders"))),
    "w1_running_sum" -> ((s, d) => Relational.w1RunningSum(t(s, d)("events"))),
    "j1_merge_upsert" -> ((s, d) => mergeQuery(s, d)),
    "j2_anti_delete" -> ((s, d) => antiDeleteQuery(s, d)),
    "j4_dedup_lastwins" -> ((s, d) => dedupLastWinsQuery(s, d)),
    "c1_incremental_2step" -> ((s, d) => incremental2StepQuery(s, d)),
    "c2_zero_delta" -> ((s, d) => zeroDeltaQuery(s, d)),
  )

  // ---- CDC merge pipelines (base/delta derived deterministically from
  // ---- `orders` so the DuckDB oracle can reconstruct them).

  private val OrderCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate")

  private def baseSnapshot(s: SparkSession, d: String): DataFrame =
    t(s, d)("orders").filter(col("o_orderkey") % 4 =!= 0)
      .select(OrderCols.map(col): _*)

  /** A delta batch: updated price, advanced CDC timestamp, soft-delete
    * flag on every 20th key.
    */
  private def deltaBatch(s: SparkSession, d: String, everyN: Int,
      priceFactor: Double, plusDays: Int): DataFrame =
    t(s, d)("orders").filter(col("o_orderkey") % everyN === 0)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        (col("o_totalprice") * priceFactor).as("o_totalprice"),
        (col("o_orderdate") + expr(s"INTERVAL $plusDays DAY")).as("o_orderdate"),
        (col("o_orderkey") % 20 === 0).as("is_deleted"))

  private def mergeQuery(s: SparkSession, d: String): DataFrame =
    MergeOps.merge(baseSnapshot(s, d), deltaBatch(s, d, 2, 1.1, 1),
        "o_orderkey", "o_orderdate", Some("is_deleted"))
      .orderBy("o_orderkey")

  private def antiDeleteQuery(s: SparkSession, d: String): DataFrame = {
    val deletes = t(s, d)("orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey").as("del_key"))
    baseSnapshot(s, d)
      .join(deletes, col("o_orderkey") === col("del_key"), "left_anti")
      .orderBy("o_orderkey")
  }

  private def dedupLastWinsQuery(s: SparkSession, d: String): DataFrame =
    MergeOps.dedupLastWins(t(s, d)("events"), "user_id", "ts", Seq("event_id"))
      .select("user_id", "event_id", "event_type", "ts")
      .orderBy("user_id")

  private def incremental2StepQuery(s: SparkSession, d: String): DataFrame = {
    val base = baseSnapshot(s, d)
    val m1 = MergeOps.merge(base, deltaBatch(s, d, 2, 1.05, 1).drop("is_deleted"),
      "o_orderkey", "o_orderdate")
    MergeOps.merge(m1, deltaBatch(s, d, 3, 1.1, 2).drop("is_deleted"),
        "o_orderkey", "o_orderdate")
      .orderBy("o_orderkey")
  }

  private def zeroDeltaQuery(s: SparkSession, d: String): DataFrame =
    MergeOps.mergeIfNonEmpty(
        baseSnapshot(s, d),
        deltaBatch(s, d, 2, 1.1, 1).filter(lit(false)),
        "o_orderkey", "o_orderdate", Some("is_deleted"))
      .orderBy("o_orderkey")

  // ---- DuckDB oracles -------------------------------------------------

  private val BaseCte =
    """base AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM orders WHERE o_orderkey % 4 <> 0
      |)""".stripMargin

  private def deltaCte(name: String, everyN: Int, priceFactor: Double,
      plusDays: Int): String =
    s"""$name AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus,
       |         o_totalprice * $priceFactor AS o_totalprice,
       |         o_orderdate + INTERVAL $plusDays DAY AS o_orderdate,
       |         (o_orderkey % 20 = 0) AS is_deleted
       |  FROM orders WHERE o_orderkey % $everyN = 0
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
    "q5_broadcast_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "p1_projection" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",
    "p2_drop_rule" ->
      """SELECT 'ord-' || o_orderkey AS durable_id, o_custkey, o_orderstatus
        |FROM orders ORDER BY durable_id""".stripMargin,
    "p3_struct_flatten" ->
      """SELECT c_custkey, c_name AS profile_name, c_nationkey AS profile_nation,
        |  c_mktsegment AS profile_segment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f1_where" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f2_watermark" ->
      s"""SELECT o_orderkey, o_orderdate, o_totalprice
         |FROM orders WHERE o_orderdate > TIMESTAMP '$Watermark'
         |ORDER BY o_orderkey""".stripMargin,
    "f3_softdelete" ->
      """SELECT event_id, user_id, event_type
        |FROM events WHERE NOT (event_type = 'error')
        |ORDER BY event_id""".stripMargin,
    "f5_due_filter" ->
      s"""SELECT user_id, MAX(ts) AS last_refresh,
         |  CAST(user_id % 60 + 1 AS INTEGER) AS refresh_minutes
         |FROM events
         |GROUP BY user_id
         |HAVING MAX(ts) + (user_id % 60 + 1) * INTERVAL 1 MINUTE < TIMESTAMP '$SchedulerNow'
         |ORDER BY user_id""".stripMargin,
    "l1_limit" ->
      "SELECT * FROM part ORDER BY p_partkey LIMIT 25",
    "a1_count" ->
      "SELECT COUNT(*) AS total_size FROM lineitem",
    "a2_max_watermark" ->
      "SELECT MAX(ts) AS syncuntil, COUNT(*) AS n_landed FROM events",
    "t1_csv_encode" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'purchase' THEN 't' ELSE 'f' END AS bool_enc,
        |  REPLACE(props, ' ', '') AS clean_props,
        |  COALESCE(props, '') AS null_enc
        |FROM events ORDER BY event_id""".stripMargin,
    "t6_ts_format" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "w1_running_sum" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "j1_merge_upsert" ->
      s"""WITH $BaseCte, ${deltaCte("delta", 2, 1.1, 1)}
         |SELECT coalesce(d.o_orderkey, b.o_orderkey) AS o_orderkey,
         |  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_custkey ELSE b.o_custkey END AS o_custkey,
         |  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
         |  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
         |  CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderdate ELSE b.o_orderdate END AS o_orderdate
         |FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
         |WHERE NOT coalesce(d.is_deleted, false)
         |ORDER BY o_orderkey""".stripMargin,
    "j2_anti_delete" ->
      s"""WITH $BaseCte
         |SELECT * FROM base
         |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 20 = 0)
         |ORDER BY o_orderkey""".stripMargin,
    "j4_dedup_lastwins" ->
      """SELECT user_id, event_id, event_type, ts FROM (
        |  SELECT user_id, event_id, event_type, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "c1_incremental_2step" ->
      s"""WITH $BaseCte,
         |${deltaCte("d1", 2, 1.05, 1)},
         |${deltaCte("d2", 3, 1.1, 2)},
         |unioned AS (
         |  SELECT *, 0 AS pri FROM base
         |  UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, 1 AS pri FROM d1
         |  UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, 2 AS pri FROM d2
         |)
         |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY pri DESC) AS rn
         |  FROM unioned
         |) WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "c2_zero_delta" ->
      s"""WITH $BaseCte
         |SELECT * FROM base ORDER BY o_orderkey""".stripMargin,
  )
}
