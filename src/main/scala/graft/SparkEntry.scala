package graft

import graft.expr.gf
import graft.operators.{DocPipeline, KnnJoin, SpatialJoin}
import graft.sources.DocStore
import graft.synth.DataGen
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Driver contract (SURVEY.md §7): the flagship query, one `queries` entry per
 * implemented operator, and DuckDB-runnable oracle SQL for every
 * SQL-expressible entry.
 *
 * Oracle-parity discipline: any floating-point math whose result reaches a
 * hash-compared column uses only IEEE exact-rounded ops (+,-,*,/,sqrt) or is
 * rounded; transcendentals get a boundary guard. Geospatial queries derive
 * lat/lon from integer ids by pure arithmetic so DuckDB reproduces inputs
 * bit-for-bit; engine-only geometry (PIP) is covered by rows-only checks here
 * and by the winding-number/brute-force oracles in the ScalaTest suites.
 */
object SparkEntry {

  /** Flagship: region document counts via the two-phase PIP spatial join on
    * the interleaved synthetic doc table at sf 0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val p = DocStore.ensure(spark, 0.001)
    DocPipeline.regionDocCounts(
      DocStore.readDf(spark, p),
      DataGen.regionPolys(spark).toDF())
  }

  // ---------------------------------------------------------------- helpers

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** sf encoded in the test-data dir name ("/root/testdata/sf0.01"). */
  def sfOf(dir: String): Double =
    "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)

  /** Deterministic synthetic coordinates from an integer id — pure integer
    * arithmetic + one exact division, so Spark and DuckDB agree bit-for-bit. */
  private def derivedLat(id: Column): Column = (id * 7919L % 168000L) / 1000.0 - 84.0
  private def derivedLon(id: Column): Column = (id * 104729L % 358000L) / 1000.0 - 179.0

  private def derivedLatSql(id: String) = s"((($id * 7919) % 168000) / 1000.0) - 84.0"
  private def derivedLonSql(id: String) = s"((($id * 104729) % 358000) / 1000.0) - 179.0"

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- relational battery over the driver test data (oracle-checked) --

    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    "q_join_segment_revenue" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    "q_semi_anti_orders" -> ((s, dir) => {
      // customers with at least one order (semi) and none (anti), counted
      val orders = t(s, dir, "orders").select(col("o_custkey"))
      val customer = t(s, dir, "customer")
      val withOrders = customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      val withoutOrders = customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      withOrders.select(lit("with_orders").as("bucket"), col("c_custkey"))
        .unionByName(withoutOrders.select(lit("no_orders").as("bucket"), col("c_custkey")))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    }),

    "q_window_user_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"))
    }),

    "q_topk_parts_per_brand" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("rn"))
    }),

    // -- geospatial battery (oracle-checked via arithmetic-exact derivations) --

    "q_cell_encode" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("lat", derivedLat(col("event_id")))
        .withColumn("lon", derivedLon(col("event_id")))
        .withColumn("cell", gf.grid_cell(col("lat"), col("lon"), 7))
        .select(gf.cell_x(col("cell")).as("cx"), gf.cell_y(col("cell")).as("cy"))
        .groupBy(col("cx"), col("cy"))
        .agg(count(lit(1)).as("n"))
    }),

    "q_tile_assign" -> ((s, dir) => {
      val z = 8
      val n = 1 << z
      val df = t(s, dir, "events")
        .withColumn("lat", derivedLat(col("event_id")))
        .withColumn("lon", derivedLon(col("event_id")))
        .withColumn("tyraw",
          (lit(1.0) - log(tan(radians(col("lat"))) + lit(1.0) / cos(radians(col("lat")))) / lit(math.Pi))
            / 2.0 * n)
        // guard band: drop points within 1e-9 of a tile boundary so libm ulp
        // differences between JVM and DuckDB cannot flip the floor
        .where(least(col("tyraw") - floor(col("tyraw")), lit(1.0) - (col("tyraw") - floor(col("tyraw")))) > 1e-9)
        .withColumn("tile", gf.tile_id(col("lat"), col("lon"), z))
      df.select(
          shiftrightunsigned(col("tile"), 29).bitwiseAND(lit(0x1FFFFFFFL)).cast("int").as("tx"),
          col("tile").bitwiseAND(lit(0x1FFFFFFFL)).cast("int").as("ty"))
        .groupBy(col("tx"), col("ty"))
        .agg(count(lit(1)).as("n"))
    }),

    "q_knn" -> ((s, dir) => {
      val queries = t(s, dir, "customer").select(
        col("c_custkey").as("qid"),
        derivedLat(col("c_custkey")).as("lat"),
        derivedLon(col("c_custkey")).as("lon"))
      val targets = t(s, dir, "supplier").select(
        col("s_suppkey").as("tid"),
        derivedLat(col("s_suppkey") * 13L).as("lat"),
        derivedLon(col("s_suppkey") * 13L).as("lon"))
      // certified grid-accelerated kNN — must equal the brute-force oracle
      KnnJoin.knnJoin(queries, targets, k = 3, res = 5, ringSteps = Seq(1, 4))
        .select(col("qid"), col("tid"), col("rn"))
    }),

    "q_haversine_bucket" -> ((s, dir) => {
      // distance-to-Moscow histogram in 500 km buckets; bucket boundary guard
      t(s, dir, "events")
        .withColumn("lat", derivedLat(col("event_id")))
        .withColumn("lon", derivedLon(col("event_id")))
        .withColumn("km", gf.haversine_m(col("lat"), col("lon"), lit(55.7558), lit(37.6173)) / 1000.0)
        .where(abs(col("km") / 500.0 - floor(col("km") / 500.0) - 0.5) < lit(0.5 - 1e-9))
        .groupBy(floor(col("km") / 500.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
    }),

    // -- interleaved-document engine queries (synthetic world; rows-only) --

    "q_region_doc_counts" -> ((s, dir) => {
      val p = DocStore.ensure(s, sfOf(dir))
      DocPipeline.regionDocCounts(DocStore.readDf(s, p), DataGen.regionPolys(s).toDF())
    }),

    "q_media_tile_consistency" -> ((s, dir) => {
      val p = DocStore.ensure(s, sfOf(dir))
      DocPipeline.mediaConsistency(DocStore.readDf(s, p))
        .groupBy(col("region"), col("consistent"))
        .agg(count(lit(1)).as("n"))
    }),

    "q_span_roundtrip" -> ((s, dir) => {
      val p = DocStore.ensure(s, sfOf(dir))
      val docs = DocStore.readDf(s, p)
      val rebuilt = DocPipeline.reassemble(DocPipeline.explodeSpans(docs))
      docs.select(col("doc_id"), col("spans").as("orig"), col("region"))
        .join(rebuilt.select(col("doc_id"), col("spans").as("round")), "doc_id")
        .groupBy(col("region"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("orig") === col("round"), 1L).otherwise(0L)).as("n_roundtrip_ok"))
    }),

    // -- reference-conformance layer (deterministic fingerprints; rows-only) --

    "q_dump_fingerprints" -> ((s, dir) => {
      import s.implicits._
      val fixture = graft.synth.GarGen.df(s, "ADDR_OBJ", "01", 100).cache()
      val rows = graft.sinks.Dump.dialects.toSeq.sortBy(_._1).map { case (name, d) =>
        val text = graft.sinks.Dump.formatSlice(fixture, "ADDR_OBJ", d, batchSize = 7)
        (name, text.length.toLong,
          java.lang.Long.toHexString(graft.geo.TextAlgos.fnv1a64(text)))
      }
      rows.toDF("dialect", "n_chars", "fnv64")
    }),

    "q_ddl_fingerprints" -> ((s, dir) => {
      import s.implicits._
      val rows = Seq(graft.sinks.Ddl.MySql, graft.sinks.Ddl.Postgres, graft.sinks.Ddl.ClickHouse)
        .map { d =>
          val text = graft.sinks.Ddl.createAll(d)
          (d.name, graft.model.SchemaRegistry.knownTables.size.toLong, text.length.toLong,
            java.lang.Long.toHexString(graft.geo.TextAlgos.fnv1a64(text)))
        }
      rows.toDF("dialect", "n_tables", "n_chars", "fnv64")
    }),

    "q_knn_addresses" -> ((s, dir) => {
      // kNN of document anchors against the address-point table (synth world)
      val p = DocStore.ensure(s, sfOf(dir))
      val anchors = DocPipeline.docAnchors(DocStore.readDf(s, p))
        .select(col("doc_id").as("qid"), col("lat"), col("lon"))
      val addrs = DataGen.addrPoints(s, sfOf(dir)).toDF()
        .select(col("addr_id").as("tid"), col("lat"), col("lon"))
      KnnJoin.knnJoin(anchors, addrs, k = 3, res = 8)
        .groupBy(col("rn")).agg(count(lit(1)).as("n"))
    })
  )

  // ---------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] = Map(

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_segment_revenue" ->
      """SELECT c_mktsegment,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_semi_anti_orders" ->
      """SELECT bucket, count(*) AS n FROM (
        |  SELECT 'with_orders' AS bucket, c_custkey FROM customer
        |   WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'no_orders' AS bucket, c_custkey FROM customer
        |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |) GROUP BY bucket""".stripMargin,

    "q_window_user_latest" ->
      """SELECT event_type, count(*) AS n_users FROM (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 GROUP BY event_type""".stripMargin,

    "q_topk_parts_per_brand" ->
      """SELECT p_brand, p_partkey, rn FROM (
        |  SELECT p_brand, p_partkey,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part
        |) WHERE rn <= 3""".stripMargin,

    "q_cell_encode" ->
      s"""SELECT CAST(floor(((lon + 180.0) / 360.0) * 128) AS INT) AS cx,
         |  CAST(floor(((lat + 90.0) / 180.0) * 128) AS INT) AS cy,
         |  count(*) AS n
         |FROM (SELECT ${derivedLatSql("event_id")} AS lat,
         |             ${derivedLonSql("event_id")} AS lon FROM events)
         |GROUP BY cx, cy""".stripMargin,

    "q_tile_assign" ->
      s"""WITH pts AS (
         |  SELECT ${derivedLatSql("event_id")} AS lat,
         |         ${derivedLonSql("event_id")} AS lon FROM events),
         |raw AS (
         |  SELECT lat, lon,
         |    ((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0) * 256 AS tyraw
         |  FROM pts)
         |SELECT CAST(floor(((lon + 180.0) / 360.0) * 256) AS INT) AS tx,
         |  CAST(floor(tyraw) AS INT) AS ty, count(*) AS n
         |FROM raw
         |WHERE least(tyraw - floor(tyraw), 1.0 - (tyraw - floor(tyraw))) > 0.000000001
         |GROUP BY tx, ty""".stripMargin,

    "q_knn" ->
      s"""WITH q AS (SELECT c_custkey AS qid,
         |    ${derivedLatSql("c_custkey")} AS lat, ${derivedLonSql("c_custkey")} AS lon
         |  FROM customer),
         |t AS (SELECT s_suppkey AS tid,
         |    ${derivedLatSql("(s_suppkey * 13)")} AS lat, ${derivedLonSql("(s_suppkey * 13)")} AS lon
         |  FROM supplier),
         |d AS (SELECT q.qid, t.tid,
         |    (q.lat - t.lat) * (q.lat - t.lat) + (q.lon - t.lon) * (q.lon - t.lon) AS dist2
         |  FROM q CROSS JOIN t),
         |r AS (SELECT qid, tid,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist2, tid) AS rn FROM d)
         |SELECT qid, tid, rn FROM r WHERE rn <= 3""".stripMargin,

    "q_haversine_bucket" ->
      s"""WITH pts AS (
         |  SELECT ${derivedLatSql("event_id")} AS lat,
         |         ${derivedLonSql("event_id")} AS lon FROM events),
         |d AS (SELECT 2.0 * 6371000.0 * asin(least(1.0, sqrt(
         |    sin(radians(55.7558 - lat) / 2) * sin(radians(55.7558 - lat) / 2) +
         |    cos(radians(lat)) * cos(radians(55.7558)) *
         |    sin(radians(37.6173 - lon) / 2) * sin(radians(37.6173 - lon) / 2)))) / 1000.0 AS km
         |  FROM pts)
         |SELECT CAST(floor(km / 500.0) AS BIGINT) AS bucket, count(*) AS n
         |FROM d
         |WHERE abs(km / 500.0 - floor(km / 500.0) - 0.5) < 0.499999999
         |GROUP BY bucket""".stripMargin
  )
}
