package graft

import graft.expr.gf
import graft.geo._
import graft.synth.SynthGeo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom Catalyst expressions must agree with the pure-Scala core on both
  * execution paths (interpreted + whole-stage codegen; fallback disabled in
  * TestSpark so codegen bugs fail loudly), and be callable from SQL. */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val pts = (0 until 200).map { i =>
    (-85.0 + 170.0 * Rng.uniform(2 * i), -179.9 + 359.8 * Rng.uniform(2 * i + 1))
  }.toDF("lat", "lon")

  test("grid_cell / s2_cell / tile_id match the scala core (codegen path)") {
    val rows = pts
      .withColumn("c7", gf.grid_cell($"lat", $"lon", 7))
      .withColumn("c11", gf.grid_cell($"lat", $"lon", 11))
      .withColumn("s2", gf.s2_cell($"lat", $"lon", 11))
      .withColumn("t", gf.tile_id($"lat", $"lon", 9))
      .collect()
    for (r <- rows) {
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert(r.getLong(2) == GridCell.encode(lat, lon, 7))
      assert(r.getLong(3) == GridCell.encode(lat, lon, 11))
      assert(r.getLong(4) == S2Cell.encode(lat, lon, 11))
      assert(r.getLong(5) == Tile.encode(lat, lon, 9))
    }
  }

  test("grid_parent and grid_kring") {
    val rows = pts
      .withColumn("c11", gf.grid_cell($"lat", $"lon", 11))
      .withColumn("p7", gf.grid_parent($"c11", 7))
      .withColumn("ring", gf.grid_kring(gf.grid_cell($"lat", $"lon", 7), 1))
      .collect()
    for (r <- rows) {
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert(r.getLong(3) == GridCell.encode(lat, lon, 7))
      assert(r.getSeq[Long](4).toArray.sameElements(GridCell.kRing(GridCell.encode(lat, lon, 7), 1)))
    }
  }

  test("st_contains matches Pip.contains for region polygons") {
    val region = "07"
    val rings = SynthGeo.regionPolygon(region)
    val ringsDf = Seq(rings.map(_.toSeq).toSeq).toDF("rings")
    val joined = pts.crossJoin(ringsDf)
      .withColumn("inside", gf.st_contains($"rings", $"lat", $"lon"))
      .collect()
    for (r <- joined) {
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert(r.getBoolean(3) == Pip.contains(rings, lon, lat), s"($lat,$lon)")
    }
  }

  test("tile_key / tile_parse round trip; haversine and dist2") {
    val rows = pts
      .withColumn("t", gf.tile_id($"lat", $"lon", 12))
      .withColumn("k", gf.tile_key($"t"))
      .withColumn("t2", gf.tile_parse($"k"))
      .withColumn("hv", gf.haversine_m($"lat", $"lon", lit(55.7558), lit(37.6173)))
      .withColumn("d2", gf.dist2_deg($"lat", $"lon", lit(55.7558), lit(37.6173)))
      .collect()
    for (r <- rows) {
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert(r.getLong(2) == r.getLong(4))
      assert(r.getString(3) == Tile.key(r.getLong(2)))
      assert(r.getDouble(5) == GeoMath.haversineM(lat, lon, 55.7558, 37.6173))
      assert(r.getDouble(6) == GeoMath.dist2Deg(lat, lon, 55.7558, 37.6173))
    }
  }

  test("geocode expressions: deterministic, inside region polygon, match SynthGeo") {
    val docs = Seq(("77", "ул. Ленина, д. 5"), ("05", "ул. Мира, д. 7"), ("25", "ул.新"),
      ("01", ""), ("78", "x")).toDF("region", "text")
    val rows = docs
      .withColumn("glat", gf.geocode_lat($"region", $"text"))
      .withColumn("glon", gf.geocode_lon($"region", $"text"))
      .collect()
    for (r <- rows) {
      val (region, text) = (r.getString(0), r.getString(1))
      val (lat, lon) = SynthGeo.geocode(region, text)
      assert(r.getDouble(2) == lat && r.getDouble(3) == lon)
      assert(Pip.contains(SynthGeo.regionPolygon(region), lon, lat),
        s"geocoded point for $region outside its polygon")
    }
  }

  test("text expressions match TextAlgos") {
    val docs = Seq("кот", "ул. Ленина, д.5", "hello world", "", "a b  c").toDF("t")
    val rows = docs.select($"t",
      gf.trigrams($"t"), gf.norm_keyword($"t"), gf.simhash64($"t"),
      gf.fingerprint64($"t"), gf.token_count($"t"), gf.bpe_count($"t"),
      gf.lang_id($"t"), gf.quality_score($"t"),
      gf.minhash_sig($"t", 3, 16), gf.lsh_bands(gf.minhash_sig($"t", 3, 16), 4)
    ).collect()
    for (r <- rows) {
      val t = r.getString(0)
      assert(r.getString(1) == TextAlgos.buildNgrams(t))
      assert(r.getString(2) == TextAlgos.clearKeyword(t))
      assert(r.getLong(3) == TextAlgos.simHash(t))
      assert(r.getLong(4) == TextAlgos.rollingFingerprint(t))
      assert(r.getInt(5) == TextAlgos.tokenCount(t))
      assert(r.getInt(6) == TextAlgos.bpeTokenEstimate(t))
      assert(r.getString(7) == TextAlgos.langId(t))
      assert(r.getDouble(8) == TextAlgos.qualityScore(t))
      assert(r.getSeq[Long](9).toArray.sameElements(TextAlgos.minHash(t, 3, 16)))
      assert(r.getSeq[Long](10).toArray.sameElements(TextAlgos.lshBands(TextAlgos.minHash(t, 3, 16), 4)))
    }
  }

  test("null propagation: null inputs yield null outputs") {
    val df = Seq((Some(10.0), Some(20.0)), (None, Some(20.0)), (Some(10.0), None))
      .toDF("lat", "lon")
      .withColumn("c", gf.grid_cell($"lat", $"lon", 7))
    val got = df.select($"c").collect().map(r => r.isNullAt(0))
    assert(got.toSeq == Seq(false, true, true))
  }

  test("SQL registration: every function callable from spark.sql") {
    val row = spark.sql(
      """SELECT grid_cell(55.7558d, 37.6173d, 7) c,
        |       grid_parent(grid_cell(55.7558d, 37.6173d, 11), 7) p,
        |       size(grid_kring(grid_cell(50d, 50d, 7), 1)) kr,
        |       s2_cell(55.7558d, 37.6173d, 11) s2,
        |       tile_key(tile_id(55.7558d, 37.6173d, 10)) tk,
        |       st_contains(array(array(0d,0d,10d,0d,10d,10d,0d,10d)), 5d, 5d) inq,
        |       trigrams('ab') tg,
        |       hamming64(simhash64('abc def'), simhash64('abc def')) hd,
        |       lang_id('привет мир') li,
        |       round(haversine_m(55.7558d, 37.6173d, 59.9343d, 30.3351d)) hv
        |""".stripMargin).collect()(0)
    assert(row.getAs[Long]("c") == GridCell.encode(55.7558, 37.6173, 7))
    assert(row.getAs[Long]("p") == GridCell.encode(55.7558, 37.6173, 7))
    assert(row.getAs[Int]("kr") == 9)
    assert(row.getAs[Long]("s2") == S2Cell.encode(55.7558, 37.6173, 11))
    assert(row.getAs[String]("tk") == "10/619/320")
    assert(row.getAs[Boolean]("inq"))
    assert(row.getAs[String]("tg") == "__a _ab ab_ b__")
    assert(row.getAs[Int]("hd") == 0)
    assert(row.getAs[String]("li") == "ru")
    assert(row.getAs[Double]("hv") == 633020.0)
  }

  test("ivf_probes matches a direct scala ranking (codegen path, reference-object centroids)") {
    val cents = Array(
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f),
      Array(0.7f, 0.7f, 0f))
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f, 0f)), (2L, Array(0f, 0.2f, 0.9f)), (3L, Array(0.6f, 0.6f, 0.1f)))
      .toDF("id", "v")
    val got = vecs.select($"id", gf.ivf_probes($"v", cents, 2).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    def rank(v: Array[Float]) = cents.indices
      .sortBy(i => (-graft.geo.VecAlgos.cosine(v, cents(i)), i)).take(2)
    assert(got(1L) == rank(Array(0.9f, 0.1f, 0f)))
    assert(got(2L) == rank(Array(0f, 0.2f, 0.9f)))
    assert(got(3L) == rank(Array(0.6f, 0.6f, 0.1f)))
  }

  test("whole-stage codegen stays enabled over the cell-encode pipeline") {
    val plan = spark.range(1000)
      .selectExpr("cast(id as double) / 10 - 40 as lat", "cast(id as double) / 5 - 100 as lon")
      .withColumn("c7", gf.grid_cell($"lat", $"lon", 7))
      .withColumn("t", gf.tile_id($"lat", $"lon", 9))
      .where($"c7" > 0)
      .queryExecution.executedPlan.toString
    // "*(1)" prefixes mark operators fused into WholeStageCodegen stage 1;
    // the custom expressions must not break the fusion (no fallback allowed
    // in TestSpark, so a doGenCode bug would have thrown already).
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in:\n$plan")
    assert(plan.contains("*(1) Filter"), s"expected codegen'd Filter in:\n$plan")
  }
}
