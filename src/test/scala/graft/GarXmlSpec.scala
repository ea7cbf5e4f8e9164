package graft

import graft.model.SchemaRegistry
import graft.sinks.Dump
import graft.sources.GarXml
import graft.synth.GarGen
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

class GarXmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeFixtureTree(root: String): Unit = {
    // common table at root + region dirs, AS_{T}_2... naming (common.py:47-60)
    val ht = GarGen.rows("HOUSE_TYPES", "00", 7)
    Files.write(Paths.get(root, "AS_HOUSE_TYPES_20210101.xml"),
      GarXml.toXml(ht, SchemaRegistry.schemaOf("HOUSE_TYPES"), "HOUSETYPES", "HOUSETYPE")
        .getBytes(StandardCharsets.UTF_8))
    for (r <- Seq("01", "77")) {
      Files.createDirectories(Paths.get(root, r))
      val rows = GarGen.rows("ADDR_OBJ", r, 9)
      Files.write(Paths.get(root, r, s"AS_ADDR_OBJ_20210101.xml"),
        GarXml.toXml(rows, SchemaRegistry.schemaOf("ADDR_OBJ"), "ADDRESSOBJECTS", "OBJECT")
          .getBytes(StandardCharsets.UTF_8))
    }
    // a non-numeric dir that must NOT be discovered as a region
    Files.createDirectories(Paths.get(root, "extra"))
  }

  test("xml round trip: fixture rows -> XML -> streamed scan -> identical rows") {
    val root = Files.createTempDirectory("gar_xml").toString
    writeFixtureTree(root)

    assert(GarXml.discoverRegions(root) == Seq("01", "77"))

    val common = GarXml.read(spark, root, "HOUSE_TYPES")
    val gotCommon = common.orderBy("ord").drop("region", "ord").collect().toSeq
    assert(gotCommon == GarGen.rows("HOUSE_TYPES", "00", 7))

    val regionDf = GarXml.read(spark, root, "ADDR_OBJ", Seq("01", "77"))
    assert(regionDf.count() == 18)
    val got01 = regionDf.where("region = '01'").orderBy("ord")
      .drop("region", "ord").collect().toSeq
    assert(got01 == GarGen.rows("ADDR_OBJ", "01", 9))
  }

  test("split ingest: chunked byte-range scan == whole-file StAX scan") {
    val root = Files.createTempDirectory("gar_split").toString
    writeFixtureTree(root)
    val whole = GarXml.read(spark, root, "ADDR_OBJ", Seq("01", "77"))
      .orderBy("region", "ord").collect().toSeq
    // tiny chunk size forces many splits with element-boundary resync; the
    // result must be identical rows AND identical ord (document order)
    for (chunk <- Seq(97L, 512L, 1999L)) {
      val split = GarXml.read(spark, root, "ADDR_OBJ", Seq("01", "77"), chunkBytes = chunk)
        .orderBy("region", "ord").collect().toSeq
      assert(split == whole, s"chunkBytes=$chunk diverged")
    }
    assert(whole.size == 18)
  }

  test("split ingest: ord reconstructs exact document order per file") {
    val root = Files.createTempDirectory("gar_ord").toString
    writeFixtureTree(root)
    val got = GarXml.read(spark, root, "ADDR_OBJ", Seq("77"), chunkBytes = 128)
      .orderBy("ord").drop("region", "ord").collect().toSeq
    assert(got == GarGen.rows("ADDR_OBJ", "77", 9))
  }

  test("xml scan preserves document order and handles escaped attribute values") {
    import scala.jdk.CollectionConverters._
    val schema = SchemaRegistry.schemaOf("HOUSE_TYPES")
    val tricky = Seq(org.apache.spark.sql.Row(
      1, "ИФНС \"ФЛ\"\\", "a\tb", "<&>", java.sql.Date.valueOf("2021-01-01"),
      java.sql.Date.valueOf("2021-01-01"), java.sql.Date.valueOf("2079-06-06"), true))
    val xml = GarXml.toXml(tricky, schema, "HOUSETYPES", "HOUSETYPE")
    val in = new java.io.ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8))
    val parsed = GarXml.parseStream(in, schema, "HOUSETYPE").toSeq
    assert(parsed == tricky)
    // and through the dump formatter, escapes match reference behaviour:
    // ...NAME="ИФНС &quot;ФЛ&quot;\" -> "ИФНС \"ФЛ\"\\" (dump.py:121-123)
    val df = spark.createDataFrame(parsed.asJava, schema)
    val sql = Dump.formatSlice(df, "HOUSE_TYPES", Dump.mysql)
    assert(sql.contains("\"ИФНС \\\"ФЛ\\\"\\\\\""))
  }

  test("split scanner handles XML the renderer never emits: quote styles, spacing, newlines") {
    // hand-authored XML: single-quoted attributes, double quotes inside
    // single quotes, whitespace/newlines around '=', entities, an element
    // with children-style close — the scanner must agree with StAX on all
    val schema = SchemaRegistry.schemaOf("HOUSE_TYPES")
    val xml =
      "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n" +
        "<HOUSETYPES>\n" +
        "  <HOUSETYPE ID = '1' NAME='say \"hi\"' SHORTNAME = \"a&apos;b\"\n" +
        "       UPDATEDATE='2021-01-01' STARTDATE='2021-01-01' ENDDATE='2079-06-06' ISACTIVE='true' />\n" +
        "  <HOUSETYPE ID=\"2\" NAME=\"&#1057;&#1077;&#1083;&#1086; &amp; co\" UPDATEDATE=\"2021-01-02\"\n" +
        "       STARTDATE=\"2021-01-02\" ENDDATE=\"2079-06-06\" ISACTIVE=\"false\"></HOUSETYPE>\n" +
        "</HOUSETYPES>\n"
    val bytes = xml.getBytes(StandardCharsets.UTF_8)
    val viaStax = GarXml.parseStream(
      new java.io.ByteArrayInputStream(bytes), schema, "HOUSETYPE").toSeq
    // write to a file and read through the chunked scanner at tiny chunks
    val root = Files.createTempDirectory("gar_nasty").toString
    Files.write(Paths.get(root, "AS_HOUSE_TYPES_2_nasty.xml"), bytes)
    val spark2 = spark
    for (chunk <- Seq(31L, 64L, 1 << 20)) {
      val viaScan = GarXml.read(spark2, root, "HOUSE_TYPES", chunkBytes = chunk)
        .orderBy("ord").drop("region", "ord").collect().toSeq
      assert(viaScan == viaStax, s"chunkBytes=$chunk diverged from StAX")
    }
    assert(viaStax.size == 2)
    assert(viaStax.head.getString(1) == "say \"hi\"")
    assert(viaStax.head.getString(2) == "a'b")
    assert(viaStax(1).getString(1) == "Село & co")
  }

  test("scanner skips comments / CDATA / DOCTYPE: no phantom rows from '<TAG' text inside them") {
    val schema = SchemaRegistry.schemaOf("HOUSE_TYPES")
    // fake elements hidden in a comment, a CDATA section (with the tricky
    // "]]]>" overlap), and a DOCTYPE; the two real rows must be the only ones
    val xml =
      "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n" +
        "<!DOCTYPE HOUSETYPES SYSTEM \"housetypes <HOUSETYPE fake>\">\n" +
        "<HOUSETYPES>\n" +
        "  <!-- <HOUSETYPE ID=\"99\" NAME=\"phantom\" UPDATEDATE=\"2021-01-01\" " +
        "STARTDATE=\"2021-01-01\" ENDDATE=\"2079-06-06\" ISACTIVE=\"true\"/> -->\n" +
        "  <HOUSETYPE ID=\"1\" NAME=\"real\" UPDATEDATE=\"2021-01-01\" " +
        "STARTDATE=\"2021-01-01\" ENDDATE=\"2079-06-06\" ISACTIVE=\"true\" />\n" +
        "  <DESCRIPTION><![CDATA[x]]<HOUSETYPE ID=\"98\" NAME=\"phantom2\"/>]]]></DESCRIPTION>\n" +
        "  <!----><HOUSETYPE ID=\"2\" NAME=\"real2\" UPDATEDATE=\"2021-01-02\" " +
        "STARTDATE=\"2021-01-02\" ENDDATE=\"2079-06-06\" ISACTIVE=\"false\"></HOUSETYPE>\n" +
        "</HOUSETYPES>\n"
    val bytes = xml.getBytes(StandardCharsets.UTF_8)
    val root = Files.createTempDirectory("gar_comments").toString
    Files.write(Paths.get(root, "AS_HOUSE_TYPES_2_c.xml"), bytes)
    // whole-file scan (chunk >= file) is fully comment/CDATA-safe
    val got = GarXml.read(spark, root, "HOUSE_TYPES", chunkBytes = 1 << 20)
      .orderBy("ord").collect()
    assert(got.length == 2, got.toSeq)
    assert(got.map(_.getAs[Int]("ID")).toSeq == Seq(1, 2))
    assert(got.map(_.getAs[String]("NAME")).toSeq == Seq("real", "real2"))
  }

  test("discovery errors: zero or multiple matches") {
    val root = Files.createTempDirectory("gar_glob").toString
    intercept[java.io.FileNotFoundException] {
      GarXml.discoverFile(root, "HOUSES", "xml")
    }
    Files.write(Paths.get(root, "AS_HOUSES_20210101.xml"), "<x/>".getBytes)
    Files.write(Paths.get(root, "AS_HOUSES_20210202.XML"), "<x/>".getBytes)
    // ambiguity is a DISTINCT exception from not-found, so the V2 source's
    // registry fallback can't swallow it (only genuinely-missing falls back)
    intercept[IllegalStateException] {
      GarXml.discoverFile(root, "HOUSES", "xml") // >1 match, case-insensitive ext
    }
  }

  test("full pipeline: XML ingest -> dump produces same bytes as direct fixture dump") {
    val root = Files.createTempDirectory("gar_e2e").toString
    writeFixtureTree(root)
    val viaXml = GarXml.read(spark, root, "ADDR_OBJ", Seq("01"))
      .orderBy("ord").drop("region", "ord")
    val direct = GarGen.df(spark, "ADDR_OBJ", "01", 9)
    val a = Dump.formatSlice(viaXml, "ADDR_OBJ", Dump.tsv)
    val b = Dump.formatSlice(direct, "ADDR_OBJ", Dump.tsv)
    assert(a == b && a.nonEmpty)
  }
}
