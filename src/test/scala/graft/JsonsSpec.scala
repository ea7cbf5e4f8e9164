package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared artifact JSON escaper must produce strings a real JSON parser
  * round-trips exactly — a lossy or invalid escape silently corrupts the
  * driver-parsed bench/verify artifacts (the failure mode that motivated
  * extracting ONE escaper). Parsed with Jackson (already on the Spark
  * classpath), not hand-rolled assertions. */
class JsonsSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def roundTrip(s: String): String =
    mapper.readTree(s"""{"k":${Jsons.str(s)}}""").get("k").asText()

  test("escapes round-trip through a real JSON parser byte-for-byte") {
    val nasty = Seq(
      "plain",
      "with \"quotes\" and \\backslashes\\",
      "newline\nand\ttab\rand\u0000nul\u001fus",
      "multi-line Spark error:\n  at org.apache.spark.Foo$.bar(Foo.scala:1)",
      "path C:\\data\\\"sf0.1\"",
      "кириллица и ünïcødé \u2603",
      "")
    for (s <- nasty) assert(roundTrip(s) == s, s"lossy escape for ${s.take(30)}")
  }

  test("control characters are preserved, never flattened to spaces") {
    // the replaced Bench escaper mapped all of [\x00-\x1f] to ' ' — a
    // multi-line error message lost its structure in the artifact
    assert(roundTrip("a\nb") == "a\nb")
    assert(roundTrip("a\u0007b") == "a\u0007b")
  }
}
