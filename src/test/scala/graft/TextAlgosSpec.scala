package graft

import graft.geo.TextAlgos
import org.scalatest.funsuite.AnyFunSuite

class TextAlgosSpec extends AnyFunSuite {

  test("buildNgrams mirrors reference semantics (common.py:11-19)") {
    // Python: build_ngrams("кот") -> "__к _ко кот от_ т__"
    assert(TextAlgos.buildNgrams("кот") == "__к _ко кот от_ т__")
    assert(TextAlgos.buildNgrams("ab") == "__a _ab ab_ b__")
  }

  test("buildNgrams empty/short inputs follow the padding formula exactly") {
    // padded = "__" + "" + "__" = "____", count = 4 - 2 = 2 -> windows "___", "___"
    assert(TextAlgos.buildNgrams("") == "___ ___")
    // "a": padded "__a__", count 3 -> "__a", "_a_", "a__"
    assert(TextAlgos.buildNgrams("a") == "__a _a_ a__")
  }

  test("clearKeyword mirrors reference semantics (common.py:21-24)") {
    assert(TextAlgos.clearKeyword("ул. Ленина, д.5") == "ул__ленина__д_5")
    assert(TextAlgos.clearKeyword("A-B_C\\D/E") == "a_b_c_d_e")
    assert(TextAlgos.clearKeyword("x 'y' \"z\"") == "x__y___z_")
  }

  test("shingles and jaccard") {
    assert(TextAlgos.shingles("abcd", 3) == Set("abc", "bcd"))
    assert(TextAlgos.shingles("ab", 3) == Set("ab"))
    assert(TextAlgos.jaccard(Set("a", "b"), Set("b", "c")) == 1.0 / 3.0)
    assert(TextAlgos.jaccard(Set.empty, Set.empty) == 1.0)
  }

  test("minhash similarity approximates jaccard") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val c = "completely different content with no overlap whatsoever here"
    val (sa, sb, sc) = (TextAlgos.minHash(a, 3, 64), TextAlgos.minHash(b, 3, 64), TextAlgos.minHash(c, 3, 64))
    def sim(x: Array[Long], y: Array[Long]) = x.zip(y).count(t => t._1 == t._2).toDouble / x.length
    val trueAB = TextAlgos.jaccard(TextAlgos.shingles(a, 3), TextAlgos.shingles(b, 3))
    assert(math.abs(sim(sa, sb) - trueAB) < 0.2)
    assert(sim(sa, sc) < 0.3)
    assert(sim(sa, sa) == 1.0)
  }

  test("lsh bands: identical docs share all bands, near dups share some") {
    val a = TextAlgos.minHash("shared prefix of a fairly long document body", 3, 64)
    val b = TextAlgos.minHash("shared prefix of a fairly long document body!", 3, 64)
    val ba = TextAlgos.lshBands(a, 16)
    val bb = TextAlgos.lshBands(b, 16)
    assert(ba.length == 16)
    assert(ba.zip(bb).exists(t => t._1 == t._2)) // near-dups collide in >=1 band
    assert(TextAlgos.lshBands(a, 16).sameElements(ba)) // deterministic
  }

  test("simhash: near-dup texts have small hamming distance") {
    val a = TextAlgos.simHash("spark native geospatial engine over interleaved documents")
    val b = TextAlgos.simHash("spark native geospatial engine over interleaved document")
    val c = TextAlgos.simHash("пример совершенно другого текста на русском языке")
    assert(TextAlgos.hammingDistance(a, a) == 0)
    assert(TextAlgos.hammingDistance(a, b) < 16)
    assert(TextAlgos.hammingDistance(a, c) > 10)
  }

  test("rolling fingerprint deterministic and order-sensitive") {
    assert(TextAlgos.rollingFingerprint("abc") == TextAlgos.rollingFingerprint("abc"))
    assert(TextAlgos.rollingFingerprint("abc") != TextAlgos.rollingFingerprint("acb"))
    assert(TextAlgos.rollingFingerprint("") == 0L)
  }

  test("tokenize / counts") {
    assert(TextAlgos.tokenCount("a b  c\td") == 4)
    assert(TextAlgos.tokenCount("") == 0)
    assert(TextAlgos.bpeTokenEstimate("hi") == 1)
    assert(TextAlgos.bpeTokenEstimate("internationalization") == 5) // ceil(20/4)
    assert(TextAlgos.bpeTokenEstimate("a b!") == 3)
  }

  test("langId heuristic") {
    assert(TextAlgos.langId("привет мир как дела") == "ru")
    assert(TextAlgos.langId("hello world how are you") == "en")
    assert(TextAlgos.langId("12345 !!!") == "und")
    assert(TextAlgos.langId("你好世界你好世界") == "other")
  }

  test("quality score bounds and ordering") {
    val good = TextAlgos.qualityScore("This is a reasonably long and well formed sentence " * 4)
    val bad = TextAlgos.qualityScore("!!! ### $$$ %%%")
    assert(good > bad)
    assert(good >= 0.0 && good <= 1.0)
    assert(TextAlgos.qualityScore("") == 0.0)
  }
}
