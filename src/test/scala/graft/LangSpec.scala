package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.kernel.Lang
import graft.fixtures.PageGen

/** Differential suite: the zero-allocation `Lang.detect` must equal the
  * executable spec `Lang.detectReference` on every input.
  */
class LangSpec extends AnyFunSuite {

  test("detect == reference over fixture ground-truth texts") {
    PageGen.pages(400).foreach { p =>
      assert(Lang.detect(p.text) == Lang.detectReference(p.text), p.url)
    }
  }

  test("detect == reference on hand-built edge cases") {
    val cases = Seq(
      "", " ", "...!!!", "123 456", "the", "THE AND OF", "ÜBER über FÜR der die das",
      "le chat est sur le toit", "el perro y el gato", "über",
      "wordthatislongerthanseven characters everywhere nothing matches",
      "exactly sevench letters und der", "a", "y", "µ µber über",
      "mixedCASE The And OF", "the and of", "l'été où ça va",
      "tab\tthe\nand\rof", "die Straße über dem Fluß",
      "ελληνικά κείμενο the and of", // ≥U+0100 → falls back, still equal
      "русский текст und der die", "日本語 the and of")
    cases.foreach { t =>
      assert(Lang.detect(t) == Lang.detectReference(t), s"mismatch on: $t")
    }
  }

  test("detect == reference on random Latin-1 soup (500 seeded samples)") {
    val wordGen = Gen.frequency(
      5 -> Gen.oneOf(Lang.profiles.flatMap(_._2)),
      3 -> Gen.alphaStr.map(_.take(12)),
      1 -> Gen.oneOf("über", "für", "château", "niño", "æøå", "ß", "ÿ"),
      1 -> Gen.oneOf("...", "123", "—", "&", "<p>"))
    val soup = Gen.chooseNum(0, 40)
      .flatMap(k => Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    var seed = Seed(7L)
    (1 to 500).foreach { k =>
      val t = soup.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      assert(Lang.detect(t) == Lang.detectReference(t), s"mismatch #$k on: $t")
    }
  }

  test("detects each profile language from its own stopwords") {
    assert(Lang.detect("the and of to in is that") == "en")
    assert(Lang.detect("le la les de des du et") == "fr")
    assert(Lang.detect("der die das und ist von zu über für") == "de")
    assert(Lang.detect("el los las y una es que como pero") == "es")
    assert(Lang.detect("zzz qqq xxx") == "und")
    assert(Lang.detect("") == "und")
  }
}
