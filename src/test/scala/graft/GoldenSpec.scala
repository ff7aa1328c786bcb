package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest
import graft.fixtures.PageGen
import graft.kernel.{Html, Pdf}

/** Frozen goldens (src/test/resources/golden/pages150.tsv):
  * `url \t sha256(html) \t sha256(ground-truth text) \t lang` for
  * PageGen.pages(150), committed once. Guards the byte-identity contract
  * against *co-drift*: the in-suite `extraction == generator text`
  * assertions (PipelineSpec) would silently keep passing if the grammar
  * and kernel changed together; these hashes pin both sides to the
  * committed corpus. Regenerating the file is a conscious,
  * diff-reviewed act.
  */
class GoldenSpec extends AnyFunSuite {

  private def sha(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private lazy val golden: Map[String, (String, String, String)] = {
    val src = scala.io.Source.fromResource("golden/pages150.tsv")
    try src.getLines().map { l =>
      val Array(url, hHtml, hText, lang) = l.split('\t')
      url -> ((hHtml, hText, lang))
    }.toMap
    finally src.close()
  }

  private lazy val pages = PageGen.pages(150)

  test("generator is frozen: payload and truth hashes match the committed goldens") {
    assert(pages.size === golden.size)
    pages.foreach { p =>
      val (hHtml, hText, lang) = golden(p.url)
      assert(sha(p.html) === hHtml, s"payload drifted for ${p.url}")
      assert(sha(p.text.getBytes("UTF-8")) === hText, s"ground truth drifted for ${p.url}")
      assert(p.lang === lang, s"lang drifted for ${p.url}")
    }
  }

  test("kernels reproduce the frozen goldens byte-for-byte (no Spark)") {
    pages.foreach { p =>
      val extracted =
        if (p.html.length >= 5 && p.html.take(5).sameElements("%PDF-".getBytes)) {
          val cs = Pdf.chunkBytes(p.html)
          cs.map(c => Pdf.extractChunk(c).text).mkString
        } else Html.extract(p.html).text
      assert(sha(extracted.getBytes("UTF-8")) === golden(p.url)._2,
        s"extraction diverged from golden for ${p.url}")
    }
  }
}
