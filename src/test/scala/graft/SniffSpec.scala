package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Sniff
import graft.fixtures.MediaGen

class SniffSpec extends AnyFunSuite {

  test("every fixture family sniffs to its exact MIME") {
    val lum = Array.tabulate(16 * 12)(i => i % 256)
    val gray = lum.map(_.toByte)
    val px32 = Array.fill(16 * 12)(0xff336699)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "application/pdf" -> graft.kernel.PdfWriter.build(Seq(Seq("x")), compress = true),
      "image/png" -> MediaGen.png(gray, 16, 12, 1),
      "image/jpeg" -> MediaGen.jpeg(lum, 16, 12),
      "image/gif" -> MediaGen.gif(gray, 16, 12, Array.fill(768)(3.toByte)),
      "image/webp" -> MediaGen.webpLossless(px32, 16, 12),
      "image/tiff" -> MediaGen.tiff(gray, 16, 12, 1),
      "image/tiff" -> MediaGen.tiffG4(gray.map(b => ((b & 1)).toByte), 16, 12),
      "image/bmp" -> MediaGen.bmp(gray.flatMap(v => Array(v, v, v)), 16, 12),
      "audio/wav" -> MediaGen.wav(Array.fill(100)(7.toShort), 8000),
      "audio/flac" -> MediaGen.flac(Array.fill(100)(9.toShort), 8000),
      "application/gzip" -> {
        val bo = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bo)
        gz.write("hello".getBytes); gz.finish(); bo.toByteArray
      },
      "application/zstd" -> com.github.luben.zstd.Zstd.compress("hello".getBytes, 3),
      "text/html" -> "<!DOCTYPE html><html><body>x</body></html>".getBytes,
      "text/html" -> "  <html lang=\"en\"><head></head></html>".getBytes,
      "application/xml" -> "<?xml version=\"1.0\"?><urlset/>".getBytes,
      "text/plain" -> "just some plain words\nover two lines\n".getBytes,
      "application/warc" -> "WARC/1.1\r\nWARC-Type: response\r\n".getBytes,
      "text/html" -> (Array[Byte](0xff.toByte, 0xfe.toByte) ++
        "<html><body>utf16</body></html>".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)),
      "text/plain" -> (Array[Byte](0xfe.toByte, 0xff.toByte) ++
        "plain utf-16 big endian words".getBytes(java.nio.charset.StandardCharsets.UTF_16BE)),
      "application/octet-stream" -> Array.tabulate[Byte](64)(i => (i * 37).toByte))
    cases.zipWithIndex.foreach { case ((want, payload), i) =>
      assert(Sniff.mime(payload) === want, s"case $i")
    }
    // degenerate inputs never throw
    assert(Sniff.mime(null) === "application/octet-stream")
    assert(Sniff.mime(Array.empty) === "application/octet-stream")
    assert(Sniff.mime(Array[Byte](1, 2)) === "application/octet-stream")
  }
}
