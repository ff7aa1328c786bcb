package graft.kernel

import java.nio.charset.{CharacterCodingException, StandardCharsets}

/** Mojibake repair — undo the single most common crawl-text corruption:
  * UTF-8 bytes that were decoded as windows-1252/latin-1 somewhere in
  * the serving chain ("Ã©" for "é",
  * "â€™" for "’", and the double-encoded forms
  * thereof). The reference's per-document flow (ocr-app
  * `app/services/ocr_service.py`) trusts its OCR vendor's encoding; a
  * web-scale corpus cannot — a few percent of real crawl pages label
  * windows-1252 but carry re-encoded UTF-8 (ftfy's published
  * motivation; the core fix re-implemented from scratch).
  *
  * Algorithm (per round, at most [[MaxRounds]]):
  *   1. map every char back to the byte a windows-1252 decode would
  *      have produced it from: the cp1252 0x80–0x9F specials via the
  *      reverse table, U+0000–U+00FF identity otherwise ("sloppy
  *      cp1252" — undefined 1252 bytes 0x81/0x8D/0x8F/0x90/0x9D pass
  *      through as their latin-1 control chars, which also makes the
  *      map cover plain latin-1 mis-decodes). Any char above U+00FF
  *      outside the reverse table aborts the round — the string cannot
  *      be a 1252 mis-decode.
  *   2. STRICT-decode those bytes as UTF-8 (malformed → abort round).
  *   3. accept only if the decode actually consumed a multibyte
  *      sequence (output shorter than input) — pure-ASCII round-trips
  *      are no-ops, and legitimate Western text ("naïve
  *      café") fails step 2 because its lone accented bytes are
  *      invalid UTF-8 lead bytes, so it is returned untouched.
  *
  * Deterministic, allocation-light, total: any failure returns the
  * input as-is (C5 posture — never throw on hostile text).
  */
object Mojibake {

  /** Rounds bound: single and double encoding are the real-world
    * population (ftfy caps its equivalent loop too); a third round
    * guards the rare triple case while keeping worst-case cost flat.
    */
  val MaxRounds = 3

  /** cp1252 bytes 0x80–0x9F → Unicode; the five undefined slots
    * (0x81/0x8D/0x8F/0x90/0x9D) keep their latin-1 control char — the
    * "sloppy" identity.
    */
  private val cp1252High: Array[Char] = Array(
    '\u20ac', '\u0081', '\u201a', '\u0192', '\u201e', '\u2026', '\u2020', '\u2021',
    '\u02c6', '\u2030', '\u0160', '\u2039', '\u0152', '\u008d', '\u017d', '\u008f',
    '\u0090', '\u2018', '\u2019', '\u201c', '\u201d', '\u2022', '\u2013', '\u2014',
    '\u02dc', '\u2122', '\u0161', '\u203a', '\u0153', '\u009d', '\u017e', '\u0178')

  /** char above U+00FF → its cp1252 byte (the specials window). */
  private val reverse: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](64)
    var b = 0x80
    while (b <= 0x9F) {
      val c = cp1252High(b - 0x80)
      if (c > '\u00ff') m.put(Character.valueOf(c), java.lang.Byte.valueOf(b.toByte))
      b += 1
    }
    m
  }

  private def toCp1252Bytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= '\u00ff') out(i) = c.toByte
      else {
        val b = reverse.get(Character.valueOf(c))
        if (b == null) return null
        out(i) = b.byteValue()
      }
      i += 1
    }
    out
  }

  private def strictUtf8(bytes: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => null }
  }

  /** One un-mojibake round; null when the string is not a 1252-decoded
    * UTF-8 byte stream.
    */
  private def round(s: String): String = {
    // cheap gate: a mis-decoded multibyte sequence always contains a
    // char whose source byte is >= 0x80 (UTF-8 lead bytes land there);
    // pure-ASCII and CJK-only strings skip the byte work entirely
    var hasHigh = false
    var i = 0
    while (i < s.length && !hasHigh) {
      val c = s.charAt(i)
      if (c >= '\u0080' && (c <= '\u00ff' || reverse.containsKey(Character.valueOf(c))))
        hasHigh = true
      i += 1
    }
    if (!hasHigh) return null
    val bytes = toCp1252Bytes(s)
    if (bytes == null) return null
    val decoded = strictUtf8(bytes)
    if (decoded == null || decoded.length >= s.length) null else decoded
  }

  /** Repair mojibake; returns the input (same reference) unchanged when
    * no round applies. Total — never throws.
    */
  def repair(s: String): String = {
    if (s == null) return null
    var cur = s
    var r = 0
    var changed = true
    while (r < MaxRounds && changed) {
      val next = round(cur)
      if (next == null) changed = false else { cur = next; r += 1 }
    }
    cur
  }

  /** Did [[repair]] change anything? (Column-friendly flag.) */
  def isMojibake(s: String): Boolean = s != null && (repair(s) ne s)
}
