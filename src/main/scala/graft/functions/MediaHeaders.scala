package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Codec-free media header parsers: image dimensions and WAV audio
  * metadata straight from container bytes. Unlike the pixel/sample
  * decode (which needs real codec libraries and stays a stub —
  * `Multimodal.decodeStub`), the CONTAINER headers are fixed layouts a
  * few dozen bytes long, so dimension/rate extraction over binary
  * columns is exact, fast, and dependency-free — the metadata pass a
  * 100 TB media curation pipeline runs before any decoding.
  */
object MediaHeaders {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** `(format, width, height)` from PNG / JPEG / GIF headers; null for
    * anything unrecognized or truncated. PNG: IHDR big-endian dims at
    * offset 16. JPEG: walk marker segments to the first SOFn
    * (C0–CF except C4/C8/CC). GIF: little-endian logical-screen dims
    * at offset 6. */
  def imageDims(b: Array[Byte]): InternalRow = {
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G')
      return row("png", be32(b, 16), be32(b, 20))
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // desynced marker stream
        val m = b(i + 1) & 0xff
        if (m == 0xff) { i += 1 } // fill byte
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
            m != 0xcc) {
          if (i + 8 >= b.length) return null
          return row("jpeg", be16(b, i + 7), be16(b, i + 5))
        } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
        else { i += 2 + be16(b, i + 2) } // segment with length
      }
      return null
    }
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8')
      return row("gif", le16(b, 6), le16(b, 8))
    null
  }

  /** Unicode NFC canonical composition. */
  def nfc(s: UTF8String): UTF8String = UTF8String.fromString(
    java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Deflate (zlib level 6) size ratio of the UTF-8 bytes: compressed
    * size / raw size. Repetitive boilerplate lands well under natural
    * prose; the empty string reports 1.0. */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  /** `(channels, sample_rate, bits_per_sample)` from a RIFF/WAVE
    * header with the canonical 44-byte fmt layout; null otherwise. */
  def wavMeta(b: Array[Byte]): InternalRow = {
    if (b.length < 36 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E')
      return null
    new GenericInternalRow(Array[Any](le16(b, 22), le32(b, 24), le16(b, 34)))
  }
}
