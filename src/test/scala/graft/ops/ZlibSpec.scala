package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The shared exact-size inflate behind the PNG and TIFF decoders: a
  * malformed stream must FAIL, never spin — the decoders run inside
  * executor tasks, where an infinite loop is a hung stage, not an
  * exception the query can surface. */
class ZlibSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private val payload = Array.tabulate(4096)(i => ((i * 31 + 7) % 251).toByte)

  test("round-trips a well-formed stream at the exact expected size") {
    val got = Zlib.inflateExact(deflate(payload), payload.length, "spec")
    assert(java.util.Arrays.equals(got, payload))
  }

  test("a truncated stream fails instead of spinning") {
    val z = deflate(payload)
    val cut = java.util.Arrays.copyOf(z, z.length / 2)
    val e = intercept[IllegalArgumentException] {
      Zlib.inflateExact(cut, payload.length, "spec")
    }
    assert(e.getMessage.contains("expected"), e.getMessage)
  }

  test("a stream shorter than expected fails on the size check") {
    val short = payload.take(100)
    val e = intercept[IllegalArgumentException] {
      Zlib.inflateExact(deflate(short), payload.length, "spec")
    }
    assert(e.getMessage.contains("expected"), e.getMessage)
  }

  test("a preset-dictionary stream fails instead of spinning") {
    // inflate() returns 0 with needsInput()==false for FDICT streams —
    // the one stall shape a needsInput-only check loops forever on
    val dict = Array.tabulate(512)(i => (i % 83).toByte)
    val d = new java.util.zip.Deflater()
    d.setDictionary(dict)
    d.setInput(payload); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val e = intercept[IllegalArgumentException] {
      Zlib.inflateExact(out.toByteArray, payload.length, "spec")
    }
    assert(e.getMessage.contains("expected"), e.getMessage)
  }
}
