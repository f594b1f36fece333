package graft.ops

import java.io.{ByteArrayOutputStream, DataOutputStream, OutputStream}

/** Dependency-free NetCDF-3 "classic" codec, re-implemented from the
  * public CDF file-format specification like the TIFF/PNG/GIF codecs
  * (no NetCDF library exists in this environment). This is the
  * container the reference's consumers open directly —
  * pipeline.py:175-176 / processor.py:358-366 write `.nc`,
  * visualize_dataset.py:30 and arcgis.py:20 `xr.open_dataset` it — so
  * the cube sink can now hand them a file their existing toolchain
  * reads, instead of the parquet analog only.
  *
  * Format notes:
  *  - CDF-1 (magic `CDF\x01`, 32-bit offsets) with automatic promotion
  *    to CDF-2 (`CDF\x02`, 64-bit offsets) when any data offset would
  *    overflow a signed 32-bit int — the standard ">2 GiB" escape.
  *  - zlib per-variable compression is an HDF5/NetCDF-4 feature; the
  *    CLASSIC container is uncompressed by definition, so this writer
  *    is "zlib-free classic" by spec, not by omission. The zstd parquet
  *    cube sink remains the scale path (SURVEY §1.3); this sink is the
  *    toolchain-compatibility container.
  *  - The record dimension streams: the writer takes per-record chunks
  *    from an iterator and never holds more than one record's slabs,
  *    which is what lets [[Export.writeNetcdf]] assemble a long time
  *    series from `toLocalIterator` without collecting the cube.
  *
  * All multi-byte values big-endian; names and values pad to 4-byte
  * boundaries; each record variable's per-record chunk pads to 4 bytes
  * (the single-record-variable no-padding special case is REJECTED by
  * [[write]] rather than mis-padded — the cube never hits it, always
  * carrying time + ndvi + evi).
  */
object Netcdf {

  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  sealed trait AttVal
  final case class TextAtt(v: String) extends AttVal
  final case class IntAtt(v: Array[Int]) extends AttVal
  final case class FloatAtt(v: Array[Float]) extends AttVal
  final case class DoubleAtt(v: Array[Double]) extends AttVal

  /** One variable: dimension ids index [[Schema.dims]]; a leading
    * record-dimension id makes it a record variable. */
  final case class NcVar(name: String, dimIds: Seq[Int], tpe: Int,
      atts: Seq[(String, AttVal)])

  /** dims: (name, size), size 0 marks THE record dimension. */
  final case class Schema(dims: Seq[(String, Int)],
      gatts: Seq[(String, AttVal)], vars: Seq[NcVar])

  private def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => sys.error(s"unsupported nc_type $other")
  }

  private def pad4(n: Long): Long = (n + 3L) & ~3L

  private def isRecordVar(s: Schema, v: NcVar): Boolean =
    v.dimIds.headOption.exists(id => s.dims(id)._2 == 0)

  /** Unpadded byte size of one variable slab: the full fixed-var array,
    * or one record's chunk for a record variable. */
  private[graft] def slabSize(s: Schema, v: NcVar): Long =
    v.dimIds.filter(id => s.dims(id)._2 != 0)
      .map(id => s.dims(id)._2.toLong).product * typeSize(v.tpe)

  private def writeName(o: DataOutputStream, name: String): Unit = {
    val b = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    o.writeInt(b.length)
    o.write(b)
    var p = b.length
    while (p % 4 != 0) { o.writeByte(0); p += 1 }
  }

  private def writeAtts(o: DataOutputStream, atts: Seq[(String, AttVal)]): Unit =
    if (atts.isEmpty) { o.writeInt(0); o.writeInt(0) } // ABSENT
    else {
      o.writeInt(0x0C) // NC_ATTRIBUTE
      o.writeInt(atts.length)
      atts.foreach { case (name, av) =>
        writeName(o, name)
        av match {
          case TextAtt(v) =>
            val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            o.writeInt(NcChar); o.writeInt(b.length); o.write(b)
            var p = b.length
            while (p % 4 != 0) { o.writeByte(0); p += 1 }
          case IntAtt(v) =>
            o.writeInt(NcInt); o.writeInt(v.length); v.foreach(o.writeInt)
          case FloatAtt(v) =>
            o.writeInt(NcFloat); o.writeInt(v.length); v.foreach(o.writeFloat)
          case DoubleAtt(v) =>
            o.writeInt(NcDouble); o.writeInt(v.length); v.foreach(o.writeDouble)
        }
      }
    }

  /** Serialize the header for the given begin offsets (var name →
    * begin). Two-pass callers first serialize with zero begins to learn
    * the header length — begin width is fixed by `cdf2`, so the length
    * does not change when real offsets go in. */
  private def header(s: Schema, numRecs: Int, cdf2: Boolean,
      begins: Map[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeBytes("CDF"); o.writeByte(if (cdf2) 2 else 1)
    o.writeInt(numRecs)
    if (s.dims.isEmpty) { o.writeInt(0); o.writeInt(0) }
    else {
      o.writeInt(0x0A) // NC_DIMENSION
      o.writeInt(s.dims.length)
      s.dims.foreach { case (n, sz) => writeName(o, n); o.writeInt(sz) }
    }
    writeAtts(o, s.gatts)
    if (s.vars.isEmpty) { o.writeInt(0); o.writeInt(0) }
    else {
      o.writeInt(0x0B) // NC_VARIABLE
      o.writeInt(s.vars.length)
      s.vars.foreach { v =>
        writeName(o, v.name)
        o.writeInt(v.dimIds.length)
        v.dimIds.foreach(o.writeInt)
        writeAtts(o, v.atts)
        o.writeInt(v.tpe)
        // vsize records the PADDED slab; the spec caps it at 2^32-4 for
        // huge variables, which the cube's frame slabs never approach
        o.writeInt(pad4(slabSize(s, v)).toInt)
        val b = begins.getOrElse(v.name, 0L)
        if (cdf2) o.writeLong(b) else o.writeInt(b.toInt)
      }
    }
    o.flush()
    bos.toByteArray
  }

  /** Write a classic NetCDF-3 file: fixed variables from in-memory
    * payloads, record variables streamed one record at a time.
    *
    * `records` yields, per record, the UNPADDED big-endian chunk of
    * every record variable in [[Schema.vars]] order; the writer pads
    * and interleaves them as the spec lays records out. */
  def write(out: OutputStream, s: Schema, numRecs: Int,
      fixed: Map[String, Array[Byte]],
      records: Iterator[Seq[Array[Byte]]],
      forceCdf2: Boolean = false): Unit = {
    val fixedVars = s.vars.filter(v => !isRecordVar(s, v))
    val recVars = s.vars.filter(v => isRecordVar(s, v))
    // the classic spec OMITS record padding when there is exactly one
    // record variable of byte/char/short type; this writer always pads,
    // so refuse that shape rather than silently emit a file external
    // readers would misparse (the cube never hits it: time+ndvi+evi)
    require(recVars.length != 1 || typeSize(recVars.head.tpe) >= 4,
      "unsupported: a single byte/char/short record variable takes no " +
        "record padding in the classic format; add a second record " +
        "variable or widen the type")
    require(fixedVars.forall(v => fixed.contains(v.name)),
      s"missing fixed payload for ${fixedVars.map(_.name).filterNot(fixed.contains).mkString(",")}")
    fixedVars.foreach { v =>
      require(fixed(v.name).length == slabSize(s, v),
        s"${v.name}: payload ${fixed(v.name).length} != slab ${slabSize(s, v)}")
    }
    // choose offset width, then lay out: header, fixed slabs, records
    def layout(cdf2: Boolean): (Map[String, Long], Long) = {
      val hlen = header(s, numRecs, cdf2, Map.empty).length.toLong
      var off = hlen
      val b = Map.newBuilder[String, Long]
      fixedVars.foreach { v => b += v.name -> off; off += pad4(slabSize(s, v)) }
      recVars.foreach { v => b += v.name -> off; off += pad4(slabSize(s, v)) }
      (b.result(), off)
    }
    val cdf2 = forceCdf2 || layout(cdf2 = false)._2 > Int.MaxValue.toLong - 3
    val (begins, _) = layout(cdf2)
    out.write(header(s, numRecs, cdf2, begins))
    def padded(chunk: Array[Byte], v: NcVar): Unit = {
      out.write(chunk)
      var p = chunk.length.toLong
      val target = pad4(slabSize(s, v))
      while (p < target) { out.write(0); p += 1 }
    }
    fixedVars.foreach(v => padded(fixed(v.name), v))
    var n = 0
    records.foreach { chunks =>
      require(chunks.length == recVars.length,
        s"record $n: ${chunks.length} chunks for ${recVars.length} record vars")
      recVars.zip(chunks).foreach { case (v, c) =>
        require(c.length == slabSize(s, v),
          s"${v.name} record $n: chunk ${c.length} != slab ${slabSize(s, v)}")
        padded(c, v)
      }
      n += 1
    }
    require(n == numRecs, s"streamed $n records, header declares $numRecs")
    out.flush()
  }

  // ------------------------------------------------------------ reader

  /** Parsed file: schema + record count + raw big-endian payloads (a
    * record variable's payload is its records concatenated, padding
    * stripped). For the spec round-trip — not a general NetCDF reader,
    * but it refuses anything [[write]] would not produce. */
  final case class Parsed(s: Schema, numRecs: Int,
      data: Map[String, Array[Byte]])

  def read(bytes: Array[Byte]): Parsed = {
    val in = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    require(in.get() == 'C' && in.get() == 'D' && in.get() == 'F', "not CDF")
    val version = in.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    val numRecs = in.getInt()
    def name(): String = {
      val len = in.getInt()
      val b = new Array[Byte](len); in.get(b)
      var p = len
      while (p % 4 != 0) { in.get(); p += 1 }
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }
    def atts(): Seq[(String, AttVal)] = {
      val tag = in.getInt(); val n = in.getInt()
      require(tag == 0x0C || (tag == 0 && n == 0), s"bad att tag $tag")
      (0 until n).map { _ =>
        val nm = name()
        val t = in.getInt(); val cnt = in.getInt()
        val av: AttVal = t match {
          case NcChar =>
            val b = new Array[Byte](cnt); in.get(b)
            var p = cnt
            while (p % 4 != 0) { in.get(); p += 1 }
            TextAtt(new String(b, java.nio.charset.StandardCharsets.UTF_8))
          case NcInt => IntAtt(Array.fill(cnt)(in.getInt()))
          case NcFloat => FloatAtt(Array.fill(cnt)(in.getFloat()))
          case NcDouble => DoubleAtt(Array.fill(cnt)(in.getDouble()))
          case other => sys.error(s"unsupported att type $other")
        }
        nm -> av
      }
    }
    val dimTag = in.getInt(); val nDims = in.getInt()
    require(dimTag == 0x0A || (dimTag == 0 && nDims == 0), s"bad dim tag $dimTag")
    val dims = (0 until nDims).map(_ => (name(), in.getInt()))
    val gatts = atts()
    val varTag = in.getInt(); val nVars = in.getInt()
    require(varTag == 0x0B || (varTag == 0 && nVars == 0), s"bad var tag $varTag")
    val varsAndBegins = (0 until nVars).map { _ =>
      val nm = name()
      val nd = in.getInt()
      val dimIds = (0 until nd).map(_ => in.getInt())
      val va = atts()
      val tpe = in.getInt()
      val vsize = in.getInt(); val _ = vsize
      val begin = if (version == 2) in.getLong() else in.getInt().toLong
      (NcVar(nm, dimIds, tpe, va), begin)
    }
    val schema = Schema(dims, gatts, varsAndBegins.map(_._1))
    val recVars = schema.vars.filter(v => isRecordVar(schema, v))
    val recSize = recVars.map(v => pad4(slabSize(schema, v))).sum
    val data = varsAndBegins.map { case (v, begin) =>
      val slabL = slabSize(schema, v)
      // this reader addresses the in-memory byte array with Ints: a
      // >2 GiB CDF-2 file that write() can legitimately stream out is
      // NOT readable here — fail loudly instead of overflowing into
      // negative offsets (the reader is round-trip-scale only)
      val lastOff =
        if (!isRecordVar(schema, v)) begin + slabL
        else begin + math.max(numRecs - 1, 0).toLong * recSize + slabL
      // the numRecs factor bounds the RECORD payload allocation only; a
      // fixed variable allocates one slab regardless of record count
      require(begin >= 0 && lastOff <= Int.MaxValue.toLong &&
          (!isRecordVar(schema, v) ||
            slabL * math.max(numRecs, 1) <= Int.MaxValue),
        s"${v.name}: data extends past 2 GiB — this round-trip reader " +
          "addresses with 32-bit offsets; larger CDF-2 files are " +
          "write-only here")
      val slab = slabL.toInt
      val payload =
        if (!isRecordVar(schema, v)) {
          val b = new Array[Byte](slab)
          System.arraycopy(bytes, begin.toInt, b, 0, slab)
          b
        } else {
          val b = new Array[Byte](slab * numRecs)
          (0 until numRecs).foreach { r =>
            System.arraycopy(bytes, (begin + r * recSize).toInt, b, r * slab, slab)
          }
          b
        }
      v.name -> payload
    }.toMap
    Parsed(schema, numRecs, data)
  }
}
