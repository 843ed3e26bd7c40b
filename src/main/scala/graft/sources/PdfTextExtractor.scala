package graft.sources

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** A pure-JVM PDF text extractor — the real default behind
  * [[PdfExtractor]] (the reference's namesake capability:
  * /root/reference/src/services/PDFExtractor.ts:153-199 shells out to
  * pypdf; this environment has no PDF library on the classpath, so the
  * codec is implemented here from the PDF 1.7 spec).
  *
  * Scope (the overwhelmingly common case, honestly bounded):
  *   - COS object syntax: dicts, arrays, names (#xx escapes), literal
  *     strings (all escapes, nested parens), hex strings, refs, streams.
  *   - Object discovery by tolerant whole-file scan of `N G obj` (no
  *     xref trust — survives broken/absent xref tables, incremental
  *     updates resolve last-wins) plus /Type/ObjStm expansion, so both
  *     classic and 1.5+ compressed-object files parse.
  *   - Filters: FlateDecode (with PNG predictors 10-15), ASCIIHexDecode,
  *     ASCII85Decode; filter chains and array forms.
  *   - Page tree walk (/Catalog -> /Pages -> /Kids, cycle-guarded) with
  *     fallback to file-order /Type/Page objects.
  *   - Text operators: BT/ET, Tj, ', ", TJ (kerning gaps >= 1/10 em
  *     become spaces), Td, TD, T-star and Tm line tracking -> newlines,
  *     Tf font selection.
  *   - String decoding: per-font /ToUnicode CMap remapping (PDF 32000
  *     §9.10.3: codespacerange widths, bfchar, bfrange incl. the array
  *     form — covers subset-embedded fonts, Identity-H 2-byte CIDs, and
  *     ligature/multi-char targets); Identity-H without a CMap falls
  *     back to code-as-BMP-char; unmapped fonts fall back to UTF-16BE
  *     (BOM) else PDFDocEncoding≈Latin-1. /Resources resolve through
  *     the /Parent chain per the spec's inheritable-attribute rule.
  *
  * NOT handled (documented limits, like pypdf's own caveats):
  * LZW/JBIG2/DCT filters,
  * encrypted documents. Such files extract partially or empty; at the
  * trait boundary a production deployment can still swap in a heavier
  * codec per SURVEY.md §7.3.
  *
  * Extraction never throws on malformed input: unparseable pages are
  * skipped, a fully unparseable file returns (0, Nil) — ingest treats
  * pageCount = 0 as "extraction produced nothing".
  */
object PdfCos {
  sealed trait Obj
  final case class PNum(v: Double) extends Obj { def toInt: Int = v.toInt }
  final case class PName(v: String) extends Obj
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj
  final case class PBool(b: Boolean) extends Obj
  case object PNull extends Obj
}

/** Recursive-descent parser over a byte buffer (PDF is byte-oriented;
  * offsets matter, so no String round-trip for structure). */
final class PdfLexer(val buf: Array[Byte], var pos: Int) {
  import PdfCos._

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0 || b == '\f'
  private def isDelim(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'
  private def isRegular(b: Byte): Boolean = !isWs(b) && !isDelim(b)

  def atEnd: Boolean = pos >= buf.length
  private def cur: Byte = buf(pos)

  def skipWs(): Unit = {
    var looping = true
    while (looping && !atEnd) {
      if (isWs(cur)) pos += 1
      else if (cur == '%') { // comment to EOL
        while (!atEnd && cur != '\n' && cur != '\r') pos += 1
      } else looping = false
    }
  }

  /** Next regular-character run (operator / keyword). */
  def keyword(): String = {
    skipWs()
    val start = pos
    while (!atEnd && isRegular(cur)) pos += 1
    new String(buf, start, pos - start, StandardCharsets.ISO_8859_1)
  }

  def peekByte(): Int = { skipWs(); if (atEnd) -1 else cur & 0xff }

  private def name(): PName = {
    pos += 1 // '/'
    val sb = new StringBuilder
    while (!atEnd && isRegular(cur)) {
      if (cur == '#' && pos + 2 < buf.length) {
        val h = Character.digit(buf(pos + 1), 16)
        val l = Character.digit(buf(pos + 2), 16)
        if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
        else { sb.append(cur.toChar); pos += 1 }
      } else { sb.append(cur.toChar); pos += 1 }
    }
    PName(sb.toString)
  }

  private def literalString(): PStr = {
    pos += 1 // '('
    val out = new java.io.ByteArrayOutputStream()
    var depth = 1
    while (!atEnd && depth > 0) {
      val b = cur
      pos += 1
      b match {
        case '(' => depth += 1; out.write(b)
        case ')' => depth -= 1; if (depth > 0) out.write(b)
        case '\\' if !atEnd =>
          val e = cur; pos += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (!atEnd && cur == '\n') pos += 1 // line continuation
            case '\n' => // line continuation
            case d if d >= '0' && d <= '7' => // up to 3 octal digits
              var v = d - '0'
              var n = 1
              while (n < 3 && !atEnd && cur >= '0' && cur <= '7') {
                v = v * 8 + (cur - '0'); pos += 1; n += 1
              }
              out.write(v & 0xff)
            case other => out.write(other) // spec: backslash ignored
          }
        case _ => out.write(b)
      }
    }
    PStr(out.toByteArray)
  }

  private def hexString(): PStr = {
    pos += 1 // '<'
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    while (!atEnd && cur != '>') {
      val d = Character.digit(cur, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { out.write((hi << 4) | d); hi = -1 }
      }
      pos += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit: pad 0
    if (!atEnd) pos += 1 // '>'
    PStr(out.toByteArray)
  }

  private def number(): PNum = {
    val start = pos
    if (cur == '+' || cur == '-') pos += 1
    while (!atEnd && ((cur >= '0' && cur <= '9') || cur == '.')) pos += 1
    val s = new String(buf, start, pos - start, StandardCharsets.ISO_8859_1)
    PNum(try s.toDouble catch { case _: NumberFormatException => 0.0 })
  }

  /** Parse one object. Integer + integer + 'R' lookahead folds to PRef. */
  def parseObject(): Obj = {
    skipWs()
    if (atEnd) return PNull
    (cur: @annotation.switch) match {
      case '/' => name()
      case '(' => literalString()
      case '[' =>
        pos += 1
        val items = Vector.newBuilder[Obj]
        while ({ skipWs(); !atEnd && cur != ']' }) items += parseObject()
        if (!atEnd) pos += 1
        PArr(items.result())
      case '<' =>
        if (pos + 1 < buf.length && buf(pos + 1) == '<') dict()
        else hexString()
      case b if b == '+' || b == '-' || b == '.' || (b >= '0' && b <= '9') =>
        val n = number()
        if (n.v >= 0 && n.v == n.v.floor) {
          // possible "N G R" reference: try, backtrack if not
          val save = pos
          skipWs()
          if (!atEnd && cur >= '0' && cur <= '9') {
            val g = number()
            skipWs()
            if (!atEnd && cur == 'R' &&
              (pos + 1 >= buf.length || !isRegular(buf(pos + 1)))) {
              pos += 1
              return PRef(n.toInt, g.toInt)
            }
          }
          pos = save
        }
        n
      case _ =>
        keyword() match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case "" => pos += 1; PNull // stray delimiter: skip a byte
          case _ => PNull // unknown keyword (operator etc.)
        }
    }
  }

  private def dict(): Obj = {
    pos += 2 // '<<'
    val m = Map.newBuilder[String, Obj]
    var looping = true
    while (looping) {
      skipWs()
      if (atEnd) looping = false
      else if (cur == '>' && pos + 1 < buf.length && buf(pos + 1) == '>') {
        pos += 2; looping = false
      } else if (cur == '/') {
        val k = name().v
        m += k -> parseObject()
      } else pos += 1 // tolerate junk
    }
    PDict(m.result())
  }
}

/** Per-font code→Unicode decoder built from a /ToUnicode CMap.
  *
  * `codespaces` give the byte width of each code (per-byte lo/hi ranges,
  * PDF 32000 §9.7.6.2 — width is decided by matching the range, so
  * mixed-width fonts decode correctly); `defaultLen` applies when no
  * range matches (2 for Type0/CID fonts, 1 for simple fonts); `toUni`
  * maps (width, code) → the UTF-16 target string (multi-char targets —
  * ligatures — are legal and preserved).
  */
final class FontDecoder(
    codespaces: Seq[(Array[Int], Array[Int])],
    defaultLen: Int,
    toUni: Map[Long, String]) {

  private def key(len: Int, code: Int): Long =
    (len.toLong << 32) | (code & 0xffffffffL)

  private def widthAt(bytes: Array[Byte], i: Int): Int =
    codespaces.collectFirst {
      case (lo, hi)
        if i + lo.length <= bytes.length && lo.indices.forall { j =>
          val v = bytes(i + j) & 0xff; v >= lo(j) && v <= hi(j)
        } => lo.length
    }.getOrElse(defaultLen)

  def decode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      val len = math.max(1, math.min(widthAt(bytes, i), bytes.length - i))
      var code = 0
      var j = 0
      while (j < len) { code = (code << 8) | (bytes(i + j) & 0xff); j += 1 }
      toUni.get(key(len, code)) match {
        case Some(s) => sb.append(s)
        case None =>
          // unmapped: 1-byte codes read as PDFDocEncoding≈Latin-1 (the
          // legacy path); 2-byte codes fall back to code-as-BMP-char —
          // exact for Identity-mapped non-subset fonts, and no worse
          // than the raw bytes for true subset glyph ids.
          if (len == 1) sb.append(code.toChar)
          else if (code >= 0x20 && !Character.isSurrogate(code.toChar))
            sb.append(code.toChar)
      }
      i += len
    }
    sb.toString.filter(c => c >= ' ' || c == '\n' || c == '\t')
  }
}

/** Parser for decoded /ToUnicode CMap streams (Adobe CMap syntax,
  * PDF 32000 §9.10.3; reference behavior: pypdf behind
  * /root/reference/src/services/PDFExtractor.ts:153-199). Tokenizes
  * with [[PdfLexer]]; only codespacerange/bfchar/bfrange sections feed
  * the mapping — all other CMap (PostScript) operators clear operands. */
object ToUnicodeCMap {
  import PdfCos._

  def parse(data: Array[Byte], defaultLen: Int): FontDecoder = {
    val lex = new PdfLexer(data, 0)
    val stack = mutable.ArrayBuffer[Obj]()
    val spaces = mutable.ArrayBuffer[(Array[Int], Array[Int])]()
    val map = mutable.Map[Long, String]()
    def codeOf(b: Array[Byte]): Int =
      b.foldLeft(0)((a, x) => (a << 8) | (x & 0xff))
    def key(len: Int, code: Int): Long =
      (len.toLong << 32) | (code & 0xffffffffL)
    def uni(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_16BE)
    // bfrange with a string target: the FINAL UTF-16 code unit increments
    // across the range (spec: "the last byte of the string is incremented")
    def incLast(b: Array[Byte], by: Int): String = {
      val s = uni(b)
      if (s.isEmpty) s else s.init + (s.last + by).toChar
    }
    while (!lex.atEnd) {
      lex.skipWs()
      if (!lex.atEnd) {
        val b = lex.peekByte()
        if (b == '/' || b == '(' || b == '<' || b == '[' ||
          b == '+' || b == '-' || b == '.' || (b >= '0' && b <= '9')) {
          stack += lex.parseObject()
        } else lex.keyword() match {
          case "begincodespacerange" | "beginbfchar" | "beginbfrange" =>
            stack.clear()
          case "endcodespacerange" =>
            stack.grouped(2).foreach {
              case mutable.ArrayBuffer(PStr(lo), PStr(hi))
                if lo.nonEmpty && lo.length == hi.length =>
                spaces += ((lo.map(_ & 0xff), hi.map(_ & 0xff)))
              case _ => ()
            }
            stack.clear()
          case "endbfchar" =>
            stack.grouped(2).foreach {
              case mutable.ArrayBuffer(PStr(src), PStr(dst)) if src.nonEmpty =>
                map(key(src.length, codeOf(src))) = uni(dst)
              case _ => ()
            }
            stack.clear()
          case "endbfrange" =>
            stack.grouped(3).foreach {
              case mutable.ArrayBuffer(PStr(lo), PStr(hi), dst)
                if lo.nonEmpty && lo.length == hi.length =>
                val l = codeOf(lo)
                // cap range size: malformed <0000> <FFFFFFFF> must not OOM
                val n = math.min(codeOf(hi) - l, 65535)
                dst match {
                  case PStr(d) =>
                    (0 to n).foreach(i => map(key(lo.length, l + i)) = incLast(d, i))
                  case PArr(items) =>
                    items.zipWithIndex.foreach {
                      case (PStr(d), i) if i <= n => map(key(lo.length, l + i)) = uni(d)
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
            stack.clear()
          case "" => lex.pos += 1
          case _ => stack.clear() // def/dup/begin/endcmap etc: consume operands
        }
      }
    }
    new FontDecoder(spaces.toSeq, defaultLen, map.toMap)
  }
}

object PdfParser {
  import PdfCos._

  /** All indirect objects, by tolerant scan + ObjStm expansion.
    * Later direct definitions win (incremental updates append) — but a
    * match that falls INSIDE a stream payload is compressed-data noise,
    * not a definition: a Flate body containing the bytes "5 0 obj" must
    * not overwrite the real object 5 with junk (silently losing pages).
    * A sweep in file order records each stream's payload span and drops
    * matches inside one before either parsing pass runs. */
  def parseObjects(bytes: Array[Byte]): Map[Int, Obj] = {
    val view = new String(bytes, StandardCharsets.ISO_8859_1)
    val objPat = java.util.regex.Pattern.compile("(\\d{1,9})\\s+(\\d{1,5})\\s+obj\\b")
    val m = objPat.matcher(view)
    val objs = mutable.LinkedHashMap[Int, Obj]()
    // (objNum, matchStart, bodyStart)
    val candidates = mutable.ArrayBuffer[(Int, Int, Int)]()
    while (m.find()) {
      candidates += ((m.group(1).toInt, m.start(), m.end()))
    }
    // pass 0: provisional bare-integer objects from EVERY match — the
    // sweep needs them to span streams whose /Length is an indirect ref.
    // Junk matches can only contribute junk ints; a wrong provisional
    // length fails endstreamNear below and falls back to the scan.
    val lengthInts0 = mutable.Map[Int, Int]()
    candidates.foreach { case (num, _, start) =>
      try {
        val lex = new PdfLexer(bytes, start)
        lex.parseObject() match {
          case PNum(v) if v == v.floor => lengthInts0(num) = v.toInt
          case _ => ()
        }
      } catch { case _: Exception => () }
    }
    // sweep: accept matches in file order, skipping any that start
    // inside the most recent accepted stream's payload
    val positions = mutable.ArrayBuffer[(Int, Int)]() // (objNum, bodyStart)
    var skipUntil = 0
    candidates.foreach { case (num, matchStart, bodyStart) =>
      if (matchStart >= skipUntil) {
        positions += ((num, bodyStart))
        try {
          val lex = new PdfLexer(bytes, bodyStart)
          lex.parseObject() match {
            case d: PDict =>
              streamSpanAt(bytes, view, lex, d, lengthInts0.get).foreach {
                case (_, dataEnd) =>
                  val endKw = view.indexOf("endstream", math.max(0, dataEnd - 2))
                  skipUntil = if (endKw >= 0) endKw + "endstream".length else dataEnd
              }
            case _ => ()
          }
        } catch { case _: Exception => () }
      }
    }
    // pass 1: collect bare-integer objects (stream /Length often lives there)
    val lengthInts = mutable.Map[Int, Int]()
    positions.foreach { case (num, start) =>
      val lex = new PdfLexer(bytes, start)
      lex.skipWs()
      try {
        val o = lex.parseObject()
        o match {
          case PNum(v) if v == v.floor => lengthInts(num) = v.toInt
          case _ => ()
        }
      } catch { case _: Exception => () }
    }
    // pass 2: full parse including stream payloads
    positions.foreach { case (num, start) =>
      try {
        val lex = new PdfLexer(bytes, start)
        val body = lex.parseObject()
        val obj = body match {
          case d: PDict =>
            val save = lex.pos
            streamSpanAt(bytes, view, lex, d, lengthInts.get) match {
              case Some((dataStart, dataEnd)) =>
                PStream(d, java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd))
              case None => lex.pos = save; d
            }
          case o => o
        }
        objs(num) = obj // last definition wins
      } catch { case _: Exception => () }
    }
    // ObjStm expansion: compressed objects fill gaps (direct defs win)
    objs.toSeq.foreach {
      case (_, s @ PStream(PDict(d), _))
        if d.get("Type").contains(PName("ObjStm")) =>
        try {
          val data = decodeStream(s, objs.get)
          val n = d.get("N").collect { case PNum(v) => v.toInt }.getOrElse(0)
          val first = d.get("First").collect { case PNum(v) => v.toInt }.getOrElse(0)
          val header = new String(data, 0, math.min(first, data.length),
            StandardCharsets.ISO_8859_1)
          val nums = header.trim.split("\\s+").filter(_.nonEmpty).map(_.toLong)
          (0 until n).foreach { i =>
            if (2 * i + 1 < nums.length) {
              val objNum = nums(2 * i).toInt
              val off = nums(2 * i + 1).toInt
              if (!objs.contains(objNum) && first + off < data.length) {
                val lex = new PdfLexer(data, first + off)
                objs(objNum) = lex.parseObject()
              }
            }
          }
        } catch { case _: Exception => () }
      case _ => ()
    }
    objs.toMap
  }

  /** If `lex` (positioned just after a parsed dict) sits on a `stream`
    * keyword, the payload's [dataStart, dataEnd) span: trust /Length when
    * `endstream` confirms it, else scan. `lex.pos` afterwards is
    * unspecified — callers save/restore. */
  private def streamSpanAt(bytes: Array[Byte], view: String, lex: PdfLexer,
                           d: PDict, lengths: Int => Option[Int]): Option[(Int, Int)] = {
    if (lex.keyword() != "stream") None
    else {
      // EOL after 'stream': CRLF or LF
      if (lex.pos < bytes.length && bytes(lex.pos) == '\r') lex.pos += 1
      if (lex.pos < bytes.length && bytes(lex.pos) == '\n') lex.pos += 1
      val dataStart = lex.pos
      val len = d.m.get("Length") match {
        case Some(PNum(v)) => Some(v.toInt)
        case Some(PRef(n, _)) => lengths(n)
        case _ => None
      }
      val dataEnd = len match {
        case Some(l) if dataStart + l <= bytes.length &&
          endstreamNear(view, dataStart + l) => dataStart + l
        case _ => // untrusted length: scan
          val idx = view.indexOf("endstream", dataStart)
          if (idx < 0) dataStart
          else trimEol(bytes, dataStart, idx)
      }
      Some((dataStart, dataEnd))
    }
  }

  private def endstreamNear(view: String, at: Int): Boolean = {
    val windowEnd = math.min(view.length, at + 4)
    view.indexOf("endstream", math.max(0, at - 2)) match {
      case -1 => false
      case i => i <= windowEnd
    }
  }

  private def trimEol(bytes: Array[Byte], start: Int, end: Int): Int = {
    var e = end
    if (e > start && bytes(e - 1) == '\n') e -= 1
    if (e > start && bytes(e - 1) == '\r') e -= 1
    e
  }

  def resolve(o: Obj, lookup: Int => Option[Obj], depth: Int = 0): Obj = o match {
    case PRef(n, _) if depth < 32 =>
      resolve(lookup(n).getOrElse(PNull), lookup, depth + 1)
    case other => other
  }

  /** Apply the stream's filter chain. Unsupported filter => exception
    * (caller skips the stream). */
  def decodeStream(s: PStream, lookup: Int => Option[Obj]): Array[Byte] = {
    val d = s.dict.m
    val filters: Seq[String] = resolve(d.getOrElse("Filter", PNull), lookup) match {
      case PName(n) => Seq(n)
      case PArr(items) => items.map { case PName(n) => n; case _ => "" }
      case _ => Nil
    }
    val parms: Seq[Map[String, Obj]] =
      resolve(d.getOrElse("DecodeParms", PNull), lookup) match {
        case PDict(p) => Seq(p)
        case PArr(items) => items.map {
          case pd: PDict => pd.m
          case r: PRef => resolve(r, lookup) match {
            case PDict(p) => p; case _ => Map.empty[String, Obj]
          }
          case _ => Map.empty[String, Obj]
        }
        case _ => Nil
      }
    filters.zipWithIndex.foldLeft(s.raw) { case (data, (f, i)) =>
      val p = parms.lift(i).getOrElse(Map.empty)
      f match {
        case "FlateDecode" | "Fl" => predictor(inflate(data), p, lookup)
        case "ASCIIHexDecode" | "AHx" => asciiHex(data)
        case "ASCII85Decode" | "A85" => ascii85(data)
        case "" => data
        case other => throw new UnsupportedOperationException(s"filter $other")
      }
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** PNG predictors (10-15): per-row filter byte + Sub/Up/Average/Paeth. */
  private def predictor(data: Array[Byte], p: Map[String, Obj],
                        lookup: Int => Option[Obj]): Array[Byte] = {
    val pred = resolve(p.getOrElse("Predictor", PNum(1)), lookup) match {
      case PNum(v) => v.toInt; case _ => 1
    }
    if (pred < 10) return data // 1 = none; 2 (TIFF) unused in practice
    val columns = resolve(p.getOrElse("Columns", PNum(1)), lookup) match {
      case PNum(v) => v.toInt; case _ => 1
    }
    val colors = resolve(p.getOrElse("Colors", PNum(1)), lookup) match {
      case PNum(v) => v.toInt; case _ => 1
    }
    val bpc = resolve(p.getOrElse("BitsPerComponent", PNum(8)), lookup) match {
      case PNum(v) => v.toInt; case _ => 8
    }
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = columns * colors * bpc / 8
    val out = new java.io.ByteArrayOutputStream(data.length)
    val prev = new Array[Byte](rowLen)
    var r = 0
    while ((r + 1) * (rowLen + 1) <= data.length) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val row = java.util.Arrays.copyOfRange(data,
        r * (rowLen + 1) + 1, (r + 1) * (rowLen + 1))
      var i = 0
      while (i < rowLen) {
        val a = if (i >= bpp) row(i - bpp) & 0xff else 0
        val b = prev(i) & 0xff
        val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
        val x = row(i) & 0xff
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => x
        }
        row(i) = (v & 0xff).toByte
        i += 1
      }
      out.write(row)
      System.arraycopy(row, 0, prev, 0, rowLen)
      r += 1
    }
    out.toByteArray
  }

  private def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i)
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  private def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var tuple = 0L
    var count = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && count == 0) out.write(Array[Byte](0, 0, 0, 0))
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) {
          out.write(((tuple >> 24) & 0xff).toInt); out.write(((tuple >> 16) & 0xff).toInt)
          out.write(((tuple >> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; count = 0
        }
      }
      i += 1
    }
    if (count > 1) { // partial group
      var t = tuple
      (count until 5).foreach(_ => t = t * 85 + 84)
      val bytes = Array(((t >> 24) & 0xff).toByte, ((t >> 16) & 0xff).toByte,
        ((t >> 8) & 0xff).toByte, (t & 0xff).toByte)
      out.write(bytes, 0, count - 1)
    }
    out.toByteArray
  }

  /** Page dicts in document order: catalog walk, else file-order scan. */
  def pages(objs: Map[Int, Obj]): Seq[PDict] = {
    val lookup = objs.get _
    def walk(o: Obj, visited: Set[Int], acc: mutable.ArrayBuffer[PDict]): Unit =
      resolve(o, lookup) match {
        case d @ PDict(m) => m.get("Type") match {
          case Some(PName("Page")) => acc += d
          case _ => m.get("Kids") match {
            case Some(kids) => resolve(kids, lookup) match {
              case PArr(items) => items.foreach {
                case r @ PRef(n, _) if !visited.contains(n) =>
                  walk(r, visited + n, acc)
                case r @ PRef(_, _) => () // cycle
                case child => walk(child, visited, acc)
              }
              case _ => ()
            }
            case None => ()
          }
        }
        case _ => ()
      }
    val catalog = objs.values.collectFirst {
      case d @ PDict(m) if m.get("Type").contains(PName("Catalog")) => d
    }
    val acc = mutable.ArrayBuffer[PDict]()
    catalog.flatMap(_.m.get("Pages")).foreach(walk(_, Set.empty, acc))
    if (acc.nonEmpty) acc.toSeq
    else objs.toSeq.sortBy(_._1).collect {
      case (_, d @ PDict(m)) if m.get("Type").contains(PName("Page")) => d
    }
  }

  /** Concatenated decoded content streams of one page. */
  def pageContent(page: PDict, objs: Map[Int, Obj]): Array[Byte] = {
    val lookup = objs.get _
    val streams: Seq[PStream] = resolve(page.m.getOrElse("Contents", PNull), lookup) match {
      case s: PStream => Seq(s)
      case PArr(items) => items.flatMap(o => resolve(o, lookup) match {
        case s: PStream => Some(s); case _ => None
      })
      case _ => Nil
    }
    val out = new java.io.ByteArrayOutputStream()
    streams.foreach { s =>
      try { out.write(decodeStream(s, lookup)); out.write('\n') }
      catch { case _: Exception => () } // unsupported filter: skip stream
    }
    out.toByteArray
  }

  /** Font-name → decoder for one page. /Resources is an inheritable
    * page-tree attribute, so absent on the page it resolves up the
    * /Parent chain. Fonts WITHOUT a usable /ToUnicode and without an
    * Identity CID encoding get no decoder — their strings keep the
    * legacy UTF-16BE/PDFDoc byte decoding. */
  def pageFonts(page: PDict, objs: Map[Int, Obj]): Map[String, FontDecoder] = {
    val lookup = objs.get _
    def resources(d: PDict, depth: Int): Option[PDict] =
      resolve(d.m.getOrElse("Resources", PNull), lookup) match {
        case r: PDict => Some(r)
        case _ if depth < 32 =>
          resolve(d.m.getOrElse("Parent", PNull), lookup) match {
            case p: PDict => resources(p, depth + 1)
            case _ => None
          }
        case _ => None
      }
    val fontDict: Map[String, Obj] = resources(page, 0)
      .map(r => resolve(r.m.getOrElse("Font", PNull), lookup))
      .collect { case fd: PDict => fd.m }
      .getOrElse(Map.empty)
    fontDict.flatMap { case (name, fo) =>
      resolve(fo, lookup) match {
        case PDict(f) =>
          val isType0 = f.get("Subtype").contains(PName("Type0"))
          val identityEnc = resolve(f.getOrElse("Encoding", PNull), lookup) match {
            case PName(e) => e.startsWith("Identity")
            case _ => false
          }
          val defaultLen = if (isType0) 2 else 1
          resolve(f.getOrElse("ToUnicode", PNull), lookup) match {
            case s: PStream =>
              try Some(name -> ToUnicodeCMap.parse(decodeStream(s, lookup), defaultLen))
              catch { case _: Exception => None }
            case _ if isType0 && identityEnc =>
              // Identity-H/V, no CMap: 2-byte codes, code-as-char fallback
              Some(name -> new FontDecoder(Nil, 2, Map.empty))
            case _ => None
          }
        case _ => None
      }
    }
  }

  /** PDF text-string bytes -> String: UTF-16BE on BOM, else
    * PDFDocEncoding (≈ Latin-1 for the printable range). */
  def decodeTextString(b: Array[Byte]): String = {
    val s =
      if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
        new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
      else new String(b, StandardCharsets.ISO_8859_1)
    s.filter(c => c >= ' ' || c == '\n' || c == '\t')
  }

  /** Run the content stream's text operators. `fonts` (from
    * [[pageFonts]]) routes shown strings through the active font's
    * ToUnicode decoder; text state (Tf) persists across BT/ET per spec. */
  def extractText(content: Array[Byte],
                  fonts: Map[String, FontDecoder] = Map.empty): String = {
    val lex = new PdfLexer(content, 0)
    val stack = mutable.ArrayBuffer[Obj]()
    val out = new StringBuilder
    var lastY: Option[Double] = None
    var curFont: Option[FontDecoder] = None
    def newline(): Unit =
      if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
    def show(o: Obj): Unit = o match {
      case PStr(b) => out.append(curFont match {
        case Some(fd) => fd.decode(b)
        case None => decodeTextString(b)
      })
      case _ => ()
    }
    while (!lex.atEnd) {
      lex.skipWs()
      if (!lex.atEnd) {
        val b = lex.peekByte()
        if (b == '/' || b == '(' || b == '<' || b == '[' ||
          b == '+' || b == '-' || b == '.' || (b >= '0' && b <= '9')) {
          stack += lex.parseObject()
        } else {
          val op = lex.keyword()
          if (op.isEmpty) lex.pos += 1
          else op match {
            case "BT" => lastY = None; stack.clear()
            case "ET" => newline(); stack.clear()
            case "Tj" => stack.lastOption.foreach(show); stack.clear()
            case "'" => newline(); stack.lastOption.foreach(show); stack.clear()
            case "\"" => newline(); stack.lastOption.foreach(show); stack.clear()
            case "TJ" =>
              stack.lastOption.foreach {
                case PArr(items) => items.foreach {
                  case s: PStr => show(s)
                  // kerning gap of >= 1/10 em reads as an inter-word space
                  case PNum(n) if n < -100 =>
                    if (out.nonEmpty && !out.endsWith(" ") && !out.endsWith("\n"))
                      out.append(' ')
                  case _ => ()
                }
                case _ => ()
              }
              stack.clear()
            case "Td" | "TD" =>
              if (stack.length >= 2) stack.last match {
                case PNum(ty) if ty != 0.0 => newline()
                case _ => ()
              }
              stack.clear()
            case "T*" => newline(); stack.clear()
            case "Tf" =>
              stack.collectFirst { case PName(n) => n }
                .foreach(n => curFont = fonts.get(n))
              stack.clear()
            case "Tm" =>
              if (stack.length >= 6) stack.last match {
                case PNum(ty) =>
                  if (lastY.exists(y => math.abs(y - ty) > 0.5)) newline()
                  lastY = Some(ty)
                case _ => ()
              }
              stack.clear()
            case _ => stack.clear() // any other operator consumes operands
          }
        }
      }
    }
    out.toString
  }
}

/** The production default: parse + walk + extract, page by page. */
class JvmPdfExtractor extends PdfExtractor {
  override def extract(bytes: Array[Byte]): (Int, Seq[(Int, String)]) =
    try {
      val objs = PdfParser.parseObjects(bytes)
      val pgs = PdfParser.pages(objs)
      val texts = pgs.zipWithIndex.map { case (p, i) =>
        val t = try {
          val fonts = try PdfParser.pageFonts(p, objs)
          catch { case _: Exception => Map.empty[String, FontDecoder] }
          PdfParser.extractText(PdfParser.pageContent(p, objs), fonts)
        } catch { case _: Exception => "" }
        (i + 1, t)
      }
      (pgs.length, texts)
    } catch {
      case _: Exception => (0, Nil)
    }
}
