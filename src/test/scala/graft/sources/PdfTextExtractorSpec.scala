package graft.sources

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Builds real, spec-conformant PDFs byte-by-byte (valid xref tables,
  * Flate streams, object streams) and golden-tests extraction. */
object PdfFixtures {

  private val L1 = StandardCharsets.ISO_8859_1

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Assemble numbered objects (bodies WITHOUT "N 0 obj"/"endobj") into
    * a full PDF with a correct (per-object-subsection) xref table. */
  def assembleNumbered(bodies: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(L1))
    w("%PDF-1.5\n%âãÏÓ\n")
    val offsets = bodies.map { case (n, b) =>
      val off = out.size()
      w(s"$n 0 obj\n"); out.write(b); w("\nendobj\n")
      n -> off
    }
    val xrefOff = out.size()
    w("xref\n0 1\n0000000000 65535 f \n")
    offsets.foreach { case (n, o) => w(f"$n 1\n$o%010d 00000 n \n") }
    w(s"trailer\n<< /Size ${offsets.map(_._1).max + 1} /Root 1 0 R >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  def assemble(bodies: Seq[Array[Byte]]): Array[Byte] =
    assembleNumbered(bodies.zipWithIndex.map { case (b, i) => (i + 1, b) })

  def streamObj(dict: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"<< $dict /Length ${data.length} >>\nstream\n".getBytes(L1))
    out.write(data)
    out.write("\nendstream".getBytes(L1))
    out.toByteArray
  }

  /** Two-page PDF; page 1 content Flate-compressed, page 2 plain.
    * Covers Tj escapes, hex strings, TJ kerning, ', Td line breaks. */
  def twoPage(): Array[Byte] = {
    val content1 =
      """BT
        |/F1 12 Tf
        |72 720 Td
        |(Hello \(PDF\) world!) Tj
        |0 -14 Td
        |[(Kerned) -250 (words) -50 (joined)] TJ
        |0 -14 Td
        |<48657820737472696E67> Tj
        |ET""".stripMargin.getBytes(L1)
    val content2 =
      """BT
        |72 720 Td
        |(Second page line one.) Tj
        |(continued on same line) Tj
        |(next line via quote) '
        |ET""".stripMargin.getBytes(L1)
    assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(L1),
      "<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>".getBytes(L1),
      "<< /Type /Page /Parent 2 0 R /Contents 5 0 R /MediaBox [0 0 612 792] >>".getBytes(L1),
      "<< /Type /Page /Parent 2 0 R /Contents 6 0 R /MediaBox [0 0 612 792] >>".getBytes(L1),
      streamObj("/Filter /FlateDecode", deflate(content1)),
      streamObj("", content2)))
  }

  /** One page showing text in an Identity-H subset-embedded Type0 font
    * with a /ToUnicode CMap. The 2-byte codes are subset glyph ids with
    * NO relation to Unicode — correct extraction MUST route through the
    * CMap. Covers bfchar, string-form bfrange (incrementing last code
    * unit), array-form bfrange, a multi-char ligature target, and
    * /Resources inherited from the /Pages node via /Parent. */
  def identityHToUnicode(): Array[Byte] = {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def
        |/CMapName /Adobe-Identity-UCS def
        |/CMapType 2 def
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |3 beginbfchar
        |<0003> <0048>
        |<0010> <0065>
        |<0030> <006600660069>
        |endbfchar
        |2 beginbfrange
        |<0020> <0022> <006C>
        |<0040> <0041> [<006F> <0057>]
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end
        |end""".stripMargin.getBytes(L1)
    // H=0003 e=0010 l=0020 (range start) o=0040 (array form) W=0041 ffi=0030
    val content =
      "BT /F1 12 Tf <00030010002000200040> Tj <0041> Tj <0030> Tj ET".getBytes(L1)
    assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(L1),
      ("<< /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/Resources << /Font << /F1 5 0 R >> >> >>").getBytes(L1),
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(L1),
      streamObj("/Filter /FlateDecode", deflate(content)),
      ("<< /Type /Font /Subtype /Type0 /BaseFont /ABCDEF+Fake " +
        "/Encoding /Identity-H /ToUnicode 6 0 R >>").getBytes(L1),
      streamObj("/Filter /FlateDecode", deflate(cmap))))
  }

  /** Simple (1-byte) subset font whose codes mean Greek letters only via
    * the /ToUnicode CMap: 'A'→Ω via bfchar, 'B'→Α via bfrange. */
  def simpleFontToUnicode(): Array[Byte] = {
    val cmap =
      """begincmap
        |1 begincodespacerange
        |<00> <FF>
        |endcodespacerange
        |1 beginbfchar
        |<41> <03A9>
        |endbfchar
        |1 beginbfrange
        |<42> <43> <0391>
        |endbfrange
        |endcmap""".stripMargin.getBytes(L1)
    val content = "BT /G1 10 Tf (AB) Tj ET".getBytes(L1)
    assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(L1),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(L1),
      ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /G1 5 0 R >> >> >>").getBytes(L1),
      streamObj("", content),
      ("<< /Type /Font /Subtype /TrueType /BaseFont /GHIJKL+Fake " +
        "/ToUnicode 6 0 R >>").getBytes(L1),
      streamObj("", cmap)))
  }

  /** Identity-H Type0 font with NO /ToUnicode: 2-byte codes fall back to
    * code-as-BMP-char (exact for Identity-mapped full fonts). */
  def identityHNoCMap(): Array[Byte] = {
    val content = "BT /F1 12 Tf <00480065006C006C006F> Tj ET".getBytes(L1)
    assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(L1),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(L1),
      ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R >> >> >>").getBytes(L1),
      streamObj("", content),
      ("<< /Type /Font /Subtype /Type0 /BaseFont /Fake " +
        "/Encoding /Identity-H >>").getBytes(L1)))
  }

  /** PDF 1.5-style: catalog/pages/page dicts live inside a Flate object
    * stream (ObjStm); content stream is a direct object. No classic xref
    * entries for the compressed objects — exercises the ObjStm path. */
  def objStm(): Array[Byte] = {
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"
    val bodies = Seq(1 -> o1, 2 -> o2, 3 -> o3)
    val offs = bodies.scanLeft(0)((acc, b) => acc + b._2.length + 1).init
    val header = bodies.zip(offs).map { case ((n, _), o) => s"$n $o" }.mkString(" ")
    val payload = bodies.map(_._2).mkString("\n") + "\n"
    val full = header + "\n" + payload
    val content = "BT 72 720 Td (From an object stream.) Tj ET".getBytes(L1)
    // objects 1..3 exist ONLY inside the ObjStm, as in a real 1.5 file
    assembleNumbered(Seq(
      4 -> streamObj(
        s"/Type /ObjStm /N 3 /First ${header.length + 1} /Filter /FlateDecode",
        deflate(full.getBytes(L1))),
      5 -> streamObj("", content)))
  }
}

class PdfTextExtractorSpec extends AnyFunSuite {

  private val ex = new JvmPdfExtractor

  test("two-page golden extraction: flate + plain, escapes, hex, TJ, quote") {
    val (n, pages) = ex.extract(PdfFixtures.twoPage())
    assert(n === 2)
    val p1 = pages.head._2
    assert(p1.contains("Hello (PDF) world!"))
    // TJ: -250 (>= 1/10 em) becomes a space; -50 does not
    assert(p1.contains("Kerned wordsjoined"))
    assert(p1.contains("Hex string"))
    // Td with ty=-14 breaks lines
    assert(p1.linesIterator.toSeq.count(_.nonEmpty) === 3)
    val p2 = pages(1)._2
    assert(p2.contains("Second page line one.continued on same line"))
    // ' starts a new line before showing
    assert(p2.linesIterator.toSeq.contains("next line via quote"))
  }

  test("object-stream (PDF 1.5) documents parse via ObjStm expansion") {
    val (n, pages) = ex.extract(PdfFixtures.objStm())
    assert(n === 1)
    assert(pages.head._2.contains("From an object stream."))
  }

  test("stream /Length given as an indirect reference resolves") {
    val content = "BT (Indirect length works.) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val pdf = PdfFixtures.assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(StandardCharsets.ISO_8859_1),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(StandardCharsets.ISO_8859_1),
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(StandardCharsets.ISO_8859_1),
      (s"<< /Length 5 0 R >>\nstream\n".getBytes(StandardCharsets.ISO_8859_1) ++
        content ++ "\nendstream".getBytes(StandardCharsets.ISO_8859_1)),
      s"${content.length}".getBytes(StandardCharsets.ISO_8859_1)))
    val (n, pages) = ex.extract(pdf)
    assert(n === 1)
    assert(pages.head._2.contains("Indirect length works."))
  }

  test("UTF-16BE strings decode; control bytes are stripped") {
    val txt = "Unicode: äöü €"
    val utf16 = Array[Byte](0xfe.toByte, 0xff.toByte) ++
      txt.getBytes(StandardCharsets.UTF_16BE)
    val hex = utf16.map(b => f"${b & 0xff}%02x").mkString
    val content = s"BT <$hex> Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val pdf = PdfFixtures.assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(StandardCharsets.ISO_8859_1),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(StandardCharsets.ISO_8859_1),
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(StandardCharsets.ISO_8859_1),
      PdfFixtures.streamObj("", content)))
    assert(ex.extract(pdf)._2.head._2.contains(txt))
  }

  test("Identity-H subset font with /ToUnicode CMap extracts real text") {
    val (n, pages) = ex.extract(PdfFixtures.identityHToUnicode())
    assert(n === 1)
    // bfchar + string bfrange (l from range start) + array bfrange (o, W)
    assert(pages.head._2.contains("HelloW"))
    // multi-char ligature target: one code -> "ffi"
    assert(pages.head._2.contains("ffi"))
  }

  test("simple 1-byte font with /ToUnicode maps codes the raw bytes would mislead") {
    val (n, pages) = ex.extract(PdfFixtures.simpleFontToUnicode())
    assert(n === 1)
    // 'A' (0x41) -> Ω via bfchar; 'B' (0x42) -> Α via bfrange — NOT "AB"
    assert(pages.head._2.contains("ΩΑ"))
    assert(!pages.head._2.contains("AB"))
  }

  test("Identity-H without /ToUnicode falls back to code-as-char") {
    val (n, pages) = ex.extract(PdfFixtures.identityHNoCMap())
    assert(n === 1)
    assert(pages.head._2.contains("Hello"))
  }

  test("ToUnicodeCMap parses widths, ranges, and caps malformed range size") {
    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0000> <FFFFFFFF> <0041>
        |endbfrange
        |endcmap""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    // malformed hi (4 bytes vs 2) is dropped by the lo.length == hi.length
    // guard — parse must neither throw nor OOM
    val fd = ToUnicodeCMap.parse(cmap, 2)
    assert(fd.decode(Array[Byte](0x00, 0x48)) === "H") // identity fallback
  }

  test("garbage and truncated inputs return (0, Nil), never throw") {
    assert(ex.extract("not a pdf at all".getBytes) === ((0, Seq())))
    assert(ex.extract(Array.empty[Byte]) === ((0, Seq())))
    val truncated = PdfFixtures.twoPage().take(80)
    val (n, _) = ex.extract(truncated)
    assert(n === 0)
  }

  test("'N G obj' bytes inside a stream payload do not overwrite real objects") {
    // object 4 is the real content stream; object 5's PAYLOAD contains
    // the bytes "4 0 obj (junk) endobj" — an uncompressed stand-in for a
    // Flate body that happens to contain an object header. Last-wins
    // without span tracking would replace object 4 with the junk and
    // extract an empty page.
    val content = "BT 72 720 Td (Real content survives.) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    val junkPayload = "noise noise 4 0 obj\n(junk)\nendobj more noise"
      .getBytes(StandardCharsets.ISO_8859_1)
    val pdf = PdfFixtures.assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(StandardCharsets.ISO_8859_1),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(StandardCharsets.ISO_8859_1),
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(StandardCharsets.ISO_8859_1),
      PdfFixtures.streamObj("", content),
      PdfFixtures.streamObj("", junkPayload)))
    val objs = PdfParser.parseObjects(pdf)
    assert(objs(4).isInstanceOf[PdfCos.PStream])
    val (n, pages) = ex.extract(pdf)
    assert(n === 1)
    assert(pages.head._2.contains("Real content survives."))
  }

  test("ASCII85 and ASCIIHex filter chains decode") {
    // ASCIIHex over the content bytes
    val content = "BT (Hex filtered.) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val hexed = (content.map(b => f"${b & 0xff}%02x").mkString + ">")
      .getBytes(StandardCharsets.ISO_8859_1)
    val pdf = PdfFixtures.assemble(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>".getBytes(StandardCharsets.ISO_8859_1),
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>".getBytes(StandardCharsets.ISO_8859_1),
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>".getBytes(StandardCharsets.ISO_8859_1),
      PdfFixtures.streamObj("/Filter /ASCIIHexDecode", hexed)))
    assert(ex.extract(pdf)._2.head._2.contains("Hex filtered."))
  }

  test("PNG Up predictor reverses on a flate stream") {
    // raw rows: 3 columns, values row0=[1,2,3], row1=[4,5,6]
    // Up-predicted: row0 filter=2 deltas vs zero prev = [1,2,3];
    // row1 deltas = [3,3,3]
    val predicted = Array[Byte](2, 1, 2, 3, 2, 3, 3, 3)
    val flated = PdfFixtures.deflate(predicted)
    import PdfCos._
    val s = PStream(PDict(Map(
      "Filter" -> PName("FlateDecode"),
      "DecodeParms" -> PDict(Map("Predictor" -> PNum(12), "Columns" -> PNum(3))))),
      flated)
    val out = PdfParser.decodeStream(s, _ => None)
    assert(out.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
  }
}
