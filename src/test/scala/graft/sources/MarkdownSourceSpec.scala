package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's MarkdownExtractor behavioral cases
  * (MarkdownExtractor.test.ts:109-348,447-571). */
class MarkdownSourceSpec extends AnyFunSuite {

  test("frontmatter: full yaml") {
    val md = "---\ntitle: My Doc\ndescription: About things\ntags: [ai, rust]\n---\n# Body\ntext"
    val fm = MarkdownSource.parseFrontmatter(md)
    assert(fm.title === Some("My Doc"))
    assert(fm.description === Some("About things"))
    assert(fm.tags === Seq("ai", "rust"))
  }

  test("frontmatter: dashed tag list and quoted values") {
    val md = "---\ntitle: \"Quoted Title\"\ntags:\n  - one\n  - two\n---\nbody"
    val fm = MarkdownSource.parseFrontmatter(md)
    assert(fm.title === Some("Quoted Title"))
    assert(fm.tags === Seq("one", "two"))
  }

  test("frontmatter: none / malformed never throws") {
    assert(MarkdownSource.parseFrontmatter("# Just a doc").title === None)
    assert(MarkdownSource.parseFrontmatter("---\n:::bad yaml::\n---\nx").title === None)
  }

  test("frontmatter passthrough of extra fields") {
    val fm = MarkdownSource.parseFrontmatter("---\ntitle: T\nauthor: Someone\n---\n")
    assert(fm.extra.get("author") === Some("Someone"))
  }

  test("sections: mixed heading levels delimit sections") {
    val md = "# One\nalpha\n## Two\nbeta\n### Three\ngamma"
    val ss = MarkdownSource.sections(md)
    assert(ss.map(_.heading) === Seq("One", "Two", "Three"))
    assert(ss.map(_.headingLevel) === Seq(1, 2, 3))
    assert(ss.map(_.section) === Seq(1, 2, 3))
    assert(ss(1).text === "beta")
  }

  test("sections: no headings -> whole doc is section 1") {
    val ss = MarkdownSource.sections("just some text\nacross lines")
    assert(ss.size === 1)
    assert(ss.head.section === 1)
    assert(ss.head.heading === "")
  }

  test("sections: content before first heading becomes its own section") {
    val ss = MarkdownSource.sections("preamble text\n# First\nbody")
    assert(ss.size === 2)
    assert(ss.head.heading === "")
    assert(ss.head.text === "preamble text")
  }

  test("sections: # inside code fence is not a heading") {
    val md = "# Real\n```bash\n# comment not heading\necho hi\n```\ntail"
    val ss = MarkdownSource.sections(md)
    assert(ss.size === 1)
    assert(ss.head.text.contains("# comment not heading"))
  }

  test("sections: frontmatter is skipped") {
    val ss = MarkdownSource.sections("---\ntitle: X\n---\n# H\nbody")
    assert(ss.map(_.heading) === Seq("H"))
  }

  test("CRLF input works") {
    val ss = MarkdownSource.sections("# A\r\nline\r\n# B\r\nmore")
    assert(ss.size === 2)
  }

  test("title resolution: frontmatter > H1 > fallback") {
    assert(MarkdownSource.resolveTitle("---\ntitle: FM\n---\n# H1\n", "fb") === "FM")
    assert(MarkdownSource.resolveTitle("# H1 Title\nbody", "fb") === "H1 Title")
    assert(MarkdownSource.resolveTitle("plain text only", "fb") === "fb")
  }

  test("extractChunks: page = section ordinal, contiguous chunk indexes") {
    val md = "# S1\n" + ("first section words here. " * 30) +
      "\n# S2\n" + ("second section other words. " * 30)
    val out = MarkdownSource.extractChunks(md)
    assert(out.map(_._2) === out.indices)
    assert(out.map(_._1).distinct === Seq(1, 2))
  }
}
