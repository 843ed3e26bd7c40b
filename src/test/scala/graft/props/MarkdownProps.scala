package graft.props

import graft.sources.MarkdownSource
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Sectioner invariants: numbering, coverage, fence-safety — the
  * properties that keep chunk identity stable (SURVEY §7.3). */
object MarkdownProps extends Properties("MarkdownSource") {

  private val line: Gen[String] = Gen.oneOf(
    Gen.const("plain prose line with words"),
    Gen.const("# Heading One"),
    Gen.const("## Sub Heading"),
    Gen.const("- a list item"),
    Gen.const("```"),
    Gen.const("code inside maybe"),
    Gen.const(""))
  private val doc: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, line)).map(_.mkString("\n"))

  property("section ordinals are 1..n in order") = forAll(doc) { d =>
    val ss = MarkdownSource.sections(d)
    ss.map(_.section) == (1 to ss.length)
  }

  property("non-blank content always yields at least one section") =
    forAll(doc) { d =>
      d.trim.isEmpty || MarkdownSource.sections(d).nonEmpty
    }

  property("deterministic") = forAll(doc) { d =>
    MarkdownSource.sections(d) == MarkdownSource.sections(d)
  }

  property("heading text never contains the # marker") = forAll(doc) { d =>
    MarkdownSource.sections(d).forall(!_.heading.startsWith("#"))
  }

  property("extractChunks indexes are contiguous from 0") = forAll(doc) { d =>
    val idx = MarkdownSource.extractChunks(d).map(_._2)
    idx == idx.indices.toList.map(identity)
  }

  property("frontmatter block never leaks into section text") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty), doc) { (title, body) =>
      val md = s"---\ntitle: $title\nsecretkey: hidden$title\n---\n$body"
      MarkdownSource.sections(md).forall(!_.text.contains(s"secretkey"))
    }
}
