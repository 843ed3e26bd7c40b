package graft.sources

import graft.{Library, SparkSpec}
import java.nio.file.Files

class DocumentSourcesSpec extends SparkSpec {

  test("markdown sniffing heuristics (reference MARKDOWN_INDICATORS)") {
    import DocumentSources._
    assert(looksLikeMarkdown("# A Heading\ntext"))
    assert(looksLikeMarkdown("some\n- list item"))
    assert(looksLikeMarkdown("1. ordered"))
    assert(looksLikeMarkdown("```\ncode\n```"))
    assert(looksLikeMarkdown("| a | b |"))
    assert(looksLikeMarkdown("see [link](http://x)"))
    assert(!looksLikeMarkdown("plain prose with nothing special at all"))
    assert(hasMarkdownExtension("https://x.test/notes/readme.md"))
    assert(hasMarkdownExtension("weird//no-scheme.markdown"))
    assert(!hasMarkdownExtension("https://x.test/file.pdf"))
  }

  test("extension routing (F8)") {
    assert(DocumentSources.fileTypeFor("/a/b.md") === "markdown")
    assert(DocumentSources.fileTypeFor("/a/b.MARKDOWN") === "markdown")
    assert(DocumentSources.fileTypeFor("/a/b.pdf") === "pdf")
  }

  test("directory ingest: discovery, routing, dedup, export (S1/S4/S12)") {
    val srcDir = Files.createTempDirectory("graft-src")
    Files.writeString(srcDir.resolve("notes.md"),
      "# Notes\n" + ("markdown words for the chunker to process. " * 10))
    Files.writeString(srcDir.resolve("paper.pdf"),
      ("page one text with enough words to survive chunk filters. " * 5) +
        "\f" + ("page two text also has plenty of words in it here. " * 5))
    Files.writeString(srcDir.resolve("ignored.txt"), "not ingestable")

    val wh = Files.createTempDirectory("graft-wh-ing").toString
    val lib = new Library(spark, wh)
    lib.ingestDirectory(srcDir.toString)

    val docs = lib.documents.collect()
    assert(docs.length === 2) // .txt excluded by the glob
    val byType = docs.map(d => d.getAs[String]("fileType") -> d).toMap
    assert(byType("markdown").getAs[String]("title") === "Notes")
    assert(byType("pdf").getAs[String]("title") === "Paper")
    assert(byType("pdf").getAs[Int]("pageCount") === 2)
    // fake-pdf pages flow through with real page numbers
    val pdfId = byType("pdf").getAs[String]("id")
    val pages = lib.chunks.filter(s"docId = '$pdfId'")
      .collect().map(_.getAs[Int]("page")).toSet
    assert(pages === Set(1, 2))
    val (nd, nc, ne) = lib.stats()
    assert(nc === ne)

    // idempotent re-ingest
    lib.ingestDirectory(srcDir.toString)
    assert(lib.stats() === ((nd, nc, ne)))

    // export produces a readable warehouse copy
    val dest = Files.createTempDirectory("graft-exp").toString
    lib.exportTo(dest)
    val copy = new Library(spark, dest)
    assert(copy.stats() === ((nd, nc, ne)))
    assert(copy.search("markdown words").count() > 0)
  }
}
