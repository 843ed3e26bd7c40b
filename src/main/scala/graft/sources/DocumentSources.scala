package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PDF extraction behind a trait (reference S1 shells out to pypdf —
  * an environment liability isolated here per SURVEY.md §7.3). The
  * engine-side contract is `bytes -> per-page text`; the default is the
  * pure-JVM [[JvmPdfExtractor]] (see [[PdfParser]] for its honest scope);
  * deployments can swap a heavier codec (pdfbox, per-partition
  * subprocess) through the same trait. [[FakePdfExtractor]] remains for
  * plumbing tests that want text-as-bytes fixtures. */
trait PdfExtractor extends Serializable {
  /** @return (pageCount, Seq[(page, text)]) */
  def extract(bytes: Array[Byte]): (Int, Seq[(Int, String)])
}

/** Deterministic stand-in: interprets the bytes as text and splits
  * "pages" on form-feed characters — enough to exercise the full
  * ingest pipeline (chunking, ids, embeddings) without a PDF codec. */
class FakePdfExtractor extends PdfExtractor {
  override def extract(bytes: Array[Byte]): (Int, Seq[(Int, String)]) = {
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val pages = text.split("\f", -1).toSeq
    (pages.length, pages.zipWithIndex.map { case (t, i) => (i + 1, t) })
  }
}

/** File discovery + routing + format sniffing (reference S3/S4/F8). */
object DocumentSources {

  /** F8: extension-based routing. */
  def fileTypeFor(path: String): String =
    if (path.toLowerCase(java.util.Locale.ROOT).matches(".*\\.(md|markdown)$")) "markdown" else "pdf"

  /** Reference MARKDOWN_INDICATORS (cli.ts:82-96): content sniffing on
    * the first 4096 bytes when the extension is inconclusive. */
  private val markdownIndicators = Seq(
    "(?m)^#{1,6}\\s", "(?m)^[-*+]\\s", "(?m)^\\d+\\.\\s",
    "(?m)^```", "(?m)^\\|.+\\|", "(?m)\\[.+\\]\\(.+\\)").map(_.r)

  def looksLikeMarkdown(content: String): Boolean = {
    val peek = content.take(4096)
    markdownIndicators.exists(_.findFirstIn(peek).isDefined)
  }

  def hasMarkdownExtension(url: String): Boolean = {
    val pathname = try new java.net.URI(url).getPath catch { case _: Exception => url }
    val p = Option(pathname).getOrElse(url).toLowerCase(java.util.Locale.ROOT)
    p.endsWith(".md") || p.endsWith(".markdown")
  }

  /** S4: recursive discovery of ingestable files as a binaryFile scan —
    * at scale this is a distributed listing + splittable read, and the
    * already-ingested filter is a left_anti join (J11), not a driver
    * Set. */
  def discover(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{pdf,md,markdown}")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("length").as("sizeBytes"), col("content"))

  def notYetIngested(discovered: DataFrame, documents: DataFrame): DataFrame =
    discovered.join(documents.select("path"), Seq("path"), "left_anti")
}

/** S3: URL fetch + routing (reference cli.ts:358-408 `downloadFile`).
  * Driver-side by design — `add <url>` is a one-document operation; bulk
  * ingest goes through [[DocumentSources.discover]]. Supports http(s)
  * via the JDK client and file:// for offline/test use. */
object UrlSource {

  final case class UnsupportedContentType(url: String, contentType: String)
    extends RuntimeException(s"Unsupported content type: '$contentType' for $url")

  /** @return (bytes, content-type header or "" when absent/file) */
  def fetch(url: String, timeoutMs: Long = 30000L): (Array[Byte], String) = {
    val uri = java.net.URI.create(url)
    uri.getScheme match {
      case "file" =>
        (java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(uri)), "")
      case "http" | "https" =>
        val client = java.net.http.HttpClient.newBuilder()
          .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
          .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
          .build()
        val req = java.net.http.HttpRequest.newBuilder(uri)
          .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(s"HTTP ${resp.statusCode()} fetching $url")
        (resp.body(), resp.headers().firstValue("content-type").orElse(""))
      case other =>
        throw new IllegalArgumentException(s"unsupported URL scheme: $other")
    }
  }

  /** Reference routing order: PDF by MIME/extension (plus the %PDF-
    * magic, needed for typeless file:// fetches), then markdown by
    * explicit MIME or extension, then the text/plain content-sniffing
    * fallback. Anything else is rejected, matching the reference. */
  def route(url: String, contentType: String, bytes: Array[Byte]): String = {
    val magic = bytes.take(5).map(_.toChar).mkString
    if (contentType.contains("pdf") || url.endsWith(".pdf") || magic == "%PDF-")
      "pdf"
    else if (contentType.contains("text/markdown") ||
      contentType.contains("text/x-markdown") ||
      DocumentSources.hasMarkdownExtension(url))
      "markdown"
    else if (contentType.contains("text/plain") || contentType.isEmpty) {
      val preview = new String(bytes.take(4096),
        java.nio.charset.StandardCharsets.UTF_8)
      if (DocumentSources.looksLikeMarkdown(preview)) "markdown"
      else throw UnsupportedContentType(url, contentType)
    } else throw UnsupportedContentType(url, contentType)
  }
}
