package graft

import org.apache.spark.sql.functions._
import graft.operators.HtmlOps

/** HTML extraction ([[HtmlOps]]): tag/script/entity handling on hostile
  * fixtures, word-preserving roundtrip through the synthetic page, and
  * the density rule's keep/rescue/drop behavior.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): (String, Long) = {
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val r = HtmlOps.extractText(df, col("doc_id"), col("html"))
      .collect().head
    (r.getString(1), r.getAs[Long]("n_lines"))
  }

  test("script bodies, styles, tags and entities are handled") {
    val html =
      "<html><head><script>if (a </script>" + // lone '<' inside script
        "<style>p { x: 1 }</style></head><body>" +
        "<p>keep &lt;p&gt; literal &amp; tight</p>" +
        "<div>two\t spaced   words</div>" +
        "<p>a&nbsp;b</p></body></html>"
    val (text, n) = extract(html)
    assert(text === "keep <p> literal & tight\ntwo spaced words\na b")
    assert(n === 3L)
  }

  test("non-greedy script drop does not eat intervening content") {
    val html = "<script>x</script><p>alive</p><script>y</script>"
    assert(extract(html)._1 === "alive")
  }

  test("doubly-escaped entities decode exactly one level ('&amp;' last)") {
    // '&amp;lt;' is the TEXT '&lt;' — decoding '&amp;' first would
    // re-interpret the output and collapse it to '<' (r12 ADVICE item).
    val (text, _) = extract("<p>&amp;lt; and &amp;amp; stay text</p>")
    assert(text === "&lt; and &amp; stay text")
  }

  test("roundtrip: every word of the original doc survives extraction") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val wrapped = docs.withColumn("html",
      HtmlOps.wrapHtml(col("doc_id"), col("text")))
    val out = HtmlOps.extractText(wrapped, col("doc_id"), col("html"))
      .join(docs, col("did") === col("doc_id"))
    // body words = clean text minus the boilerplate lines; compare sets
    val bad = out.where(!expr(
      """forall(split(text, ' '),
        |  w -> array_contains(split(replace(text_clean, chr(10), ' '), ' '), w))"""
        .stripMargin)).count()
    assert(bad === 0L)
  }

  test("density rule keeps paragraphs, drops nav/title/footer, rescues") {
    // 11 words: para1 = 8 words, para2 = 3 words (rescued next to para1)
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    val df = Seq((7L, text)).toDF("doc_id", "text")
      .withColumn("html", HtmlOps.wrapHtml(col("doc_id"), col("text")))
    val r = HtmlOps.extractContent(df, col("doc_id"), col("html"))
      .collect().head
    assert(r.getAs[String]("content") === "w1 w2 w3 w4 w5 w6 w7 w8\nw9 w10 w11")
    assert(r.getAs[Long]("n_kept") === 2L)
    // nav + title + 2 paras + footer
    assert(r.getAs[Long]("n_total") === 5L)

    // 9 words: 1-word tail para is below the rescue floor
    val df2 = Seq((8L, "a1 a2 a3 a4 a5 a6 a7 a8 a9")).toDF("doc_id", "text")
      .withColumn("html", HtmlOps.wrapHtml(col("doc_id"), col("text")))
    val r2 = HtmlOps.extractContent(df2, col("doc_id"), col("html"))
      .collect().head
    assert(r2.getAs[String]("content") === "a1 a2 a3 a4 a5 a6 a7 a8")
    assert(r2.getAs[Long]("n_kept") === 1L)
  }
}
