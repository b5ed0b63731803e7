package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the first stage of every web-crawl
  * pipeline (CCNet, RefinedWeb, Gopher/MassiveWeb all begin here). Two
  * operators:
  *
  *  - [[extractText]]: structural markup → clean line-split text. Script
  *    and style subtrees are dropped whole, block-closing tags become
  *    line breaks (so DOM blocks become text lines), remaining tags are
  *    stripped, the common HTML entities are decoded LAST (so a literal
  *    `&lt;p&gt;` in content cannot be eaten by the tag stripper), and
  *    whitespace is normalized per line.
  *  - [[extractContent]]: line-density boilerplate removal in the spirit
  *    of Kohlschütter et al., "Boilerplate Detection using Shallow Text
  *    Features" (WSDM 2010): long lines are content; short lines survive
  *    only adjacent to content (caption/closing-sentence rescue);
  *    navigation, titles and footers fall out.
  *
  * Everything is per-row column arithmetic (regex chains + one per-doc
  * line window) — no corpus-wide state, embarrassingly parallel at any
  * scale. Regexes stay inside the RE2-compatible subset (`(?s)`, `(?i)`,
  * non-greedy `.*?`) so the DuckDB oracle runs the same patterns.
  *
  * The test corpus is plain text, so [[wrapHtml]] synthesizes a
  * deterministic page around each doc (nav + title + script + 8-word
  * paragraphs + footer) — the media-corpus precedent: synthesis and
  * operator are separately mirrored in SQL, and the composition is the
  * registered query.
  */
object HtmlOps {

  private val BlockCloseRe =
    "(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol|/table|/blockquote)[^>]*>"
  private val ScriptStyleRe = "(?s)(?i)<(script|style)[^>]*>.*?</(script|style)>"
  private val TagRe = "<[^>]*>"

  /** The tag-strip + entity-decode + line-normalize chain on a raw HTML
    * column, yielding an ARRAY of non-empty trimmed lines. */
  def textLines(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptStyleRe, "")
    val withBreaks = regexp_replace(noScript, BlockCloseRe, "\n")
    val noTags = regexp_replace(withBreaks, TagRe, "")
    // '&amp;' decodes LAST (the standard order): decoding it first would
    // re-interpret its output, turning a doubly-escaped literal like
    // '&amp;lt;' into '<' instead of the intended text '&lt;'.
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val lines = transform(split(decoded, "\n"),
      l => trim(regexp_replace(l, "[ \\t\\r]+", " ")))
    filter(lines, l => length(l) > 0)
  }

  /** Clean text per doc: `(did, text_clean, n_lines)` — lines joined by
    * newline after [[textLines]]. */
  def extractText(docs: DataFrame, id: Column, html: Column): DataFrame =
    docs.select(id.as("did"), textLines(html).as("ls"))
      .select(col("did"),
        concat_ws("\n", col("ls")).as("text_clean"),
        size(col("ls")).cast("long").as("n_lines"))

  /** Per-line keep flags for the density rule over a LINE ARRAY — a pure
    * array-HOF computation (the neighbor lookups are `get` on the
    * per-row word-count array), so content extraction never explodes or
    * shuffles: one row in, one row out, and the same column works
    * unchanged in a streaming plan where the lag/lead window form
    * would be rejected. */
  def contentKeepFlags(lines: Column, minWords: Int, rescueWords: Int)
      : Column = {
    val wcs = transform(lines, l => size(split(l, " ")))
    when(size(lines) > 0,
      transform(sequence(lit(0), size(lines) - 1), i => {
        val wc = get(wcs, i)
        val prev = coalesce(get(wcs, i - 1), lit(0))
        val nxt = coalesce(get(wcs, i + 1), lit(0))
        wc >= minWords ||
          (wc >= rescueWords && (prev >= minWords || nxt >= minWords))
      })).otherwise(array().cast("array<boolean>"))
  }

  /** Density-based content extraction: a line is content when it has
    * ≥ `minWords` words, or ≥ `rescueWords` words next to a long
    * neighbor. Returns `(did, content, n_kept, n_total)` — fully
    * row-local (no explode, no window, zero exchanges). */
  def extractContent(docs: DataFrame, id: Column, html: Column,
      minWords: Int = 6, rescueWords: Int = 3): DataFrame = {
    // per-doc line split + keep-flag walk are row-local and heavy;
    // spread a tiny single-split scan first (no-op at scale)
    val base = Fanout.spread(docs)
      .select(id.as("did"), textLines(html).as("ls"))
      .withColumn("ks", contentKeepFlags(col("ls"), minWords, rescueWords))
    val keptLines = filter(
      zip_with(col("ls"), col("ks"), (l, k) => when(k, l)),
      l => l.isNotNull)
    base.select(
      col("did"),
      concat_ws("\n", keptLines).as("content"),
      size(filter(col("ks"), k => k)).cast("long").as("n_kept"),
      size(col("ls")).cast("long").as("n_total"))
  }

  /** Deterministic synthetic page around a plain-text doc: nav (with an
    * entity), title, a script the extractor must drop, the body split
    * into 8-word paragraphs, and a short footer. */
  def wrapHtml(id: Column, text: Column): Column = {
    val ws = split(text, " ")
    val paras = transform(
      sequence(lit(0), floor((size(ws) - lit(1)) / lit(8)).cast("int")),
      i => concat(lit("<p>"),
        concat_ws(" ", slice(ws, i * lit(8) + 1, lit(8))), lit("</p>")))
    concat(
      lit("<html><head><script>var a = 1; if (a < 2) { a = 3; }</script>" +
        "<style>.x { color: red }</style></head><body>" +
        "<div id=\"nav\">Home &amp; About | Contact</div><h1>Doc "),
      id.cast("string"),
      lit("</h1>"),
      concat_ws("", paras),
      lit("<div class=\"footer\">Copyright 2026</div></body></html>"))
  }

  /** DuckDB twin of [[wrapHtml]] over `did` and `ws = string_split(text,
    * ' ')`. */
  def wrapHtmlSql: String =
    """'<html><head><script>var a = 1; if (a < 2) { a = 3; }</script>' ||
      |'<style>.x { color: red }</style></head><body>' ||
      |'<div id="nav">Home &amp; About | Contact</div><h1>Doc ' ||
      |CAST(did AS VARCHAR) || '</h1>' ||
      |array_to_string(list_transform(
      |  generate_series(0, (len(ws) - 1) // 8),
      |  i -> '<p>' || array_to_string(ws[i*8+1:i*8+8], ' ') || '</p>'),
      |  '') ||
      |'<div class="footer">Copyright 2026</div></body></html>'"""
      .stripMargin

  /** DuckDB twin of [[textLines]] over a column expression `html`:
    * the non-empty trimmed line list. */
  def textLinesSql(html: String): String =
    s"""list_filter(list_transform(
       |  string_split(
       |    replace(replace(replace(replace(replace(replace(
       |      regexp_replace(regexp_replace(regexp_replace($html,
       |        '$ScriptStyleRe', '', 'g'),
       |        '$BlockCloseRe', chr(10), 'g'),
       |        '$TagRe', '', 'g'),
       |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |      '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
       |    chr(10)),
       |  l -> trim(regexp_replace(l, '[ \\t\\r]+', ' ', 'g'))),
       |l -> length(l) > 0)""".stripMargin
}
