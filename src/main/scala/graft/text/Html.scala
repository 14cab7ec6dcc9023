package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction: the web-corpus front door.
  *
  * Reference scope: the reference pipeline ingests ready-made text
  * (channel descriptions, transcripts); a production web corpus starts
  * one step earlier, at raw HTML (WET-style extraction — what
  * trafilatura/jusText do before any of the text gates in
  * `TextAnalysis` can run). This implements the deterministic core of
  * that step as a pure column chain:
  *
  *   1. drop `<script>` / `<style>` elements wholesale (content and
  *      all — visible text never lives there);
  *   2. drop HTML comments;
  *   3. turn block-level closers (`</p>`, `</div>`, `</li>`, `</tr>`,
  *      `</h1..6>`, `</title>`) and `<br>` into newlines so paragraph
  *      structure survives tag removal;
  *   4. strip every remaining tag;
  *   5. decode the five entities that dominate real pages (`&lt;`
  *      `&gt;` `&quot;` `&#39;` `&nbsp;`), then `&amp;` LAST so
  *      double-encoded text decodes one level per pass, like a real
  *      entity decoder;
  *   6. collapse horizontal whitespace, tighten blank-line runs to at
  *      most one blank line, trim.
  *
  * Every step is a codegen'd `regexp_replace`/`replace` projection —
  * zero shuffle, embarrassingly parallel, exactly what you want for a
  * 100 TB crawl where extraction is the first (and widest) stage.
  *
  * Regex portability: patterns stay inside the RE2 ∩ java.util.regex
  * common subset (inline `(?is)` flags, non-greedy `.*?`, character
  * classes; NO lookahead/backreferences), so the DuckDB oracle replays
  * the identical chain with the identical patterns.
  */
object Html {

  /** Tag-stripping pipeline, steps 1-4. Kept separate so callers can
    * inspect the pre-entity-decode form.
    */
  def stripTags(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle  = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val noCmt    = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val blockNl  = regexp_replace(
      noCmt, "(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/title)[^>]*>", "\n")
    regexp_replace(blockNl, "<[^>]*>", "")
  }

  /** Entity decode, step 5: the high-frequency five plus `&amp;` last. */
  def decodeEntities(text: Column): Column = {
    val a = regexp_replace(text, "&lt;", "<")
    val b = regexp_replace(a, "&gt;", ">")
    val c = regexp_replace(b, "&quot;", "\"")
    val d = regexp_replace(c, "&#39;", "'")
    val e = regexp_replace(d, "&nbsp;", " ")
    regexp_replace(e, "&amp;", "&")
  }

  /** Whitespace normalization, step 6. Edge strip is regex (spaces AND
    * newlines), not `trim` — `trim` is space-only in both engines and
    * would leave a leading newline from the first block tag.
    */
  def normalizeExtracted(text: Column): Column = {
    val hz    = regexp_replace(text, "[ \t\r]+", " ")
    val edges = regexp_replace(hz, " ?\n ?", "\n")
    val tight = regexp_replace(edges, "\n{3,}", "\n\n")
    regexp_replace(tight, "^[\n ]+|[\n ]+$", "")
  }

  /** The full extraction chain. */
  def htmlToText(html: Column): Column =
    normalizeExtracted(decodeEntities(stripTags(html)))

  /** All `href` targets in document order — the link-graph feeder
    * (see `ops.LinkGraph`). Double-quoted attributes only (the
    * canonicalized-crawl form); single-quoted/bare attrs are a
    * pre-canonicalization concern.
    */
  def extractHrefs(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))
}
