package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chat-template rendering — the SFT/instruction-tuning data-prep op:
  * flatten a conversation (array of (role, content) turns) into the
  * single training string a tokenizer consumes, AND emit the
  * character spans of each turn's content so the trainer can build
  * loss masks (assistant spans train, user/system spans mask out).
  * The sentinel layout is ChatML-shaped (`<|role|>content<|end|>`
  * after a `<|sys|>` preamble); any concrete template is the same
  * fold with different literals.
  *
  * One per-row `aggregate` HOF fold — offsets accumulate with the
  * string, so spans are correct by construction (and the span-extract
  * face in the oracle proves it). Zero shuffle; at 100 TB this is a
  * scan-speed projection like the FIM/span-corruption transforms.
  */
object ChatTemplate {

  private val End = "<|end|>"

  /** Render `turnsCol` (array<struct<role string, content string>>)
    * into (idCol, prompt, spans) where spans is
    * array<struct<role, s, e>> — [s, e) char offsets of each turn's
    * CONTENT inside prompt (0-based).
    */
  def renderChat(
      df: DataFrame,
      idCol: String,
      turnsCol: String,
      sysPrompt: String
  ): DataFrame = {
    val init = struct(
      lit(s"<|sys|>$sysPrompt$End").as("p"),
      array().cast("array<struct<role:string,s:bigint,e:bigint>>").as("sp"))
    val folded = aggregate(
      col(turnsCol),
      init,
      (acc, t) => {
        val role = t.getField("role")
        // a null content would null the whole fold — treat as empty
        val content = coalesce(t.getField("content"), lit(""))
        val header = concat(lit("<|"), role, lit("|>"))
        val s = (length(acc.getField("p")) + length(header)).cast("long")
        val e = s + length(content).cast("long")
        struct(
          concat(acc.getField("p"), header, content, lit(End)).as("p"),
          concat(acc.getField("sp"),
            array(struct(role.as("role"), s.as("s"), e.as("e")))).as("sp"))
      })
    df.select(col(idCol), folded.getField("p").as("prompt"),
      folded.getField("sp").as("spans"))
  }

  /** Concatenated content of every span with `role`, EXTRACTED from
    * the prompt by offsets — the loss-mask view. Equality with the
    * directly-joined contents is the offsets-correctness proof the
    * oracle face checks.
    */
  def roleSpanText(prompt: Column, spans: Column, role: String): Column =
    array_join(
      transform(
        filter(spans, x => x.getField("role") === role),
        x => prompt.substr((x.getField("s") + 1L).cast("int"),
          (x.getField("e") - x.getField("s")).cast("int"))),
      "")
}
