package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Instruction-tuning (chat) data curation: schema validation, contract
  * checks, and flattening for conversation-shaped records — the
  * gatekeeper a supervised-fine-tuning pipeline runs before packing
  * dialogues into training sequences. A malformed conversation (roles
  * out of order, empty turns, truncated before the assistant reply)
  * silently degrades an SFT run; these checks make each violation a
  * named, countable verdict instead.
  *
  * All checks are pure column expressions over the parsed message array
  * (whole-stage codegen, map-only, no shuffle); the `CASE` chain
  * evaluates lazily per row, so array accesses are only reached under
  * the guards that make them safe.
  */
object Chat {

  /** Message-array schema: `array<struct<role: string, content: string>>`. */
  val MessagesSchema = "array<struct<role: string, content: string>>"

  /** Parse a JSON conversation column (`[{"role": ..., "content": ...},
    * ...]`) into the typed message array [[chatChecks]] consumes.
    * Malformed JSON yields NULL (Spark `from_json` semantics), which
    * [[chatChecks]] reports as `not_parsed`.
    */
  def parseChat(jsonCol: Column): Column =
    from_json(jsonCol, org.apache.spark.sql.types.DataType.fromDDL(MessagesSchema)
      .asInstanceOf[org.apache.spark.sql.types.ArrayType])

  /** Validate conversations against the standard SFT contract and
    * flatten the valid ones. Per row: `n_turns`, `valid`, `issue` (the
    * FIRST violated rule, NULL when valid), and `chat_text`
    * (`role: content` lines joined by newlines — NULL unless valid).
    *
    * Rules, in report order:
    *   1. `not_parsed` — the message array itself is NULL
    *   2. `empty` — zero turns
    *   3. `bad_first_role` — first role is neither `system` nor `user`
    *   4. `role_alternation` — after an optional leading system turn,
    *      roles must read user, assistant, user, assistant, ... (a
    *      system-only conversation violates this too)
    *   5. `empty_content` — any turn with blank content
    *   6. `no_assistant_end` — the last turn is not the assistant's
    *
    * 100 TB shape: map-only; violations aggregate with one shuffle of
    * the (issue, count) table if the caller rolls them up.
    */
  def chatChecks(df: DataFrame, idCols: Seq[String], msgsCol: String): DataFrame = {
    val m = col(msgsCol)
    val n = size(m)
    val roles = transform(m, x => x.getField("role"))
    val body = when(get(roles, lit(0)) === "system",
      slice(m, lit(2), greatest(n - 1, lit(0)))).otherwise(m)
    // 0-based transform index: even positions expect user, odd assistant
    val altFlags = transform(body, (x, i) =>
      x.getField("role") =!= when(pmod(i, lit(2)) === 0, lit("user"))
        .otherwise(lit("assistant")))
    val issue = when(m.isNull, "not_parsed")
      .when(n === 0, "empty")
      .when(!get(roles, lit(0)).isin("system", "user"), "bad_first_role")
      .when(size(body) === 0 || array_contains(altFlags, true), "role_alternation")
      .when(exists(m, x => length(trim(x.getField("content"))) === 0), "empty_content")
      .when(get(roles, n - 1) =!= "assistant", "no_assistant_end")
    val chatText = when(issue.isNull,
      array_join(transform(m,
        x => concat(x.getField("role"), lit(": "), x.getField("content"))), "\n"))
    df.select(idCols.map(col) ++ Seq(
      coalesce(n, lit(0)).cast("long").as("n_turns"),
      issue.isNull.as("valid"),
      issue.as("issue"),
      chatText.as("chat_text")): _*)
  }
}
