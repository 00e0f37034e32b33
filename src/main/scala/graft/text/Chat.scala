package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversational (SFT/chat) transcript validation — the structural
  * gate an instruction-tuning pipeline runs before a chat template is
  * ever rendered: a transcript must start with a user turn, strictly
  * alternate user/assistant, end on the assistant (that's the turn
  * the loss trains on), carry no unknown roles and no empty turns.
  * The census also measures the assistant-token fraction — the share
  * of tokens that actually receive loss under completion-only
  * masking, the number that decides whether a source is worth its
  * storage.
  *
  * Wire format here is the flat "role: content | role: content"
  * rendering; the parse is a pure column expression (split +
  * higher-order functions — no UDF, fused into the scan), and every
  * check is engine-portable, so the whole validator replays in the
  * DuckDB oracle. 100 TB shape: per-row projection, only the
  * (id, flags, counts) census ever leaves the scan.
  */
object Chat {

  val TurnSep = " | "
  val RoleSep = ": "

  /** Parse a transcript into an array<struct<role, content>>. */
  def parseTurns(transcript: Column): Column =
    transform(split(transcript, java.util.regex.Pattern.quote(TurnSep)),
      t => struct(
        split_part(t, lit(RoleSep), lit(1)).as("role"),
        split_part(t, lit(RoleSep), lit(2)).as("content")))

  /** Per-transcript structural census: one row per input row with
    * turn counts, the four structural flags, the overall verdict, and
    * the completion-masking token accounting. */
  def turnCensus(df: DataFrame, id: Column, transcript: Column): DataFrame = {
    val turns = parseTurns(transcript)
    def tokens(c: Column) = size(split(c, "\\s+"))
    df.select(id.as("id"), turns.as("turns"))
      .select(col("id"),
        size(col("turns")).cast("long").as("n_turns"),
        (element_at(col("turns"), 1).getField("role") === "user")
          .as("starts_user"),
        forall(col("turns"), t =>
          t.getField("role").isin("user", "assistant")).as("roles_ok"),
        forall(
          zip_with(
            slice(col("turns"), lit(1),
              greatest(size(col("turns")) - 1, lit(0))),
            slice(col("turns"), lit(2),
              greatest(size(col("turns")) - 1, lit(0))),
            (a, b) => a.getField("role") =!= b.getField("role")),
          x => x).as("alternates"),
        (element_at(col("turns"), -1).getField("role") === "assistant")
          .as("ends_assistant"),
        forall(col("turns"), t => length(t.getField("content")) > 0)
          .as("contents_ok"),
        aggregate(col("turns"), lit(0L), (acc, t) =>
          acc + when(t.getField("role") === "assistant",
            tokens(t.getField("content")).cast("long")).otherwise(lit(0L)))
          .as("n_assistant_tokens"),
        aggregate(col("turns"), lit(0L), (acc, t) =>
          acc + tokens(t.getField("content")).cast("long"))
          .as("n_total_tokens"))
      .select(col("id"), col("n_turns"), col("starts_user"),
        col("roles_ok"), col("alternates"), col("ends_assistant"),
        col("contents_ok"),
        col("n_assistant_tokens"), col("n_total_tokens"),
        expr("n_assistant_tokens * 1000000 div greatest(n_total_tokens, 1)")
          .as("assistant_frac_micro"),
        (col("n_turns") >= 2 && col("starts_user") && col("roles_ok") &&
          col("alternates") && col("ends_assistant") && col("contents_ok"))
          .as("valid"))
  }
}
