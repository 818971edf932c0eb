package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document ingest — the interchange format every public training
  * corpus ships in (one JSON object per line: Dolma, C4 dumps, The Pile
  * manifests). Companion to [[JsonIngest]] (the reference's wire format)
  * on the documents side of the house.
  *
  * Design: `spark.read.json` with an EXPLICIT schema (never inference —
  * at 100 TB a schema-inference pass is a full extra scan) in PERMISSIVE
  * mode with a corrupt-record capture column. Validation is a predicate,
  * so ingest is one codegen'd pass; invalid rows land in a quarantine
  * frame as DATA (inspect/count/re-parse), not exceptions that kill a
  * 10-hour job. Missing optional metadata defaults deterministically;
  * a missing id is content-derived (hash of text + intra-batch sequence
  * among byte-identical rows) so re-ingesting a batch is idempotent.
  */
object JsonlDocs {

  private val CORRUPT = "__corrupt"

  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField(CORRUPT, StringType)))

  final case class Result(good: DataFrame, bad: DataFrame)

  /** Read newline-delimited JSON documents from `path`. Rows must carry a
    * non-empty `text`; `lang`/`source` default to "unk"; `id` defaults to
    * a content-derived hash.
    */
  def read(spark: SparkSession, path: String): Result =
    fromParsed(spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CORRUPT)
      .json(path))

  /** Same contract over an already-read `(line STRING)` frame (tests,
    * streaming). `passthrough` columns of the input survive into `good`
    * (e.g. an event-time column for a streaming watermark). `idFallback`
    * overrides the missing-id default — REQUIRED on a streaming frame,
    * where the batch default (a row_number window) is unsupported; use a
    * content+time hash there.
    */
  def fromLines(lines: DataFrame, passthrough: Seq[String] = Nil,
                idFallback: Option[org.apache.spark.sql.Column] = None): Result =
    fromParsed(lines
      .select(Seq(from_json(col("line"), schema).as("p"), col("line")) ++
        passthrough.map(col): _*)
      // from_json nulls every field on malformed input; recover the raw
      // line for the quarantine frame whenever text didn't parse
      .select(Seq(col("p.id").as("id"), col("p.text").as("text"),
        col("p.lang").as("lang"), col("p.source").as("source"),
        when(col("p.text").isNull, col("line")).as(CORRUPT)) ++
        passthrough.map(col): _*),
      passthrough, idFallback)

  private def fromParsed(parsed: DataFrame, passthrough: Seq[String] = Nil,
                         idFallback: Option[org.apache.spark.sql.Column] = None): Result = {
    val bad = parsed.filter(col(CORRUPT).isNotNull ||
        col("text").isNull || length(col("text")) === 0)
      .select(coalesce(col(CORRUPT), to_json(struct(col("id"), col("text"),
        col("lang"), col("source")))).as("raw"))
    // batch default id: content hash + intra-batch sequence among
    // same-text rows (idempotent re-ingest, duplicates kept distinct).
    // The sequence is computed ONLY over id-null rows (explicit-id rows
    // partition separately, so they don't occupy ranks) and ordered by
    // the remaining row fields — a batch mixing explicit and missing ids,
    // or same-text rows with different lang/source, yields the same
    // doc_ids run-to-run; rows identical in ALL fields are
    // interchangeable, so any rank assignment gives the same id multiset
    val defaultId = xxhash64(col("text"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("text"), col("id").isNotNull)
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first))
        .cast("long"))
    val good = parsed.filter(col(CORRUPT).isNull &&
        col("text").isNotNull && length(col("text")) > 0)
      .select(Seq(
        coalesce(col("id"), idFallback.getOrElse(defaultId)).as("doc_id"),
        col("text"),
        coalesce(col("lang"), lit("unk")).as("lang"),
        coalesce(col("source"), lit("unk")).as("source"),
        length(col("text")).cast("long").as("n_chars")) ++
        passthrough.map(col): _*)
    Result(good, bad)
  }
}
