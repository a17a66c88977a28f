package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ingest-edge envelope — the engine form of the reference's O1
  * HTTP→Firehose request template
  * (`/root/reference/serverless_datalake/serverless_datalake_stack.py:194-203`):
  * the raw JSON body is base64-encoded into
  * `{"DeliveryStreamName": <stream>, "Record": {"Data": <b64>}}` and
  * unwrapped again at the delivery stream.
  *
  * Both directions are single codegen'd expressions (`base64` /
  * `unbase64` / `from_json` built-ins) — an ingest edge can wrap, a
  * bronze reader can unwrap, at any parallelism.
  */
object Envelope {

  /** Wrap a raw JSON payload column for a named per-source stream. */
  def wrap(payload: Column, streamName: Column): Column =
    to_json(struct(
      streamName.as("DeliveryStreamName"),
      struct(base64(payload.cast("binary")).as("Data")).as("Record")))

  private val envelopeSchema = "STRUCT<DeliveryStreamName: STRING, Record: STRUCT<Data: STRING>>"

  /** Unwrap: recover (stream, payload) from an envelope column. */
  def unwrap(envelope: Column): (Column, Column) = {
    val parsed = from_json(envelope, org.apache.spark.sql.types.DataType
      .fromDDL(envelopeSchema).asInstanceOf[org.apache.spark.sql.types.StructType])
    (parsed.getField("DeliveryStreamName"),
      unbase64(parsed.getField("Record").getField("Data")).cast("string"))
  }

  /** Unwrap a whole DataFrame of envelopes into (source, json) rows. */
  def unwrapAll(envelopes: DataFrame, envelopeCol: String): DataFrame = {
    val (src, payload) = unwrap(col(envelopeCol))
    envelopes.select(src.as("source"), payload.as("json"))
  }
}
