package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The serializer boundary (SURVEY.md §F "UDF/UDAF surface"): the
  * reference's only user-extensible compute is the pluggable `ISerializer`
  * applied to the opaque `data` payload
  * (/root/reference/src/One.Inception.EventStore.Cassandra/
  * ICassandraEventStoreSettings.cs:6, CassandraEventStore.cs:75,211).
  *
  * The engine keeps payloads opaque everywhere (exactly like the
  * reference); decode happens only at this boundary, and for the common
  * JSON case it is the codegen'd `from_json` expression — not a UDF — so
  * the decode participates in pruning/codegen like any other column.
  */
object SerdeOps {

  /** Decode binary/string JSON payloads into typed columns.
    * `schemaDDL` e.g. "k BIGINT, name STRING". */
  def decodeJson(events: DataFrame, schemaDDL: String, payloadCol: String = "data"): DataFrame =
    events.withColumn("payload",
      from_json(col(payloadCol).cast("string"), org.apache.spark.sql.types.StructType.fromDDL(schemaDDL)))

  /** Encode selected columns back into a JSON payload (the write-side
    * serializer). */
  def encodeJson(df: DataFrame, payload: Column*): Column =
    to_json(struct(payload: _*))

  /** Envelope wire format magic. */
  val EnvelopeMagic = "GB1"

  /** Second serializer at the same seam: a binary PASS-THROUGH envelope
    * (the schema-registry wire-format pattern — magic + schema id header,
    * then the payload bytes verbatim, never interpreted). Header is a
    * fixed 7 ASCII bytes — "GB1" + zero-padded 4-digit schema id — so the
    * byte arithmetic is reproducible in any SQL engine (no endianness, no
    * hex). This is what the reference's pluggable `ISerializer` reduces to
    * when the codec is not JSON: the store moves byte[] it cannot read,
    * and readers dispatch on the envelope's schema id
    * (ICassandraEventStoreSettings.cs:6 — the serializer is settings-
    * injected, one per deployment, identified only by its output bytes). */
  def encodeEnvelope(payload: Column, schemaId: Column): Column =
    concat(
      lit(EnvelopeMagic).cast("binary"),
      lpad(schemaId.cast("string"), 4, "0").cast("binary"),
      payload.cast("binary"))

  def encodeEnvelope(payload: Column, schemaId: Int): Column =
    encodeEnvelope(payload, lit(schemaId))

  /** Decode the envelope into `struct(schema_id INT, payload BINARY)`.
    * Bytes without a complete, well-formed header — wrong/short magic, or a
    * header whose 4 id bytes are not digits (the encoder always writes
    * zero-padded digits) — get a NULL schema_id and pass through unchanged,
    * the caller's dead-letter/legacy route; nothing is ever dropped or
    * mutated at this boundary. In particular a short magic-prefixed record
    * like "GB1x" (< 7 header bytes) is malformed, not an envelope: it takes
    * the pass-through route with its bytes intact rather than being
    * truncated to an empty payload. A 7-byte envelope (empty payload) is
    * valid — encodeEnvelope(empty, id) round-trips. */
  def decodeEnvelope(data: Column): Column = {
    val bin = data.cast("binary")
    val isEnv = (length(bin) >= 7) &&
      (substring(bin, 1, 3).cast("string") === EnvelopeMagic) &&
      substring(bin, 4, 4).cast("string").rlike("^[0-9]{4}$")
    struct(
      when(isEnv, substring(bin, 4, 4).cast("string").cast("int")).as("schema_id"),
      when(isEnv, bin.substr(lit(8), length(bin) - 7)).otherwise(bin).as("payload"))
  }
}
