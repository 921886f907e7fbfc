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
}
