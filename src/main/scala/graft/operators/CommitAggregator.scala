package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.Model

/** Typed commit reassembly — the exact streaming fold of the reference's
  * AggregateCommitBlock.AppendBlock (/root/reference/src/
  * One.Inception.EventStore.Cassandra/AggregateCommitBlock.cs:33-76), as a
  * Spark `Aggregator` over a typed Dataset.
  *
  * The untyped formulation (EventStoreOps.reassembleCommits) is the default
  * — it stays in Catalyst and codegen. This one exists for exact
  * fold-semantics parity (expected-position counter, not sorted-index
  * classification) and as the typed-API surface the reference's
  * `EventStream` consumers would use.
  */
object CommitAggregator {

  case class EventRow(idB64: String, rev: Int, pos: Int, ts: Long, data: Array[Byte])
  case class RawEvt(pos: Int, data: Array[Byte])
  case class Commit(rev: Int, ts: Long, events: Seq[RawEvt], publicEvents: Seq[RawEvt])

  /** Buffer = raw rows of one aggregate (same memory class as
    * collect_list; use aggregateStreamsSorted for pathological sizes). */
  type Buf = Seq[(Int, Int, Long, Array[Byte])]

  val aggregator: Aggregator[EventRow, Buf, Seq[Commit]] =
    new Aggregator[EventRow, Buf, Seq[Commit]] {
      def zero: Buf = Vector.empty
      def reduce(b: Buf, e: EventRow): Buf = b :+ ((e.rev, e.pos, e.ts, e.data))
      def merge(a: Buf, b: Buf): Buf = a ++ b
      def finish(buf: Buf): Seq[Commit] = {
        // the reference folds rows already ordered (rev, pos); establish
        // that order, then run the same expected-position classification
        val sorted = buf.sortBy(r => (r._1, r._2))
        sorted.groupBy(_._1).toSeq.sortBy(_._1).map { case (rev, rows) =>
          val ts = rows.head._3
          var expected = 0
          val priv = Vector.newBuilder[RawEvt]
          val pub = Vector.newBuilder[RawEvt]
          rows.foreach { case (_, pos, _, data) =>
            if (pos == expected) { priv += RawEvt(pos, data); expected += 1 }
            else pub += RawEvt(pos, data) // pos jumped by PublicEventsOffset
          }
          Commit(rev, ts, priv.result(), pub.result())
        }
      }
      def bufferEncoder: Encoder[Buf] = implicitly(Encoders.kryo[Buf])
      def outputEncoder: Encoder[Seq[Commit]] = implicitly(Encoders.kryo[Seq[Commit]])
    }

  /** E7 `LoadAsync` typed surface: per-aggregate `EventStream`s.
    * Keys are base64 of the binary id (Array[Byte] has no value equality
    * for grouping). */
  def eventStreams(events: DataFrame): Dataset[(String, Seq[Commit])] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("id", "rev", "pos", "ts", "data")
      .map { r =>
        EventRow(
          java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]]("id")),
          r.getAs[Int]("rev"), r.getAs[Int]("pos"), r.getAs[Long]("ts"),
          r.getAs[Array[Byte]]("data"))
      }
      .groupByKey(_.idB64)
      .agg(aggregator.toColumn.name("commits"))
  }
}
