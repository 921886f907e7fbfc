package graft.operators

/** Resumable-paging token codec, mirroring the reference's PagingInfo
  * (/root/reference/src/One.Inception.EventStore.Cassandra/PagingInfo.cs:54-91:
  * base64-wrapped JSON carrying the paging position).
  *
  * Spark needs no opaque server paging state — the keyset (rev, pos) IS the
  * position (EventStoreOps.loadWithPaging) — so the token is just that pair,
  * base64-JSON-encoded for API-level parity with the reference's contract
  * (callers can persist it across crashes and resume mid-aggregate).
  */
object PagingToken {

  case class Token(rev: Int, pos: Int, hasMore: Boolean = true)

  def encode(t: Token): String = {
    val json = s"""{"rev":${t.rev},"pos":${t.pos},"hasMore":${t.hasMore}}"""
    java.util.Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))
  }

  private val TokenRe =
    """\{"rev":(-?\d+),"pos":(-?\d+),"hasMore":(true|false)\}""".r

  def decode(s: String): Option[Token] =
    try {
      new String(java.util.Base64.getDecoder.decode(s), "UTF-8") match {
        case TokenRe(r, p, h) => Some(Token(r.toInt, p.toInt, h.toBoolean))
        case _ => None
      }
    } catch { case _: IllegalArgumentException => None }
}
