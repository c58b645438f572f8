package graft.mr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal dynamic-JSON helpers for the MR core — the analogue of the
  * reference's schema-on-read `*simplejson.Json` records
  * (/root/reference/mrproto/protocol.go:17-42). Jackson ships inside the
  * Spark distribution, so this adds no dependency.
  *
  * All helpers are total: malformed input yields None, mirroring the
  * reference's skip-and-count (never fatal) posture
  * (/root/reference/mrproto/protocol.go:32-35).
  */
object Json {
  @transient private lazy val mapper = new ObjectMapper

  def parse(s: String): Option[JsonNode] =
    try {
      val n = mapper.readTree(s)
      if (n == null) None else Some(n)
    } catch { case _: Exception => None }

  /** Top-level object keys, in document order — what the flagship mapper
    * explodes (/root/reference/example/example_mr.go:31-43).
    */
  def topLevelKeys(s: String): Option[Seq[String]] =
    parse(s).filter(_.isObject).map(_.fieldNames.asScala.toSeq)

  /** JSON-encode a value (string quoting matches encoding/json, which the
    * reference uses for output keys/values,
    * /root/reference/mrproto/protocol.go:233-239).
    */
  def encode(v: Any): String = mapper.writeValueAsString(v)

  /** Lenient int64 read of a JSON value — the `Sum` reducer's coercion
    * (`.Int64()`, /root/reference/mrproto/protocol.go:343-350): integral
    * numbers pass, everything else is a skip.
    */
  def asLong(s: String): Option[Long] =
    parse(s).collect {
      case n if n.canConvertToLong && n.isIntegralNumber => n.asLong()
    }
}
