package graft.kv

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregators — the engine's UDAF surface (SURVEY §2.9: the
  * reference's reduceF contract maps to `Aggregator[IN, BUF, OUT]`
  * registered with `functions.udaf`).
  */
object Aggregators {

  /** The wc.go reduce as a typed Aggregator: sum string-encoded longs
    * (reference: src/main/wc.go:34-42 parses "1"s and re-emits the
    * sum as a string). Commutative, so partial merge is safe. */
  object SumEncoded extends Aggregator[String, Long, String] {
    def zero: Long = 0L
    def reduce(b: Long, a: String) = b + java.lang.Long.parseLong(a)
    def merge(l: Long, r: Long) = l + r
    def finish(b: Long): String = b.toString
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Order-sensitive append fold as a typed Aggregator: buffers
    * (seq, kind, value) and folds in seq order at finish, so it is
    * correct under ANY input/merge order — the property a distributed
    * agg must have. Memory is O(ops per key): fine as the UDAF-surface
    * form; [[KVEngine.replay]] (streaming secondary sort) and
    * [[KVEngine.replaySalted]] (bucket monoid) are the scale paths. */
  object AppendFold extends Aggregator[Op, List[(Long, String, String)], String] {
    def zero: List[(Long, String, String)] = Nil

    def reduce(buf: List[(Long, String, String)], op: Op) =
      (op.seq, op.kind, op.value) :: buf

    def merge(l: List[(Long, String, String)], r: List[(Long, String, String)]) = l ::: r

    def finish(buf: List[(Long, String, String)]): String =
      buf.sortBy(_._1).foldLeft("") {
        case (_, (_, "put", v)) => v
        case (acc, (_, "append", v)) => acc + v
        case (acc, _) => acc
      }

    def bufferEncoder: Encoder[List[(Long, String, String)]] =
      Encoders.kryo[List[(Long, String, String)]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
