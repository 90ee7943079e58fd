package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A7 custom UDAF exemplar (SURVEY.md §2.4/§2.12): implicit-feedback
  * weighted preference as a typed `Aggregator[IN, BUF, OUT]`.
  *
  * score = Σ w(event_type)·value / Σ w(event_type), skipping rows whose
  * value is null/NaN (custom null semantics a plain avg can't express:
  * the weight of a skipped row contributes to NEITHER sum). Returns
  * null (None) when no weighted rows were seen.
  *
  * Registered per session via `functions.udaf` (see
  * [[WeightedPref.register]]); usable from both the Column API and SQL
  * text. The buffer is two doubles — partial aggregation (map-side
  * combine) works exactly like a built-in agg at any scale.
  */
object WeightedPref {

  /** Behavior weights — the standard implicit-feedback ladder. */
  val weights: Map[String, Double] =
    Map("purchase" -> 5.0, "signup" -> 3.0, "click" -> 2.0, "view" -> 1.0)

  case class In(event_type: String, value: java.lang.Double)
  case class Buf(var wsum: Double, var wtotal: Double)

  val agg: Aggregator[In, Buf, Option[Double]] =
    new Aggregator[In, Buf, Option[Double]] {
      override def zero: Buf = Buf(0.0, 0.0)
      override def reduce(b: Buf, in: In): Buf = {
        val w = weights.getOrElse(in.event_type, 0.0)
        if (in.value != null && !in.value.isNaN && w > 0.0) {
          b.wsum += w * in.value
          b.wtotal += w
        }
        b
      }
      override def merge(a: Buf, b: Buf): Buf = {
        a.wsum += b.wsum; a.wtotal += b.wtotal; a
      }
      override def finish(b: Buf): Option[Double] =
        if (b.wtotal > 0.0) Some(b.wsum / b.wtotal) else None
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Option[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
    }

  /** Register as SQL function `weighted_pref(event_type, value)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("weighted_pref", org.apache.spark.sql.functions.udaf(agg, Encoders.product[In]))
}
