package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator for similarity search.
  *
  * Why: the window formulation (`row_number().over(partitionBy(query))`)
  * shuffles EVERY scored candidate row to the query's reducer and sorts
  * there — at corpus scale that is n·m rows through the wire. This
  * `Aggregator[IN, BUF, OUT]` keeps a size-k bound in the partial
  * buffer, so map-side combine ships at most k rows per partition per
  * query: shuffle volume drops from O(corpus) to O(k · partitions).
  *
  * Determinism: ordering is (score DESC, id ASC) including the
  * retention boundary, so results are identical to the window+rank
  * formulation even under ties.
  */
object TopK {

  final case class Scored(id: Long, score: Double)

  /** Total order via Double.compare: NaN sorts above every value and
    * equal to itself (falling through to the id tie-break) — matching
    * Spark's descending sort, where NaN ranks first. Plain >/== would
    * make NaN retention merge-order dependent. */
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  /** Partial buffer: sorted (desc score, asc id) vector, length ≤ k. */
  final case class Buf(items: List[Scored])

  def topK(k: Int): Aggregator[Scored, Buf, Seq[Scored]] =
    new Aggregator[Scored, Buf, Seq[Scored]] {
      override def zero: Buf = Buf(Nil)

      private def insert(items: List[Scored], x: Scored): List[Scored] = {
        val (pre, post) = items.span(better(_, x))
        val merged = pre ::: (x :: post)
        if (merged.length > k) merged.take(k) else merged
      }

      override def reduce(b: Buf, a: Scored): Buf =
        if (b.items.length == k && better(b.items.last, a)) b else Buf(insert(b.items, a))

      override def merge(b1: Buf, b2: Buf): Buf =
        Buf(b2.items.foldLeft(b1.items)(insert))

      override def finish(r: Buf): Seq[Scored] = r.items

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
