package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/**
 * Streaming weighted-reservoir sampling — the continuous form of
 * [[graft.ext.Corpus.weightedReservoir]] (A-ES: top-k by
 * `key9 = round(1e9·ln(u)/w)` with the growth-stable md5 uniform):
 * maintain, per stratum, the k best-keyed documents seen so far on an
 * unbounded stream, with O(k) state per stratum.
 *
 * Because the A-ES key is CONTENT-deterministic (md5 of the id, not of
 * arrival order), the reservoir after any prefix of the stream equals
 * the batch reservoir over that prefix — which makes stream ≡ batch
 * provable (StreamingSpec pins it) and restarts/replays convergent.
 *
 * Output is an append-only ADMISSION LOG: a row is emitted when it
 * enters its stratum's reservoir. Entries later evicted by better
 * keys are NOT retracted (append mode cannot), so final membership =
 * top-k of the admission log per stratum — one cheap batch top-k over
 * a log whose expected size is k·(1 + ln(n/k)), the classic
 * record-count bound, NOT n. Consumers wanting the live set read the
 * state-store instead.
 */
object SampleStream {

  final case class Keyed(stratum: String, doc_id: Long, key9: Long)
  final case class Admission(stratum: String, doc_id: Long, key9: Long)

  /** Reservoir order: better = larger key, ties to the SMALLER id —
    * exactly the batch `ORDER BY key9 DESC, doc_id` contract. */
  private def better(k1: Long, id1: Long, k2: Long, id2: Long): Boolean =
    k1 > k2 || (k1 == k2 && id1 < id2)

  def admitReservoir(docs: DataFrame, weight: Column, k: Int, seed: Long,
      stratumCol: Option[String] = None, idCol: String = "doc_id",
      stream: String = "corpus_wres"): Dataset[Admission] = {
    require(k > 0, "k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val key9 = round(log(graft.functions.Rng.uniformPos(seed, stream, col(idCol)))
      / weight * lit(1e9)).cast("long")
    val keyed = docs.select(
        stratumCol.map(col).getOrElse(lit("all")).cast("string").as("stratum"),
        col(idCol).cast("long").as("doc_id"), key9.as("key9"))
      .as[Keyed]
    // NoTimeout: strata are mixture-cardinality (languages, sources —
    // bounded by corpus design), so state is |strata|·k rows forever —
    // the deliberate contract, unlike the per-bucket dedup states that
    // need event-time reclaim.
    keyed.groupByKey(_.stratum)
      .flatMapGroupsWithState[Seq[(Long, Long)], Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (stratum, rows, state) =>
          // buffer sorted worst-last under `better`; arrival order
          // within a batch is meaningless, so process best-first for a
          // replay-deterministic admission log
          var buf = state.getOption.getOrElse(Nil)
          val admitted = scala.collection.mutable.ListBuffer.empty[Admission]
          rows.toSeq.sortWith((a, b) => better(a.key9, a.doc_id, b.key9, b.doc_id))
            .foreach { r =>
              val (worstK, worstId) =
                if (buf.isEmpty) (Long.MinValue, Long.MaxValue) else buf.last
              val redelivery = buf.contains((r.key9, r.doc_id))
              if (!redelivery &&
                  (buf.length < k || better(r.key9, r.doc_id, worstK, worstId))) {
                val grown = (buf :+ ((r.key9, r.doc_id)))
                  .sortWith((a, b) => better(a._1, a._2, b._1, b._2))
                buf = if (grown.length > k) grown.take(k) else grown
                // admission is real only if the row survived the trim
                if (buf.exists(e => e._1 == r.key9 && e._2 == r.doc_id))
                  admitted += Admission(stratum, r.doc_id, r.key9)
              }
            }
          state.update(buf)
          admitted.iterator
      }
  }
}
