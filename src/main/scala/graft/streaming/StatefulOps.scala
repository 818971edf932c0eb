package graft.streaming

import graft.model.Canon.Datapoint
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-series streaming state via flatMapGroupsWithState — the
  * principled replacement for the reference's per-series membuf bookkeeping
  * (`/root/reference/src/membuf.re`, `membufq.re`): where the reference
  * tracks per-series queue length, cached disk bounds, and sortedness to
  * decide spills, this tracks per-series running stats and out-of-order
  * arrivals as managed, checkpointed state that survives restarts and
  * scales out by group.
  */
object StatefulOps {

  /** Running per-series state (the membufq analog). */
  case class SeriesState(count: Long, sum: Double, maxTs: Long, outOfOrder: Long)

  /** Emitted per batch per series: cumulative stats + disorder counter. */
  case class SeriesUpdate(series: String, count: Long, sum: Double,
                          mean: Double, maxTs: Long, outOfOrder: Long)

  /** Track cumulative per-series stats and count out-of-order points (a
    * point is out-of-order if its ts is below the max seen — exactly the
    * condition the reference's `is_ascending` fast-path check tests,
    * `membufq.re:17-41`).
    */
  def runningSeriesStats(points: Dataset[Datapoint],
                         timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
                        (implicit spark: SparkSession): Dataset[SeriesUpdate] = {
    implicit val stateEnc = Encoders.product[SeriesState]
    implicit val outEnc = Encoders.product[SeriesUpdate]
    points.groupByKey(_.series)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (series: String, rows: Iterator[Datapoint], state: GroupState[SeriesState]) =>
          var s = state.getOption.getOrElse(SeriesState(0L, 0.0, Long.MinValue, 0L))
          rows.foreach { p =>
            val ooo = if (p.ts_us < s.maxTs) s.outOfOrder + 1 else s.outOfOrder
            s = SeriesState(s.count + 1, s.sum + p.value, math.max(s.maxTs, p.ts_us), ooo)
          }
          state.update(s)
          Iterator.single(SeriesUpdate(series, s.count, s.sum,
            if (s.count == 0) 0.0 else s.sum / s.count, s.maxTs, s.outOfOrder))
      }
  }
}
