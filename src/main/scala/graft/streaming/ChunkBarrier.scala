package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reduce barrier as a genuinely stateful streaming op (SURVEY.md
  * §2.10; reference `lambda_5.py:29-68` + `README.md:48`): chunk events
  * arrive in any order across micro-batches; an episode's transcript is
  * emitted exactly once, when all expected chunks are buffered.
  *
  * State per episode is the buffered chunk list — bounded by an
  * episode's chunk count (the reference caps episodes at ~10-min chunks,
  * so state is small); keyed by episode_id, so it scales horizontally
  * with the state store.
  */
object ChunkBarrier {

  case class ChunkEvent(
      episodeId: Long, chunkNum: Int, text: String, numChunks: Int)
  case class Transcript(episodeId: Long, text: String)
  case class BarrierState(chunks: Map[Int, String], expected: Int, done: Boolean)

  /** flatMapGroupsWithState update fn: buffer until complete, emit once
    * (at-least-once inputs → exactly-one emission via the `done` flag,
    * mirroring the reference's idempotent INSERT IGNORE sink).
    */
  def update(
      episodeId: Long,
      events: Iterator[ChunkEvent],
      state: GroupState[BarrierState]): Iterator[Transcript] = {
    val prev = state.getOption.getOrElse(BarrierState(Map.empty, -1, done = false))
    if (prev.done) {
      Iterator.empty
    } else {
      val evs = events.toSeq
      val chunks = prev.chunks ++ evs.map(e => e.chunkNum -> e.text)
      val expected = evs.headOption.map(_.numChunks).getOrElse(prev.expected)
      if (expected > 0 && chunks.size >= expected) {
        state.update(BarrierState(Map.empty, expected, done = true))
        // A7 ordered concat — chunk order, " " separator (lambda_5.py:71-81)
        val text = chunks.toSeq.sortBy(_._1).map(_._2).mkString(" ")
        Iterator.single(Transcript(episodeId, text))
      } else {
        state.update(BarrierState(chunks, expected, done = false))
        Iterator.empty
      }
    }
  }

  def apply(chunks: Dataset[ChunkEvent]): Dataset[Transcript] = {
    implicit val enc = Encoders.product[Transcript]
    implicit val senc = Encoders.product[BarrierState]
    chunks
      .groupByKey(_.episodeId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
