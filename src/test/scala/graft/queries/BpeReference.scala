package graft.queries

/** Independent in-memory BPE reference: the textbook algorithm on a
  * word-frequency dict — list-of-symbols state, greedy left-to-right
  * non-overlapping merge application, argmax on (count desc, pair
  * lexicographic asc). Shares NO code or representation with the
  * engine's delimiter-string formulation; used by the t21 spec and the
  * scalacheck property as the executable definition.
  */
object BpeReference {

  def merges(
      counts: Map[String, Long],
      rounds: Int): Seq[(Long, String, String, Long)] = {
    var seg: Map[String, Vector[String]] =
      counts.map { case (w, _) => w -> w.map(_.toString).toVector }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var step = 1L
    var live = true
    while (step <= rounds && live) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- seg; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) =
          pc.getOrElse((syms(i), syms(i + 1)), 0L) + counts(w)
      if (pc.isEmpty) live = false
      else {
        val ((a, b), n) = pc.minBy { case ((x, y), m) => (-m, x, y) }
        out += ((step, a, b, n))
        seg = seg.map { case (w, syms) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += syms(i); i += 1 }
          }
          w -> nb.result()
        }
        step += 1
      }
    }
    out.result()
  }
}
