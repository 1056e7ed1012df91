package graft.core

/** Streaming fold over contiguous runs of a sorted partition iterator
  * — the secondary-sort kernel shared by MapReduceJob and the KV
  * folds. One pass, O(1) state beyond the caller's fold, no per-group
  * materialization.
  */
object Runs {

  /** Group `rows` (already sorted so equal keys are contiguous) into
    * runs by `key` and fold each run with `foldRun`. The run iterator
    * passed to `foldRun` is only valid inside that call; any unread
    * remainder is drained afterwards.
    */
  def fold[T, K, R](rows: Iterator[T])(key: T => K)(foldRun: (K, Iterator[T]) => R): Iterator[R] =
    new Iterator[R] {
      private val buf = rows.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): R = {
        val k = key(buf.head)
        val run = new Iterator[T] {
          def hasNext: Boolean = buf.hasNext && key(buf.head) == k
          def next(): T = buf.next()
        }
        val r = foldRun(k, run)
        while (run.hasNext) run.next()
        r
      }
    }
}
