package graft.ext

import graft.detect.{KeyedFold, StreamKernel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One packed document: its assigned training sequence (`seq_idx`, dense
  * per group), ordinal within the sequence (`seq_pos`), starting token
  * offset inside the sequence (`seq_off`), and an oversize flag for
  * documents longer than the sequence capacity (they occupy a sequence
  * alone; a downstream tokenizer would truncate or chunk them).
  */
final case class PackedDoc(
    doc_id: Long,
    source: String,
    n_tokens: Long,
    seq_idx: Long,
    seq_pos: Long,
    seq_off: Long,
    oversize: Boolean)

/** Sequence packing for LLM pretraining: assign documents to fixed-capacity
  * training sequences (next-fit packing — close the open sequence when the
  * next document no longer fits). The deterministic contract mirrors
  * Sampling: the assignment is a pure function of (group, doc order,
  * sizes) — no RNG, no partition sensitivity — so a re-run, a retry, or a
  * different cluster size produces the identical packing.
  *
  * Scale shape: packing is sequential *within* a group but embarrassingly
  * parallel *across* groups, so this reuses the KeyedFold secondary-sort
  * schedule (one shuffle on the group key, external sort, one streaming
  * pass with O(1) state). At 100 TB a pipeline packs per (source, shard)
  * with thousands of independent groups — the same shape as EMA over
  * series keys. Next-fit (not first-fit/best-fit) is the deliberate
  * choice: it is the only packing discipline computable in one bounded-
  * state pass, and its occupancy loss vs first-fit-decreasing is small at
  * realistic doc/capacity ratios.
  */
object Packing {

  private[graft] final class PackKernel(capacity: Long)
      extends StreamKernel[(String, Long, Long), PackedDoc] {
    private var seqIdx = -1L
    private var pos = 0L
    private var fill = 0L

    def feed(i: (String, Long, Long)): Iterator[PackedDoc] = {
      val (grp, id, sz) = i
      if (seqIdx < 0 || fill + sz > capacity) {
        seqIdx += 1; pos = 0L; fill = sz
        Iterator.single(PackedDoc(id, grp, sz, seqIdx, 0L, 0L, sz > capacity))
      } else {
        pos += 1
        val off = fill
        fill += sz
        Iterator.single(PackedDoc(id, grp, sz, seqIdx, pos, off, oversize = false))
      }
    }
    def flush(): Iterator[PackedDoc] = Iterator.empty
  }

  /** Pack rows of `df` into capacity-bounded sequences per `groupCol`, in
    * ascending `idCol` order (the deterministic document order). `sizeCol`
    * is the per-document token count.
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      sizeCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val in = df
      .select(
        col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        col(sizeCol).cast("long").as("sz"))
      .as[(String, Long, Long)]
    KeyedFold
      .foldOn[(String, Long, Long), PackedDoc, String](in, "grp", "id", _._1)(
        () => new PackKernel(capacity))
      .toDF()
  }
}
