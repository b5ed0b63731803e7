package graft.operators

/** Histogram bin-packing for padding-free batch construction — the
  * no-split counterpart of [[TextOps.packTokenSequences]] (GPT
  * pretraining splits documents across `ctx` boundaries; SFT-style
  * pipelines must keep each example whole, so they PACK examples into
  * `ctx`-token bins and pad the remainder — the packing efficiency IS
  * the training-throughput multiplier).
  *
  * The whole combinatorial problem runs DRIVER-SIDE over the length
  * HISTOGRAM — at most `ctx` bins no matter the corpus size (the
  * histogram-packing insight of Kosec, Fu & Krell 2021, "Efficient
  * Sequence Packing without Cross-contamination"; the packing rule
  * itself is classic best-fit-decreasing, Johnson 1973). The output is
  * not per-document rows but [[PackGroup]] strategies: `mult` identical
  * packs sharing one length combination, plus per-length global rank
  * offsets that make the document→pack assignment a CLOSED FORM
  * evaluated row-locally against the broadcast group table (the
  * interleavedOrder convention) — the corpus itself never reaches the
  * driver and never shuffles for the assignment.
  *
  * Semantics are EXACTLY per-item best-fit decreasing, batched over
  * counts: items of each length (longest length first; items of one
  * length in global rank order) go one at a time to the open pack with
  * the smallest remaining capacity that still fits, ties to the oldest
  * pack, a new pack opening only when none fits. Batching never changes
  * the outcome — equal-length items are interchangeable and a pack just
  * filled is strictly the best fit until it is full — and the
  * equivalence is spec-pinned against a literal per-item simulator on
  * randomized histograms.
  */
object HistogramPacking {

  /** `mult` identical packs: `packBase` is the first pack id (pack ids
    * are dense, `[packBase, packBase + mult)`), `slots` lists
    * `(length, k, off)` — each pack holds `k` documents of `length`,
    * and the group's pack `j` holds the documents whose per-length
    * global rank (position among that length's documents in doc-id
    * order) lies in `[off + j*k, off + (j+1)*k)`. So a document with
    * length `l` and rank `r` lands in pack
    * `packBase + (r - off) div k` of the unique group whose `l`-slot
    * satisfies `off <= r < off + mult*k`. */
  final case class PackGroup(packBase: Long, mult: Long,
      slots: List[(Long, Long, Long)])

  /** Mutable in-flight strategy part; `slots` as in [[PackGroup]]. */
  private final class Part(var rem: Long, var mult: Long,
      var slots: List[(Long, Long, Long)])

  /** Pack a length histogram (`(length, count)`, lengths distinct,
    * `0 < length <= ctx`, `count > 0`) into [[PackGroup]]s. Cost is
    * polynomial in the number of DISTINCT lengths (≤ ctx) — independent
    * of the corpus row count. Deterministic: input order is irrelevant
    * (bins are processed longest-first), ties resolve to the oldest
    * part, and splits keep creation order. */
  def pack(hist: Seq[(Long, Long)], ctx: Long): Seq[PackGroup] = {
    require(ctx > 0, "ctx must be > 0")
    hist.foreach { case (l, c) =>
      require(l > 0 && l <= ctx, s"length $l outside (0, $ctx]")
      require(c > 0, s"count $c for length $l must be > 0")
    }
    require(hist.map(_._1).distinct.size == hist.size,
      "histogram lengths must be distinct")
    val parts = scala.collection.mutable.ArrayBuffer.empty[Part]
    for ((l, total) <- hist.sortBy(-_._1)) {
      var c = total       // documents of length l not yet placed
      var consumed = 0L   // global rank cursor for length l
      while (c > 0) {
        // best fit: smallest remaining capacity >= l, ties to oldest
        var best = -1
        var i = 0
        while (i < parts.length) {
          if (parts(i).rem >= l &&
            (best < 0 || parts(i).rem < parts(best).rem)) best = i
          i += 1
        }
        if (best < 0) {
          // nothing fits: open new packs, each absorbing k = ctx div l
          // items (per-item BFD refills the just-opened pack until full
          // before opening the next)
          val k = ctx / l
          val full = c / k
          if (full > 0) {
            parts += new Part(ctx - k * l, full, List((l, k, consumed)))
            consumed += full * k; c -= full * k
          }
          if (c > 0) { // final short pack; may absorb smaller lengths later
            parts += new Part(ctx - c * l, 1L, List((l, c, consumed)))
            consumed += c; c = 0
          }
        } else {
          val s = parts(best)
          val a = s.rem / l                  // absorption per pack (>= 1)
          val t = math.min(s.mult, c / a)    // packs absorbing a each
          // split s in place: [t fully-fed packs][<=1 partial][untouched],
          // children inheriting rank offsets shifted by their pack range
          def shifted(sl: List[(Long, Long, Long)], j: Long) =
            sl.map { case (l0, k0, o0) => (l0, k0, o0 + j * k0) }
          val children = scala.collection.mutable.ArrayBuffer.empty[Part]
          var j0 = 0L
          if (t > 0) {
            children += new Part(s.rem - a * l, t,
              (l, a, consumed) :: shifted(s.slots, 0L))
            consumed += t * a; c -= t * a; j0 += t
          }
          if (j0 < s.mult && c > 0) { // here c < a by construction
            children += new Part(s.rem - c * l, 1L,
              (l, c, consumed) :: shifted(s.slots, j0))
            consumed += c; j0 += 1; c = 0
          }
          if (j0 < s.mult)
            children += new Part(s.rem, s.mult - j0, shifted(s.slots, j0))
          parts.remove(best)
          parts.insertAll(best, children)
        }
      }
    }
    var base = 0L
    parts.map { p =>
      val g = PackGroup(base, p.mult, p.slots.sortBy(-_._1))
      base += p.mult
      g
    }.toSeq
  }
}
