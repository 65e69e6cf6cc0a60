package graft.operators

/** Code-independent straight-line BPE reference for the t51/t59/t74
  * oracles (r8 VERDICT #2): the previous VALUES oracles evaluated the
  * corpus with the SAME `trainLocal`/`encodeWord` the gate's
  * driver-local regime dispatches to, so a bug in the shared merge-loop
  * logic would have passed the differential. This object reimplements
  * the published algorithm semantics (Sennrich et al. 2016: learn_bpe
  * training, apply_bpe best-rank-first encoding; reference
  * `src/etl/transform.py` has no tokenizer — the semantics come from
  * the paper) from the definition, sharing ZERO symbols with
  * [[BpeTrainer]]'s gate path and written in a deliberately different
  * style (immutable lists, recursion, groupMapReduce) so a transcription
  * slip in one implementation cannot be mirrored in the other.
  *
  * Pinned semantics, asserted equal to the gate path in BpeReferenceSpec
  * and — through the oracles — checked by DuckDB against the distributed
  * pipeline every verify run:
  *  - training round: count adjacent symbol pairs weighted by word
  *    frequency; winner = highest count, ties to the lexicographically
  *    smallest (left, right); apply the merge greedily left-to-right in
  *    every word (overlaps collapse forward: "aaa" + (a,a) → [aa, a]).
  *  - encoding: repeatedly merge ALL occurrences of the lowest-rank
  *    adjacent trained pair present until none remains — NOT a
  *    training-order replay (ranks are unique, so "lowest" is
  *    unambiguous).
  */
object BpeReference {

  /** Greedy left-to-right application of one merge: consume (l, r) at
    * the earliest position, emit l++r, continue AFTER the pair — the
    * non-overlapping forward scan of the published algorithm.
    * Tail-recursive with an accumulator: a pathological space-free
    * token (minified blob) must not overflow the stack in the oracle
    * while the gate path's iterative loop handles it fine.
    */
  def mergePair(syms: List[String], l: String, r: String): List[String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: List[String]): List[String] =
      rest match {
        case a :: b :: tail if a == l && b == r => loop(tail, (l + r) :: acc)
        case a :: tail => loop(tail, a :: acc)
        case Nil => acc.reverse
      }
    loop(syms, Nil)
  }

  /** Learn `nMerges` merges from a (word, frequency) table. Returns
    * (rank, left, right, count) in training order, rank 1-based.
    */
  def train(words: Seq[(String, Long)], nMerges: Int): List[(Int, String, String, Long)] = {
    @annotation.tailrec
    def loop(vocab: List[(List[String], Long)], rank: Int,
        acc: List[(Int, String, String, Long)]): List[(Int, String, String, Long)] =
      if (rank > nMerges) acc.reverse
      else {
        val counts = vocab.iterator
          .flatMap { case (syms, c) => syms.zip(syms.drop(1)).map(_ -> c) }
          .toList.groupMapReduce(_._1)(_._2)(_ + _)
        if (counts.isEmpty) acc.reverse
        else {
          val ((l, r), c) =
            counts.toList.sortBy { case ((pl, pr), pc) => (-pc, pl, pr) }.head
          loop(vocab.map { case (syms, n) => (mergePair(syms, l, r), n) },
            rank + 1, (rank, l, r, c) :: acc)
        }
      }
    loop(words.toList.map { case (w, c) => (w.toList.map(_.toString), c) }, 1, Nil)
  }

  /** GPT-2 bytes_to_unicode for the byte-level oracle (t86), built by
    * COMPLEMENT SCAN — list the self-mapped printable ranges, then
    * assign 0x100+i to the ascending complement — a deliberately
    * different construction from the gate path's single imperative
    * sweep (BpeTrainer.byteToUnicode); BpeTrainerSpec asserts the two
    * tables agree byte-for-byte.
    */
  val byteToChar: Map[Int, Char] = {
    val self = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val shifted = (0 to 255).filterNot(self).zipWithIndex
      .map { case (b, i) => b -> (0x100 + i).toChar }
    (self.toList.map(b => b -> b.toChar) ++ shifted).toMap
  }

  /** A word's UTF-8 bytes as remapped printable chars. */
  def byteRemap(w: String): String =
    w.getBytes("UTF-8").map(b => byteToChar(b & 0xff)).mkString

  /** Inverse remapping over concatenated tokens → original string. */
  def byteUnmap(tokens: List[String]): String = {
    val rev = byteToChar.map(_.swap)
    new String(tokens.flatMap(_.toList).map(c => rev(c).toByte).toArray, "UTF-8")
  }

  /** apply_bpe: tokenize one word under a trained (pair → rank) table. */
  def encode(word: String, ranks: Map[(String, String), Int]): List[String] = {
    @annotation.tailrec
    def loop(syms: List[String]): List[String] = {
      val present = syms.zip(syms.drop(1)).flatMap(p => ranks.get(p).map(_ -> p))
      if (present.isEmpty) syms
      else {
        val (_, (l, r)) = present.minBy(_._1)
        loop(mergePair(syms, l, r))
      }
    }
    loop(word.toList.map(_.toString))
  }
}
