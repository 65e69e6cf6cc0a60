package graft.functions

import scala.collection.mutable

/** String-similarity functions with exact parity to the reference's
  * uses of Python difflib and its hand-rolled LCS score.
  *
  *  - [[ratio]]: difflib.SequenceMatcher.ratio() — Ratcliff/Obershelp
  *    2·M/T over recursively-found longest matching blocks. The
  *    reference's inputs (agency/bank names) are far below difflib's
  *    autojunk threshold (200), so the popularity heuristic never
  *    engages and the plain algorithm is exact.
  *  - [[closeMatch]]: difflib.get_close_matches(n=1, cutoff) — best
  *    ratio ≥ cutoff; ties resolved to the lexicographically GREATEST
  *    candidate (difflib sorts (ratio, candidate) tuples, so the string
  *    itself is the tie-break — this makes the result deterministic even
  *    though the reference iterates a Python set).
  *    Used with cutoff 0.8 for rating agencies
  *    (/root/reference/src/etl/transform.py:723) and 0.6 for bank keys
  *    (transform.py:378).
  *  - [[lcsSimilarity]]: `_calcular_similitud` (transform.py:328-355):
  *    1.0 exact, 0.9 containment, else 2·LCS_substring/(|a|+|b|)
  *    (O(n·m) DP instead of the reference's O(n³) scan — same value).
  */
object Similarity {

  /** Longest matching block in a[alo,ahi) vs b[blo,bhi) — difflib's
    * find_longest_match without junk handling: earliest (i, then j) of
    * the maximal-length common substring.
    */
  private def longestMatch(a: String, b: String, alo: Int, ahi: Int,
      blo: Int, bhi: Int): (Int, Int, Int) = {
    val b2j = mutable.Map.empty[Char, List[Int]]
    var j = bhi - 1
    while (j >= blo) { b2j(b(j)) = j :: b2j.getOrElse(b(j), Nil); j -= 1 }
    var besti = alo; var bestj = blo; var bestsize = 0
    var j2len = mutable.Map.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      val newj2len = mutable.Map.empty[Int, Int]
      b2j.getOrElse(a(i), Nil).foreach { jj =>
        if (jj >= blo && jj < bhi) {
          val k = j2len.getOrElse(jj - 1, 0) + 1
          newj2len(jj) = k
          if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
        }
      }
      j2len = newj2len
      i += 1
    }
    (besti, bestj, bestsize)
  }

  /** Total matched characters across all matching blocks. */
  private def totalMatches(a: String, b: String): Int = {
    var total = 0
    val queue = mutable.Stack[(Int, Int, Int, Int)]((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (i, j, k) = longestMatch(a, b, alo, ahi, blo, bhi)
      if (k > 0) {
        total += k
        if (alo < i && blo < j) queue.push((alo, i, blo, j))
        if (i + k < ahi && j + k < bhi) queue.push((i + k, ahi, j + k, bhi))
      }
    }
    total
  }

  /** difflib SequenceMatcher.ratio(). */
  def ratio(a: String, b: String): Double = {
    val t = a.length + b.length
    if (t == 0) 1.0
    else 2.0 * totalMatches(a, b) / t
  }

  /** difflib.get_close_matches(word, candidates, n=1, cutoff).
    * Argument order matters: difflib sets seq2 = word and seq1 = each
    * candidate, and Ratcliff/Obershelp is order-dependent — so the
    * ratio here is ratio(candidate, word), not the reverse.
    */
  def closeMatch(word: String, candidates: Seq[String], cutoff: Double): Option[String] = {
    var best: Option[(Double, String)] = None
    candidates.foreach { c =>
      val r = ratio(c, word)
      if (r >= cutoff) {
        val better = best match {
          case None => true
          case Some((br, bc)) => r > br || (r == br && c.compareTo(bc) > 0)
        }
        if (better) best = Some((r, c))
      }
    }
    best.map(_._2)
  }

  /** Longest common SUBSTRING length, O(n·m) DP. */
  def lcsSubstring(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var best = 0
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        cur(j) = if (a(i - 1) == b(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    best
  }

  /** `_calcular_similitud`: exact → 1.0; containment → 0.9; else
    * 2·LCS/(|a|+|b|).
    */
  def lcsSimilarity(a: String, b: String): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) 0.0
    else if (a == b) 1.0
    else if (a.contains(b) || b.contains(a)) 0.9
    else 2.0 * lcsSubstring(a, b) / (a.length + b.length)
  }
}
