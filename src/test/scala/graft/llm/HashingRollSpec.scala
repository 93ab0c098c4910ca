package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** r15 kernel-optimization differential guards: the rolling Karp–Rabin
  * gram pass + monotonic-deque window minimum (and the Mersenne/Barrett
  * reductions they build on) must be BIT-IDENTICAL to the naive
  * per-position Horner + rescan-per-window reference — the q24/q92
  * DuckDB oracles replay that reference arithmetic verbatim. */
class HashingRollSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)

  /** Alphabets stressing different code paths: lowercase ASCII, a tiny
    * alphabet (maximizes hash TIES → exercises rightmost-tie selection
    * and the deque's >= pop), and astral-plane text (surrogate pairs —
    * charAt semantics, table lookups above 0xFF). */
  private def randText(n: Int, mode: Int): String = mode match {
    case 0 => Iterator.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    case 1 => Iterator.fill(n)(('a' + rnd.nextInt(2)).toChar).mkString
    case _ => Iterator.fill(n)(rnd.nextInt(0xFFFF).toChar).mkString
  }

  /** The pre-r15 reference: fresh k-char Horner per position. */
  private def naiveGrams(text: String, k: Int): Array[Long] =
    Array.tabulate(math.max(0, text.length - k + 1))(i =>
      Hashing.polyModP(text, i, i + k))

  /** The pre-r15 reference selection: rescan each window, `<=` tie rule. */
  private def naiveWinnow(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length - k + 1
    if (n <= 0) return Array(Hashing.polyModP(text, 0, text.length))
    val hs = naiveGrams(text, k)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var prevPos = -1
    var j = 0
    while (j <= math.max(0, n - w)) {
      var pos = j
      var m = hs(j)
      var t = j + 1
      while (t < math.min(j + w, n)) { if (hs(t) <= m) { m = hs(t); pos = t }; t += 1 }
      if (pos != prevPos) { out.add(m); prevPos = pos }
      j += 1
    }
    out.toArray.map(_.asInstanceOf[java.lang.Long].longValue)
  }

  test("modBig equals % on boundary and random 63-bit values") {
    val edge = Seq(0L, 1L, Hashing.BigP - 1, Hashing.BigP, Hashing.BigP + 1,
      2 * Hashing.BigP - 1, 2 * Hashing.BigP, 3 * Hashing.BigP - 1,
      Long.MaxValue, Long.MaxValue - 1)
    for (v <- edge ++ Seq.fill(100000)(rnd.nextLong() & Long.MaxValue))
      assert(Hashing.modBig(v) === v % Hashing.BigP, s"v=$v")
  }

  test("winnow (rolling + deque) is bit-identical to the naive reference") {
    for (mode <- 0 to 2; len <- Seq(0, 3, 7, 8, 9, 15, 23, 24, 100, 1000, 4096)) {
      val text = randText(len, mode)
      val got = Hashing.winnow(text, 8, 16).toSeq
      val want = naiveWinnow(text, 8, 16).toSeq
      assert(got === want, s"mode=$mode len=$len")
    }
  }

  test("fingerprint (rolling min) is bit-identical to the per-gram min") {
    for (mode <- 0 to 2; len <- Seq(1, 7, 8, 9, 100, 3000)) {
      val text = randText(len, mode)
      val want =
        if (text.length < 8) Hashing.polyModP(text, 0, text.length)
        else naiveGrams(text, 8).min
      assert(Hashing.fingerprint(text) === want, s"mode=$mode len=$len")
    }
    assert(Hashing.fingerprint("") === 0L)
  }
}
