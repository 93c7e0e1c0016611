package graft.functions

/** Dictionary-driven BPE tokenizer inference (q121) — the
  * PRODUCTION-SCALE counterpart of q101's codegen'd replace chain.
  *
  * Semantics are exactly the reference contract q101's replay spec
  * pins: merges applied in RANK ORDER, each as one left-to-right pass
  * over the word's token sequence. The replace-chain form encodes the
  * same thing as O(merges) expression nodes — exact and fully
  * SQL-replayable, but a 50k-merge production vocab would blow
  * codegen/expression-depth limits in any engine (DuckDB's binder
  * already caps at ~60 merges per expression). This form carries the
  * merge table as DATA (a broadcast array) and applies it in plain JVM
  * code inside `mapPartitions` — q54's typed-codec discipline — so
  * vocab size costs memory, never plan size. Equality of the two forms
  * on the frozen 24-merge table is spec-asserted over the full corpus,
  * and this implementation is replay-tested against an independent
  * reference at a 1k-merge synthetic vocab.
  *
  * Per word the pass loop is O(merges × word length); a production
  * tokenizer at 50k merges replaces the outer loop with the
  * pair-rank-heap algorithm (merge the lowest-rank pair present,
  * repeat), which computes the same result whenever the merge table is
  * closed under its own training order — BPE training guarantees it:
  * a merge's operands exist only via earlier merges.
  */
object BpeDict extends Serializable {

  /** Tokenize one word: rank-order merge passes over its characters. */
  def tokenize(merges: Array[(String, String)], word: String): Array[String] = {
    var n = word.length
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    var mi = 0
    while (mi < merges.length && n > 1) {
      val a = merges(mi)._1
      val b = merges(mi)._2
      // one left-to-right pass, compacting in place: a match consumes
      // two tokens and emits their concatenation, and the scan resumes
      // AFTER the merged token (it is not re-examined within this
      // pass) — exactly the reference fold q101's replay spec pins.
      // In-place is safe: w ≤ r always, and the only slot ever
      // overwritten before being read is w == r in the copy branch
      // (same value).
      var r = 0
      var w = 0
      while (r < n) {
        if (r < n - 1 && toks(r) == a && toks(r + 1) == b) {
          toks(w) = a + b; r += 2
        } else {
          toks(w) = toks(r); r += 1
        }
        w += 1
      }
      n = w
      mi += 1
    }
    java.util.Arrays.copyOf(toks, n)
  }

  /** BPE token count of a whole text: tokenize each space-separated
    * word independently (split keeps empty tokens — Spark `split`
    * semantics; an empty word holds 0 tokens, matching q101's
    * marker arithmetic). */
  def countTokens(merges: Array[(String, String)], text: String): Long = {
    var total = 0L
    val words = text.split(" ", -1)
    var i = 0
    while (i < words.length) {
      total += tokenize(merges, words(i)).length
      i += 1
    }
    total
  }
}
