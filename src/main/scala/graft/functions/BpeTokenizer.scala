package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE tokenizer — the REAL merge-table tokenizer behind
  * `token_count_bpe`/`budget_select_bpe`, replacing the regex
  * segmentation stand-in (`TextAnalysis.tokenCount`'s `tokens_bpe`
  * column, kept for continuity): every LLM-data pipeline prices corpora
  * in tokenizer tokens, and a whitespace/regex proxy mis-prices
  * mixed-language and code text by 1.3-2×.
  *
  * The algorithm is the published byte-pair-encoding procedure
  * (Sennrich et al., "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016, as adapted to bytes by GPT-2's public
  * tokenizer): TRAINING repeatedly merges the most frequent adjacent
  * symbol pair over a word-frequency table, producing an ordered merge
  * list; ENCODING re-applies those merges to unseen text — implemented
  * here twice, deliberately:
  *  - [[BpeRanks.countTokens]] (the query path): greedy min-rank — keep
  *    merging the LOWEST-RANK adjacent pair present (leftmost first).
  *  - [[BpeRanks.countTokensReference]] (the golden/oracle path):
  *    rank-order replay — sweep the merges over the word in training
  *    order, each left-to-right.
  * The two are provably equivalent (a merge can only create pairs of
  * HIGHER rank than itself, so greedy's frontier is exactly replay's),
  * but they share no code — the DuckDB-checked golden counts are an
  * independent derivation, not a readback.
  *
  * Pre-tokenization: text splits into chunks by the same family as the
  * engine's other token counters (alpha runs | digit runs | single
  * non-alphanumeric symbol; whitespace never tokenized) and BPE runs
  * within each chunk's UTF-8 BYTES — byte-level, so any Unicode input
  * has a valid segmentation with zero out-of-vocabulary symbols, the
  * GPT-2 property. Symbols are represented as ISO-8859-1 strings (a
  * bijection byte ↔ char, so string equality/ordering IS unsigned-byte
  * equality/ordering).
  *
  * Scale shape: training is a BOUNDED-SAMPLE, driver-side job (the
  * standard practice — vocabularies train on a sample, apply at corpus
  * scale); encoding is the distributed part, a per-row codegen'd
  * expression ([[BpeCountTokens]]) with a bounded per-JVM chunk memo
  * (natural-language chunk distributions are Zipfian, so the memo hit
  * rate is high and the map stays small by construction).
  */
object BpeTokenizer {

  /** Chunker shared by training, both encoders, and the golden build. */
  private val ChunkRe = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  private def latin1(bytes: Array[Byte]): Array[String] = {
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = new String(Array(bytes(i)), java.nio.charset.StandardCharsets.ISO_8859_1)
      i += 1
    }
    out
  }

  private[graft] def chunksOf(text: String): Iterator[String] = {
    val m = ChunkRe.matcher(text)
    new Iterator[String] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = { val g = m.group(); has = m.find(); g }
    }
  }

  /** Train a merge table on `sample` texts (bounded by the caller):
    * `maxMerges` iterations of "merge the most frequent adjacent pair",
    * ties broken by the lexicographically smallest (a, b) — fully
    * deterministic, no hash-iteration-order dependence.
    *
    * INCREMENTAL pair statistics (the standard fast-BPE shape): instead
    * of recounting every pair over the whole word table per merge
    * (O(merges × corpus) — minutes at a production vocabulary), pair
    * counts live in a map updated by DELTAS over only the words the
    * merged pair occurs in (a pair→word-ids index bounds the sweep), and
    * the arg-max comes from a lazily-deleted max-heap: entries are
    * (count, pair) snapshots pushed on every count change, and a popped
    * entry is live iff its count still matches the map. Exact positional
    * pair counts (overlaps included) — the same statistic the recount
    * form computed, so the learned merge sequence is identical. */
  def train(sample: Iterable[String], maxMerges: Int): Vector[(String, String)] = {
    import scala.collection.mutable
    // Distinct chunk table: symbol arrays + frequency.
    val wordFreq = mutable.HashMap.empty[Vector[String], Long]
    for (t <- sample; c <- chunksOf(t)) {
      val w = latin1(c.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toVector
      if (w.nonEmpty) wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L)
    }
    val words = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[String]]
    val freq = mutable.ArrayBuffer.empty[Long]
    wordFreq.foreach { case (w, f) =>
      words += mutable.ArrayBuffer.from(w); freq += f }

    val cnt = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    for (wid <- words.indices; w = words(wid); i <- 0 until w.length - 1) {
      val p = (w(i), w(i + 1))
      cnt.update(p, cnt.getOrElse(p, 0L) + freq(wid))
      occ.getOrElseUpdate(p, mutable.HashSet.empty) += wid
    }
    implicit val negOrd: Ordering[Neg] = Ordering.ordered[Neg]
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      Ordering.by { case (n, a, b) => (n, Neg(a), Neg(b)) })
    cnt.foreach { case ((a, b), n) => heap.enqueue((n, a, b)) }

    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < maxMerges && !done) {
      var best: (String, String) = null
      var bestN = 0L
      while (best == null && heap.nonEmpty) {
        val (n, a, b) = heap.dequeue()
        if (n > 0 && cnt.getOrElse((a, b), 0L) == n) { best = (a, b); bestN = n }
      }
      if (best == null || bestN < 2L) done = true // singletons: nothing general left
      else {
        merges += best
        val touched = mutable.HashSet.empty[(String, String)]
        occ.getOrElse(best, mutable.HashSet.empty).toArray.foreach { wid =>
          val w = words(wid)
          var has = false
          var i = 0
          while (!has && i < w.length - 1) {
            if (w(i) == best._1 && w(i + 1) == best._2) has = true
            i += 1
          }
          if (has) { // the occ index is stale-tolerant; verify before paying
            val f = freq(wid)
            var j = 0
            while (j < w.length - 1) { // exact removal of the word's old pairs
              val p = (w(j), w(j + 1))
              cnt.update(p, cnt(p) - f); touched += p
              j += 1
            }
            val m = mutable.ArrayBuffer.empty[String]
            j = 0
            while (j < w.length) { // one left-to-right sweep, as ever
              if (j < w.length - 1 && w(j) == best._1 && w(j + 1) == best._2) {
                m += (w(j) + w(j + 1)); j += 2
              } else { m += w(j); j += 1 }
            }
            words(wid) = m
            j = 0
            while (j < m.length - 1) { // exact addition of the new pairs
              val p = (m(j), m(j + 1))
              cnt.update(p, cnt.getOrElse(p, 0L) + f)
              occ.getOrElseUpdate(p, mutable.HashSet.empty) += wid
              touched += p
              j += 1
            }
          }
        }
        occ.remove(best); cnt.remove(best); touched -= best
        touched.foreach { p =>
          val n = cnt.getOrElse(p, 0L)
          if (n <= 0L) { cnt.remove(p); occ.remove(p) }
          else heap.enqueue((n, p._1, p._2))
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Max-by helper: order Strings DESCENDING so maxBy((count, Neg(a),
    * Neg(b))) picks highest count, then smallest (a, b). */
  private final case class Neg(s: String) extends Ordered[Neg] {
    def compare(that: Neg): Int = that.s.compareTo(s)
  }

  /** One left-to-right sweep replacing occurrences of `pair` — shared by
    * training and the replay encoder (training IS iterated replay). */
  private[graft] def applyMergeSweep(w: Vector[String], pair: (String, String)): Vector[String] = {
    if (w.length < 2) return w
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i < w.length - 1 && w(i) == pair._1 && w(i + 1) == pair._2) {
        out += (w(i) + w(i + 1)); i += 2
      } else { out += w(i); i += 1 }
    }
    out.result()
  }

  /** Static hook [[BpeCountTokens]]'s generated code calls. */
  def countTokens(text: UTF8String, ranks: BpeRanks): Long =
    ranks.countTokens(text.toString)

  /** Column builder: BPE token count of `text` under `ranks`. */
  def bpe_count(text: Column, ranks: BpeRanks): Column =
    GraftColumnBridge.column(BpeCountTokens(GraftColumnBridge.expression(text), ranks))
}

object BpeRanks {
  /** JVM-shared memo pool, keyed by vocabulary fingerprint: codegen
    * references deserialize a FRESH BpeRanks per plan, so an
    * instance-held memo restarts cold on every query — on a long-lived
    * executor the vocabulary is the stable identity and the memo keys on
    * it. Live vocabularies per JVM are few; the pool itself is capped as
    * a backstop (test suites churn tiny vocabularies). */
  private val pools = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, Integer]]()
  private val PoolCap = 64
  private[functions] def poolFor(vocabId: String)
      : java.util.concurrent.ConcurrentHashMap[String, Integer] = {
    if (pools.size() > PoolCap) pools.clear()
    pools.computeIfAbsent(vocabId,
      _ => new java.util.concurrent.ConcurrentHashMap[String, Integer]())
  }

  /** JVM-global memo telemetry for the bench record: (hits, misses,
    * cap-frozen insert attempts) across every vocabulary's memo. */
  def globalMemoStats: (Long, Long, Long) =
    (memoHits.sum(), memoMisses.sum(), memoCapped.sum())

  // Memo telemetry, JVM-global (LongAdder: uncontended-cheap across
  // executor threads) — read by graft.BpeProbe's PERF measurement,
  // never by the query path.
  private[functions] val memoHits = new java.util.concurrent.atomic.LongAdder
  private[functions] val memoMisses = new java.util.concurrent.atomic.LongAdder
  private[functions] val memoCapped = new java.util.concurrent.atomic.LongAdder
}

/** A trained merge table plus both encoders. Serializable — rides task
  * closures and codegen references; the rank map rebuilds lazily per
  * deserialized instance, while the chunk memo is JVM-SHARED per
  * vocabulary ([[BpeRanks.poolFor]]). */
final class BpeRanks(val merges: Vector[(String, String)]) extends Serializable {

  // NOTE java.lang.Integer, not Int: a missing key must surface as null
  // (an Int-valued map unboxes null to 0 = "rank 0", silently merging
  // EVERY pair). Separator '\u0000' can occur inside a symbol (byte 0),
  // so keys also carry the left symbol's LENGTH - unambiguous.
  @transient private lazy val rank: java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a.length + ":" + a + b, Integer.valueOf(i)) }
    m
  }

  /** Content fingerprint of the merge table — the key under which every
    * deserialized copy of this vocabulary shares one memo. */
  @transient private lazy val vocabId: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    merges.foreach { case (a, b) =>
      md.update(a.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      md.update(0.toByte)
      md.update(b.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      md.update(1.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Bounded chunk→count memo (Zipfian chunk reuse), JVM-shared per
    * vocabulary; cleared wholesale if it ever exceeds the cap —
    * correctness never depends on it, and the cap bounds executor heap. */
  @transient private lazy val memo = BpeRanks.poolFor(vocabId)
  private val MemoCap = 1 << 17

  /** (hits, misses, capped insertions, this vocabulary's resident
    * entries) across the JVM's greedy-encoder memos. */
  def memoStats: (Long, Long, Long, Int) =
    (BpeRanks.memoHits.sum(), BpeRanks.memoMisses.sum(),
      BpeRanks.memoCapped.sum(), memo.size())

  /** GREEDY min-rank encoder (the query path): token count of `text`. */
  def countTokens(text: String): Long = {
    var n = 0L
    val it = BpeTokenizer.chunksOf(text)
    while (it.hasNext) n += chunkTokens(it.next())
    n
  }

  private def chunkTokens(chunk: String): Int = {
    val hit = memo.get(chunk)
    if (hit != null) { BpeRanks.memoHits.increment(); return hit.intValue() }
    BpeRanks.memoMisses.increment()
    val bytes = chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val syms = new java.util.ArrayList[String](bytes.length)
    bytes.foreach(b => syms.add(
      new String(Array(b), java.nio.charset.StandardCharsets.ISO_8859_1)))
    var done = syms.size() < 2
    while (!done) {
      // leftmost occurrence of the minimum-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.size() - 1) {
        val r = rank.get(syms.get(i).length + ":" + syms.get(i) + syms.get(i + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        syms.set(bestAt, syms.get(bestAt) + syms.get(bestAt + 1))
        syms.remove(bestAt + 1)
        if (syms.size() < 2) done = true
      }
    }
    val c = syms.size()
    // FREEZE at cap, never clear: chunk->count is a pure function (no
    // staleness), and under a Zipfian chunk distribution the first
    // residents are the frequent ones — wholesale clearing was measured
    // (BpeProbe stress leg) to leave the warm pass as cold as the first
    // (474k vs 478k misses, 21 clears); freezing keeps the hot head
    // resident and bounds heap identically.
    if (memo.size() < MemoCap) memo.put(chunk, Integer.valueOf(c))
    else BpeRanks.memoCapped.increment() // telemetry: capped insertions
    c
  }

  /** RANK-ORDER REPLAY encoder (the independent golden path): apply each
    * merge in training order, one left-to-right sweep each. Shares only
    * the chunker and the sweep with the greedy path.
    *
    * At a production vocabulary a literal replay pays |merges| sweeps
    * per chunk; two sound shortcuts keep the golden build corpus-scale
    * without changing a single result: a merge (a, b) is swept only when
    * BOTH symbols are currently present in the chunk (the presence set
    * grows exactly when a merge fires, so almost every rank is skipped
    * in two hash probes — a skipped sweep is one that would have matched
    * nothing), and chunk results are memoized per JVM like the greedy
    * path's (the memo is the cache of a pure function). */
  def countTokensReference(text: String): Long = {
    var n = 0L
    val it = BpeTokenizer.chunksOf(text)
    while (it.hasNext) n += refChunkTokens(it.next())
    n
  }

  @transient private lazy val refMemo = BpeRanks.poolFor(vocabId + "#ref")

  private def refChunkTokens(chunk: String): Int = {
    val hit = refMemo.get(chunk)
    if (hit != null) return hit.intValue()
    var w = latin1Vec(chunk)
    val present = scala.collection.mutable.HashSet.empty[String]
    w.foreach(present += _)
    merges.foreach { case (a, b) =>
      if (present.contains(a) && present.contains(b)) {
        val m = BpeTokenizer.applyMergeSweep(w, (a, b))
        if (m.length != w.length) { present += (a + b); w = m }
      }
    }
    if (refMemo.size() < MemoCap) refMemo.put(chunk, Integer.valueOf(w.length))
    w.length
  }

  private def latin1Vec(chunk: String): Vector[String] =
    chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toVector.map(b => new String(Array(b), java.nio.charset.StandardCharsets.ISO_8859_1))
}

/** Codegen'd BPE token count: stays inside whole-stage codegen (the
  * generated code calls the static [[BpeTokenizer.countTokens]] with the
  * ranks object as a codegen reference — the standard pattern for
  * expressions carrying driver-built state, no UDF ser/de per row). */
case class BpeCountTokens(child: Expression, ranks: BpeRanks)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenizer.countTokens(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, classOf[BpeRanks].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTokenizer.countTokens($c, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountTokens =
    copy(child = newChild)
}
