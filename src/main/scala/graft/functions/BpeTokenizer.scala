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
    * deterministic, no hash-iteration-order dependence. */
  def train(sample: Iterable[String], maxMerges: Int): Vector[(String, String)] = {
    // word (as symbol vector) -> frequency
    var words = scala.collection.mutable.HashMap.empty[Vector[String], Long]
    for (t <- sample; c <- chunksOf(t)) {
      val w = latin1(c.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toVector
      if (w.nonEmpty) words.update(w, words.getOrElse(w, 0L) + 1L)
    }
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < maxMerges && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, f) <- words; i <- 0 until w.length - 1) {
        val p = (w(i), w(i + 1))
        pairs.update(p, pairs.getOrElse(p, 0L) + f)
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.toSeq.maxBy { case ((a, b), n) => (n, Neg(a), Neg(b)) }._1
        if (pairs(best) < 2L) done = true // singleton pairs: nothing general left
        else {
          merges += best
          val next = scala.collection.mutable.HashMap.empty[Vector[String], Long]
          for ((w, f) <- words) {
            val m = applyMergeSweep(w, best)
            next.update(m, next.getOrElse(m, 0L) + f)
          }
          words = next
          k += 1
        }
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

/** A trained merge table plus both encoders. Serializable — rides task
  * closures and codegen references; the rank map and memo rebuild lazily
  * per JVM. */
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

  /** Bounded per-JVM chunk→count memo (Zipfian chunk reuse); cleared
    * wholesale if it ever exceeds the cap — correctness never depends on
    * it, and the cap bounds executor heap. */
  @transient private lazy val memo = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val MemoCap = 1 << 17

  /** GREEDY min-rank encoder (the query path): token count of `text`. */
  def countTokens(text: String): Long = {
    var n = 0L
    val it = BpeTokenizer.chunksOf(text)
    while (it.hasNext) n += chunkTokens(it.next())
    n
  }

  private def chunkTokens(chunk: String): Int = {
    val hit = memo.get(chunk)
    if (hit != null) return hit.intValue()
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
    if (memo.size() >= MemoCap) memo.clear()
    memo.put(chunk, Integer.valueOf(c))
    c
  }

  /** RANK-ORDER REPLAY encoder (the independent golden path): apply each
    * merge in training order, one left-to-right sweep each. Shares only
    * the chunker with the greedy path. */
  def countTokensReference(text: String): Long = {
    var n = 0L
    val it = BpeTokenizer.chunksOf(text)
    while (it.hasNext) {
      var w = latin1Vec(it.next())
      merges.foreach(p => w = BpeTokenizer.applyMergeSweep(w, p))
      n += w.length
    }
    n
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
