package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftImplicitCastInputTypes
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 60-bit md5 prefix every sketch/minhash operator keys on —
  * `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)` — computed
  * natively from the digest BYTES: first 7 bytes plus the high nibble of
  * byte 7, exactly the value the 15-hex-char parse produces, with no
  * 32-char hex string materialized and re-parsed per row. The DuckDB
  * oracles keep the textual hex form (the VALUE is identical, which is
  * all the hash gate compares); the streaming HLL path
  * ([[graft.operators.Sketches.updateRegisters]]) already used this byte
  * assembly — [[Md5Hash60.hash60]] is now the single shared definition,
  * so batch SQL, batch native, and streaming state can never drift.
  *
  * Measured motivation: the same hex-chain-vs-native trade appeared twice
  * before (bloom probe md5-hex 1.62 s → native-style hashing 0.74 s per
  * 600k rows; streaming HLL 2.4 → 0.9 s after direct byte assembly).
  */
object Md5Hash60 {
  /** Column API: 60-bit md5 prefix of a string column, as BIGINT. */
  def md5_hash60(c: Column): Column =
    GraftColumnBridge.column(Md5Hash60(GraftColumnBridge.expression(c)))

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes): 7 full bytes + the high nibble of byte
    * 7 — identical to parsing the first 15 hex chars of the digest. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** UTF8String entry point for generated code (md5() hashes UTF-8 bytes,
    * and UTF8String.getBytes IS those bytes). */
  def hash60(s: UTF8String): Long = hash60(s.getBytes)
}

case class Md5Hash60(child: Expression) extends UnaryExpression
  with GraftImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"
  override def declaredInputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Static forwarder on the companion class — one call per row, no hex
    // string; the MessageDigest is thread-local inside.
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Md5Hash60.hash60($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
