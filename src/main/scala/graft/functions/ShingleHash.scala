package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst kernel: positional n-token shingle hashes — the
  * md5-60bit array every LSH/span operator derives from a token array
  * (r16 optimization round).
  *
  * Replaces the expression-tree form
  * `transform(sequence(1, size(toks)-(n-1)),
  *    i => conv(substring(md5(concat_ws(" ", slice(toks, i, n))), 1, 15),
  *              16, 10).cast("long"))`
  * whose higher-order transform is CodegenFallback: per shingle it
  * interpreted a 6-node expression tree, allocated a sliced array, a
  * concat_ws UTF8String, a 32-char hex string, a substring, and a conv
  * decimal string — stage profiles put the three q193 passes at ~20 s
  * CPU and q205's fold at ~7 s CPU at sf0.1, dominated by that churn,
  * not by MD5 itself.
  *
  * The kernel feeds token bytes straight into one thread-local
  * MessageDigest per shingle (single space separator between non-null
  * tokens — exactly concat_ws(" ", ...) semantics, which SKIPS null
  * elements) and reads the 60-bit value directly from the digest's
  * first 8 bytes: first 15 hex digits of md5 == top 60 bits big-endian
  * == (bytes[0..7] as big-endian long) >>> 4 — bit-identical to
  * conv(substring(md5(x), 1, 15), 16, 10) for every input, with no
  * intermediate hex/decimal strings. Output element type is
  * non-nullable (md5 of a non-null string never nulls); a null token
  * ARRAY returns null. size < n returns an empty array — the old
  * expression THREW there (slice start 0 via the descending sequence),
  * which production never reached because every call site filters
  * size >= n first; the kernel is total on that unreachable region.
  */
case class ShingleHash60(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle_hash60 needs n > 0, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash60 requires array<string> input, got $t")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleHash60.compute(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash60.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

object ShingleHash60 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')
  private val out = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Invoked from both interpreted eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val count = sz - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    // pre-extract token bytes once per row (getUTF8String would re-read
    // per window otherwise; null elements stay null = concat_ws skip)
    val bytes = new Array[Array[Byte]](sz)
    var j = 0
    while (j < sz) {
      if (!toks.isNullAt(j)) bytes(j) = toks.getUTF8String(j).getBytes
      j += 1
    }
    val digest = md.get()
    val buf = out.get()
    val res = new Array[Long](count)
    var i = 0
    while (i < count) {
      digest.reset()
      var first = true
      var k = i
      val end = i + n
      while (k < end) {
        val b = bytes(k)
        if (b != null) {
          if (!first) digest.update(SPACE)
          digest.update(b)
          first = false
        }
        k += 1
      }
      digest.digest(buf, 0, 16)
      // first 15 hex digits == top 60 bits big-endian
      val hi = ((buf(0) & 0xffL) << 56) | ((buf(1) & 0xffL) << 48) |
        ((buf(2) & 0xffL) << 40) | ((buf(3) & 0xffL) << 32) |
        ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
        ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)
      res(i) = hi >>> 4
      i += 1
    }
    new GenericArrayData(res)
  }

  private def name(n: Int) = s"shingle_hash60_$n"

  /** Register the n-token variant (idempotent per session; n is baked
    * into the function NAME because one query may use several widths —
    * q193 ranks n = 8/16/32 in a single plan). */
  def register(spark: SparkSession, n: Int): Unit =
    Registry.ensure(spark, name(n))(exprs => ShingleHash60(exprs.head, n))

  /** Column API; requires register(spark, n) once per session. */
  def apply(toks: Column, n: Int): Column = call_function(name(n), toks)
}

/** Positional n-gram STRINGS (r17): the shingle strings themselves, for
  * pipelines whose n-gram is the value or key downstream (bigram LM
  * counts q57/q75/q82/q101/q227, trigram repetition q67/q70/q240) —
  * exactly `transform(sequence(1, size-(n-1)),
  *           i => concat_ws(" ", slice(toks, i, n)))`
  * (and the element_at bigram form, which builds the same strings),
  * minus the interpreted higher-order transform and its per-element
  * slice/sequence churn. Null tokens are skipped like concat_ws; null
  * ARRAY → null (call sites explode, where null and the old form's
  * empty array are indistinguishable, or coalesce explicitly);
  * size < n → empty array. */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle_strings needs n > 0, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_strings requires array<string> input, got $t")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleStrings.compute(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleStrings.compute($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleStrings = copy(child = newChild)
}

object ShingleStrings {

  /** Invoked from both interpreted eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val count = sz - (n - 1)
    if (count <= 0)
      return new GenericArrayData(
        Array.empty[org.apache.spark.unsafe.types.UTF8String])
    val bytes = new Array[Array[Byte]](sz)
    var j = 0
    while (j < sz) {
      if (!toks.isNullAt(j)) bytes(j) = toks.getUTF8String(j).getBytes
      j += 1
    }
    val res = new Array[org.apache.spark.unsafe.types.UTF8String](count)
    var i = 0
    while (i < count) {
      var len = 0; var nt = 0
      var k = i; val end = i + n
      while (k < end) {
        val b = bytes(k)
        if (b != null) { len += b.length; nt += 1 }
        k += 1
      }
      if (nt > 1) len += nt - 1
      val sb = new Array[Byte](len)
      var p = 0; var first = true
      k = i
      while (k < end) {
        val b = bytes(k)
        if (b != null) {
          if (!first) { sb(p) = ' '; p += 1 }
          System.arraycopy(b, 0, sb, p, b.length)
          p += b.length
          first = false
        }
        k += 1
      }
      res(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(sb)
      i += 1
    }
    new GenericArrayData(res)
  }

  private def name(n: Int) = s"shingle_strings_$n"

  /** Idempotent per session; n baked into the name. */
  def register(spark: SparkSession, n: Int): Unit =
    Registry.ensure(spark, name(n))(exprs => ShingleStrings(exprs.head, n))

  /** Column API; requires register(spark, n) once per session. */
  def apply(toks: Column, n: Int): Column = call_function(name(n), toks)
}

/** DISTINCT-set variant (r17): hashes of the distinct shingle STRINGS in
  * first-occurrence order — exactly
  * `transform(array_distinct(TextOps.shingles(toks, n)), shingleHash60)`,
  * the form every set-semantics LSH pipeline (shingleHashes →
  * q24/q25/q31/q60/q68 + the decontamination family) derived through an
  * interpreted higher-order transform + per-shingle string churn.
  *
  * Distinctness is decided on the SHINGLE STRING (byte equality), not on
  * the 60-bit hash: two distinct strings whose md5-60 collide emit BOTH
  * hash copies, exactly like the expression form and the DuckDB oracle's
  * `list_distinct` — the kernel never conflates a collision with a
  * duplicate. Null-token skipping, the size < n empty result and the
  * null-array result match [[ShingleHash60]]. */
case class ShingleHash60Distinct(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"shingle_hash60_distinct needs n > 0, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash60_distinct requires array<string> input, got $t")
  }

  override def nullSafeEval(toks: Any): Any =
    ShingleHash60Distinct.compute(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash60Distinct.compute($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHash60Distinct = copy(child = newChild)
}

object ShingleHash60Distinct {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val out = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Invoked from both interpreted eval and generated code. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val count = sz - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val bytes = new Array[Array[Byte]](sz)
    var j = 0
    while (j < sz) {
      if (!toks.isNullAt(j)) bytes(j) = toks.getUTF8String(j).getBytes
      j += 1
    }
    val digest = md.get()
    val buf = out.get()
    val res = new Array[Long](count)
    var m = 0
    // distinctness on the BUILT shingle bytes (ISO-8859-1 preserves the
    // byte sequence 1:1, so String equality == byte equality); the built
    // array also feeds md5 in one update, so the copy is not extra work
    val seen = new java.util.HashSet[String](count * 2)
    var i = 0
    while (i < count) {
      var len = 0; var nt = 0
      var k = i; val end = i + n
      while (k < end) {
        val b = bytes(k)
        if (b != null) { len += b.length; nt += 1 }
        k += 1
      }
      if (nt > 1) len += nt - 1 // single-space separators (concat_ws)
      val sb = new Array[Byte](len)
      var p = 0; var first = true
      k = i
      while (k < end) {
        val b = bytes(k)
        if (b != null) {
          if (!first) { sb(p) = ' '; p += 1 }
          System.arraycopy(b, 0, sb, p, b.length)
          p += b.length
          first = false
        }
        k += 1
      }
      if (seen.add(new String(sb, java.nio.charset.StandardCharsets.ISO_8859_1))) {
        digest.reset()
        digest.update(sb)
        digest.digest(buf, 0, 16)
        val hi = ((buf(0) & 0xffL) << 56) | ((buf(1) & 0xffL) << 48) |
          ((buf(2) & 0xffL) << 40) | ((buf(3) & 0xffL) << 32) |
          ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
          ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)
        res(m) = hi >>> 4
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(res, m))
  }

  private def name(n: Int) = s"shingle_hash60_distinct_$n"

  /** Idempotent per session; n baked into the name (several widths can
    * coexist in one plan). */
  def register(spark: SparkSession, n: Int): Unit =
    Registry.ensure(spark, name(n))(
      exprs => ShingleHash60Distinct(exprs.head, n))

  /** Column API; requires register(spark, n) once per session. */
  def apply(toks: Column, n: Int): Column = call_function(name(n), toks)
}
