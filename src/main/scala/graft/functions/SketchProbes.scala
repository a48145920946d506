package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Row-side probes for Spark's mergeable sketches
  * (`org.apache.spark.util.sketch`): membership against a serialized
  * [[BloomFilter]] and frequency against a serialized [[CountMinSketch]].
  *
  * The sketch arrives as a foldable BINARY literal (built driver-side by
  * `graft.ops.SketchOps` in one distributed pass), so the plan ships it
  * once per stage through the broadcast task binary — NOT once per row.
  * Deserialization is cached per byte-array instance in [[SketchCache]],
  * so each task pays it once.
  *
  * Both probes are one-sided by construction (no false negatives): the
  * Bloom filter never rejects a present key and the count-min estimate
  * never undercounts. `graft.ops.SketchOps` exploits exactly that to keep
  * its operators EXACT — the sketch only prunes work, never the answer.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, left.foldable, right.dataType) match {
      case (BinaryType, true, StringType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, f, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (foldable binary sketch, string|bigint key), " +
          s"got (${l.catalogString}, foldable=$f, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  private lazy val keyIsString = right.dataType == StringType

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    if (keyIsString)
      SketchCache.bloomMightContainString(
        sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])
    else
      SketchCache.bloomMightContainLong(
        sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (keyIsString) "bloomMightContainString" else "bloomMightContainLong"
    defineCodeGen(ctx, ev, (b, v) => s"graft.functions.SketchCache.$fn($b, $v)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}

/** Count-min frequency estimate of a key — an upper bound on its true
  * count (overestimates by at most eps·N with the sketch's confidence). */
case class CmsEstimateCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, left.foldable, right.dataType) match {
      case (BinaryType, true, StringType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, f, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (foldable binary sketch, string|bigint key), " +
          s"got (${l.catalogString}, foldable=$f, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val keyIsString = right.dataType == StringType

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    if (keyIsString)
      SketchCache.cmsEstimateString(
        sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])
    else
      SketchCache.cmsEstimateLong(
        sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (keyIsString) "cmsEstimateString" else "cmsEstimateLong"
    defineCodeGen(ctx, ev, (b, v) => s"graft.functions.SketchCache.$fn($b, $v)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmsEstimateCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

/** Per-JVM deserialization cache for sketch byte images. Keys are the
  * byte-array INSTANCES (array equals is reference equality, so the
  * WeakHashMap is an identity map): a task deserializes each plan literal
  * once and the entry dies with the literal. Both eval and codegen go
  * through these helpers, so the two paths cannot diverge.
  *
  * The shared map is only the slow path: it is `synchronized`, and a
  * per-ROW synchronized get across 32 executor threads serializes the
  * whole scan (measured 5× on a 6M-row probe). Each thread memoizes its
  * last (bytes → sketch) hit in a ThreadLocal — probes overwhelmingly use
  * one sketch per stage, so the hot path is two identity reads, no lock.
  *
  * String keys are probed as their raw UTF-8 bytes: Spark's sketches hash
  * a string by exactly those bytes (`putString` = `putBinary(utf8)`), so
  * `mightContainBinary(key.getBytes)` is value-identical to
  * `mightContainString(key.toString)` minus the per-row String allocation
  * (SketchOpsSpec pins the equivalence against `df.stat`-built sketches). */
object SketchCache {

  private val blooms =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Byte], BloomFilter]())
  private val sketches =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Byte], CountMinSketch]())

  private val lastBloom = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](2)
  }
  private val lastCms = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](2)
  }

  private def bloom(bytes: Array[Byte]): BloomFilter = {
    val memo = lastBloom.get()
    if (memo(0) eq bytes) return memo(1).asInstanceOf[BloomFilter]
    var b = blooms.get(bytes)
    if (b == null) {
      b = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      blooms.put(bytes, b)
    }
    memo(0) = bytes
    memo(1) = b
    b
  }

  private def cms(bytes: Array[Byte]): CountMinSketch = {
    val memo = lastCms.get()
    if (memo(0) eq bytes) return memo(1).asInstanceOf[CountMinSketch]
    var c = sketches.get(bytes)
    if (c == null) {
      c = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      sketches.put(bytes, c)
    }
    memo(0) = bytes
    memo(1) = c
    c
  }

  def bloomMightContainString(bytes: Array[Byte], key: UTF8String): Boolean =
    bloom(bytes).mightContainBinary(key.getBytes)

  def bloomMightContainLong(bytes: Array[Byte], key: Long): Boolean =
    bloom(bytes).mightContainLong(key)

  def cmsEstimateString(bytes: Array[Byte], key: UTF8String): Long =
    cms(bytes).estimateCount(key.getBytes)

  def cmsEstimateLong(bytes: Array[Byte], key: Long): Long =
    cms(bytes).estimateCount(key)
}
