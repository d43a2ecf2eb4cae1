package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter.
  *
  * Spark's own Bloom machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`) is reserved for the optimizer's runtime
  * row-level filtering and is not SQL-registered, so user plans can't
  * reach it. This expression fills that gap for the ingest-dedup path:
  * the filter is built once with the public `df.stat.bloomFilter` (a
  * tree-aggregated one-pass job over the corpus) and then probed
  * map-side here.
  *
  * The sketch rides in the expression and thus in the stage's task
  * binary, which Spark broadcasts once per executor — the same
  * distribution cost as the optimizer's own bloom literal. Probe
  * semantics match `stat.bloomFilter`'s build exactly: UTF-8 bytes for
  * strings, raw long for integral types (verified empirically — the
  * sketch library hashes string and binary identically for UTF-8
  * content).
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, binary, or integral argument, got ${dt.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(value: Any): Any = child.dataType match {
    case StringType => filter.mightContainBinary(value.asInstanceOf[UTF8String].getBytes)
    case BinaryType => filter.mightContainBinary(value.asInstanceOf[Array[Byte]])
    case LongType => filter.mightContainLong(value.asInstanceOf[Long])
    case IntegerType => filter.mightContainLong(value.asInstanceOf[Int].toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case StringType => s"${ev.value} = $bf.mightContainBinary($v.getBytes());"
      case BinaryType => s"${ev.value} = $bf.mightContainBinary($v);"
      case LongType => s"${ev.value} = $bf.mightContainLong($v);"
      case IntegerType => s"${ev.value} = $bf.mightContainLong((long) $v);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
