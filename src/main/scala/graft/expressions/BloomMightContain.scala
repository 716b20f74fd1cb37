package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a serialized Bloom filter —
  * the scale lever for semi-join prefiltering when the build side's key
  * SET is too large to broadcast exactly but its SKETCH is not (a 10^8-key
  * benchmark set is gigabytes as an exact broadcast set, ~100 MB as a 1%
  * Bloom filter). The probe side applies this as a plain scan-side Filter
  * BELOW its shuffle, so the exchange carries only true hits plus the fpp
  * fraction — the same rationale as Spark's internal runtime-bloom rewrite
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), made explicit and
  * plannable by the caller.
  *
  * Children: `left` is the LongType key hash (the engine's xxhash64
  * shingle domain — same 2^-64 collision trade DedupOps documents);
  * `right` is the Bloom filter serialized by `BloomMightContain.serialize`,
  * required FOLDABLE (a binary literal) so the filter deserializes once on
  * the driver at codegen/eval setup, never per row. False positives are the
  * caller's contract (always followed by an exact verify here); false
  * negatives cannot occur, which is what makes a bloom-prefiltered
  * semi-join EXACT once verified.
  *
  * Null semantics: null hash yields null (null-intolerant, like every
  * scalar here); a null filter literal is a type-check error, not a
  * runtime surprise.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        // Reject a null literal HERE so both execution paths agree: without
        // this, the interpreted path silently null-propagates per row while
        // the codegen path throws at planning time inside the lazy
        // deserialize — same rule as Spark's own BloomFilterMightContain.
        if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            "graft_might_contain requires a non-null bloom literal")
        else TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_might_contain requires a foldable (literal) bloom argument")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_might_contain requires (bigint, binary) inputs, got ($l, $r)")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_might_contain"

  // Deserialized once per expression instance (driver at planning/codegen;
  // executor once per task after plan deserialization) — never per row.
  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "graft_might_contain: bloom literal is null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  // `bytes` (the per-row evaluation of the literal child, a cheap value
  // fetch — BinaryExpression evaluates both children before calling this)
  // is deliberately ignored in favor of the once-deserialized lazy bloom;
  // the codegen path skips the child evaluation entirely, which is the
  // only cost difference between the two paths.
  override def nullSafeEval(h: Any, bytes: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The filter object rides the codegen references array (BloomFilter is
    // Serializable — the same mechanism Spark's runtime bloom uses); the
    // serialized literal child is deliberately NOT evaluated in the
    // generated code, so no per-row byte-array materialization.
    val bf = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    val leftGen = left.genCode(ctx)
    val code =
      code"""
        |${leftGen.code}
        |boolean ${ev.isNull} = ${leftGen.isNull};
        |boolean ${ev.value} = false;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $bf.mightContainLong(${leftGen.value});
        |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** Serialize a Bloom filter for embedding as a plan literal. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** Column-API entry point: `might(xxhash64(col), serializedBloom)` —
    * resolves through the function registry (GraftExtensions). */
  def might(hash: Column, serialized: Array[Byte]): Column =
    call_function("graft_might_contain", hash, lit(serialized))
}
