package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType embedding columns using built-in higher-order
  * functions — codegen-friendly, no UDFs (SURVEY.md §7.1 design rule).
  * Accumulation is a sequential left fold in double precision, which makes
  * scores bit-deterministic regardless of partitioning.
  */
object VectorFunctions {

  /** Dot product of two array columns, accumulated in double. Backed by
    * the custom [[graft.functions.ArrayDotProduct]] expression — one tight
    * JVM loop per row; bit-identical to the HOF formulation
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` (sequential double fold). */
  def dot(a: Column, b: Column): Column = FastExpressions.arrayDot(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, x) => acc + x)
}
