package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.core.{Ensemble, EnsembleOp}

/** Graph mechanics beyond the linear spine: branch concat (the reference's
  * `node_a + node_b`) and the user-defined-operator surface (the
  * reference's `PlusTwoOp`, tests/unit/systems/utils/ops.py:26-48). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** The reference UDx example: add 2 to each selected column. Subclassing
    * EnsembleOp IS our UDF/UDTF surface — transform + schema contract. */
  case class PlusTwoOp(cols: Seq[String]) extends EnsembleOp {
    override def transformSchema(in: StructType): StructType = {
      cols.foreach(requireCol(in, _))
      StructType(in ++ cols.map(c => in(c).copy(name = c + "_plus_2")))
    }
    override def transform(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c + "_plus_2", col(c) + 2))
  }

  test("custom operator participates in ensembles like built-ins") {
    val df = Seq((1, 10, 20), (2, 30, 40)).toDF("requestId", "x", "y")
    val ens = Ensemble(Seq(PlusTwoOp(Seq("x", "y")), Selection(
      Seq("requestId", "x_plus_2", "y_plus_2"))), df.schema)
    val out = ens.transform(df).orderBy("requestId")
      .as[(Int, Int, Int)].collect()
    assert(out.toSeq == Seq((1, 12, 22), (2, 32, 42)))
  }

  test("an Ensemble nests inside another Ensemble as a subgraph") {
    val df = Seq((1, 5), (2, 6)).toDF("requestId", "x")
    val inner = Ensemble(Seq(PlusTwoOp(Seq("x"))), df.schema)
    val outer = Ensemble(Seq(inner, Rename(Map("x_plus_2" -> "y"))), df.schema)
    assert(outer.outputSchema.fieldNames.toSeq == Seq("requestId", "x", "y"))
    val out = outer.transform(df).orderBy("requestId").as[(Int, Int, Int)].collect()
    assert(out.toSeq == Seq((1, 5, 7), (2, 6, 8)))
  }

  test("row union across sources aligns columns by name") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id")
    val u = a.unionByName(b)
    assert(u.count() == 2 && u.columns.toSeq == Seq("id", "v"))
  }

  test("ConcatColumns unions two branch outputs on the request key") {
    val root = Seq((1, "a"), (2, "b")).toDF("requestId", "v")
    // two branches derived from the same root (reference test_graph.py:53-62)
    val branchA = PlusTwoOp(Seq("n")).transform(
      root.withColumn("n", length($"v")))
    val branchB = Rename(Map("v" -> "v2")).transform(root)
    val ens = Ensemble(Seq(ConcatColumns(branchB)), branchA.schema)
    val out = ens.transform(branchA)
    assert(out.columns.toSet == Set("requestId", "v", "n", "n_plus_2", "v2"))
    assert(out.count() == 2)
  }
}
