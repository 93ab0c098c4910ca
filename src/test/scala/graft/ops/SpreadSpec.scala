package graft.ops

import graft.{Sessions, T}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins T.spread's contract (SCALE.md #3): it repartitions compute-dense
  * pipelines ONLY when the input arrives as few files (the driver's
  * single-file layout → one row group → one scan task), and is literally
  * a no-op — same DataFrame reference, no added exchange — on many-file
  * inputs, which is what guarantees it never costs anything at scale. */
class SpreadSpec extends AnyFunSuite {

  private lazy val spark = Sessions.build("local[4]", 4)

  test("single-file input: spread repartitions to full parallelism") {
    import spark.implicits._
    val path = graft.Scratch.fresh("spread_single")
    (0 until 1000).toDF("v").repartition(1).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val out = T.spread(spark, df)
    assert(out ne df)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(out.count() === 1000L)
  }

  test("many-file input: spread is the identity — no repartition, no new plan") {
    import spark.implicits._
    val path = graft.Scratch.fresh("spread_many")
    (0 until 1000).toDF("v").repartition(16).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    assert(df.inputFiles.length >= 8)
    assert(T.spread(spark, df) eq df)
  }

  test("in-memory frames (no input files) engage harmlessly") {
    import spark.implicits._
    val df = (0 until 100).toDF("v")
    val out = T.spread(spark, df)
    assert(out.count() === 100L)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }
}
