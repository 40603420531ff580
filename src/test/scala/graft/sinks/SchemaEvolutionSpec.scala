package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("discoverSchema unions vintages; old rows read NULL for new columns") {
    val dir = tmpDir("graft_evo_")
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "k", "extra")
      .write.mode("append").parquet(dir)
    val schema = SchemaEvolution.discoverSchema(spark, dir)
    assert(schema.fieldNames.toSet == Set("id", "k", "extra"))
    val rows = SchemaEvolution.evolvedRead(spark, dir, schema)
    assert(rows.count() == 4)
    assert(rows.filter(col("extra").isNull).count() == 2)
    assert(rows.filter(col("extra").isNotNull)
      .agg(sum(col("extra"))).head().getLong(0) == 70L)
  }

  test("explicit-schema read needs no footer sampling and matches discovery") {
    val dir = tmpDir("graft_evo2_")
    Seq((1L, "a")).toDF("id", "k").write.mode("append").parquet(dir)
    Seq((2L, "b", 5L)).toDF("id", "k", "extra")
      .write.mode("append").parquet(dir)
    // catalog-style: the evolved schema is KNOWN, passed without discovery
    val cataloged = new StructType()
      .add("id", LongType).add("k", org.apache.spark.sql.types.StringType)
      .add("extra", LongType)
    val a = SchemaEvolution.evolvedRead(spark, dir, cataloged)
      .orderBy("id").collect().toSeq
    val b = SchemaEvolution.evolvedRead(spark, dir,
      SchemaEvolution.discoverSchema(spark, dir)).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("a column can also be read back out of history (projection subset)") {
    val dir = tmpDir("graft_evo3_")
    Seq((1L, "a", 5L)).toDF("id", "k", "extra")
      .write.mode("append").parquet(dir)
    // reading under the OLD schema (column dropped from the catalog view)
    val old = new StructType()
      .add("id", LongType).add("k", org.apache.spark.sql.types.StringType)
    val rows = SchemaEvolution.evolvedRead(spark, dir, old)
    assert(rows.schema.fieldNames.toSeq == Seq("id", "k"))
    assert(rows.count() == 1)
  }
}
