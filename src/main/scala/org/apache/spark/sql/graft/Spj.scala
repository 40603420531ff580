package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Storage-partitioned-join plumbing the graft catalog needs from inside
  * the `org.apache.spark.sql` namespace (`FilePartition` subclassing and
  * the exact engine hash).
  *
  * A graft table hidden-partitioned by `bucket(n, k)` lands every file
  * single-bucket ([[graft.sinks.VersionedTable]] records the derived
  * bucket id as a per-file stat). Re-serving those files as key-grouped
  * input partitions lets Spark's v2 bucketing (KeyGroupedPartitioning +
  * EnsureRequirements) plan a co-bucketed join — or a group-by on the
  * key — with ZERO Exchange on the graft side: at 100 TB the shuffle a
  * fact-fact join would otherwise pay is the whole cost of the query. */
object Spj {

  /** A stock parquet file partition that also carries its bucket id as
    * the partition key — `FilePartitionReaderFactory` reads it like any
    * other FilePartition (the subclass adds metadata, not behavior), and
    * `DataSourceV2ScanExecBase` groups by the key. */
  final class BucketedFilePartition(index0: Int,
      files0: Array[PartitionedFile], bucketId: Int)
      extends FilePartition(index0, files0) with HasPartitionKey {
    override def partitionKey(): InternalRow = InternalRow(bucketId)
  }

  /** Re-serve a stock parquet Batch key-grouped: every `PartitionedFile`
    * (splits included — a file's splits share its bucket) lands in the
    * partition of its file's bucket id, and `reportedBuckets` pins the
    * partition-KEY set so runtime (DPP) filtering that empties a bucket
    * yields an empty partition rather than a changed key set (which
    * BatchScanExec would reject). The reader factory is the inner
    * batch's own — the subclass partitions add metadata, not behavior.
    * Trade-off, stated: one partition per bucket gives up split-level
    * parallelism on the grouped side; that is the SPJ bargain (Spark's
    * own bucketed tables make the same one). */
  def groupByBucket(inner: Batch, reportedBuckets: Seq[Int],
                    idOfPath: String => Int): Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val pfs: Array[PartitionedFile] = inner.planInputPartitions().flatMap {
        case f: FilePartition => f.files
        case other => throw new IllegalStateException(
          s"bucketed graft scan planned a non-file partition: $other")
      }
      val byBucket = pfs.groupBy(pf =>
        idOfPath(pf.filePath.toPath.toUri.getPath))
      reportedBuckets.sorted.zipWithIndex.map { case (bid, i) =>
        new BucketedFilePartition(i,
          byBucket.getOrElse(bid, Array.empty[PartitionedFile]), bid)
          : InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      inner.createReaderFactory()
  }

  /** The engine's bucket id for an INTERNAL value of type `dt` — the
    * same `pmod(hash(v), n)` every landing clusters with
    * ([[graft.sinks.PartitionTransform.Bucket]].expr; `hash` is
    * Murmur3 seed 42), evaluated through the Catalyst expression itself
    * so build and probe can never drift. */
  def bucketIdOf(v: Any, dt: DataType, n: Int): Int = {
    val h = Murmur3Hash(Seq(Literal.create(v, dt)), 42)
      .eval(InternalRow.empty).asInstanceOf[Int]
    ((h % n) + n) % n
  }

  /** The catalog-exposed `bucket(n, col)` function identity: Spark
    * resolves a scan's reported `bucket` transform against the owning
    * catalog's FunctionCatalog, and two scans are shuffle-compatible
    * exactly when their bound functions share a canonical name (and
    * bucket count). `produceResult` computes the engine's real bucket id
    * so Spark may also EVALUATE the transform (partially-clustered SPJ
    * shuffles one side by the other's layout). */
  object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): the graft engine's pmod(murmur3(col), n) " +
        "clustering transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType,
        s"bucket expects (numBuckets INT, value), got $inputType")
      new BoundBucket(inputType.fields(1).dataType)
    }
  }

  final class BoundBucket(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${dt.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      bucketIdOf(input.get(1, dt), dt, input.getInt(0))
  }
}
