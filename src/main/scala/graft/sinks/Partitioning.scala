package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden partitioning — Iceberg-style partition TRANSFORMS declared once
  * at the table, applied automatically by every landing path. The point
  * (and the difference from Hive-style explicit partition columns) is
  * that readers and writers never mention the partition value: a writer
  * lands plain rows, the table clusters them by the declared transforms
  * and records the covering stats, and a reader's plain range or equality
  * probe on the SOURCE column prunes files with no manual optimize pass
  * and no derived column in any query.
  *
  * Reference scope: the reference pipeline partitions its landing by the
  * observation timestamp implicitly (one row per 2-minute cycle, keyed
  * dt_iso — mnassrib/weather-etl-docker-airflow-project/dags/weather_etl.py:158–184);
  * at 100 TB that becomes "cluster by day + bucket by key", which is
  * exactly what these transforms declare once instead of per-query.
  *
  * Scale shape: clustering is ONE range shuffle of the incoming batch
  * (`repartitionByRange` on the transform values, sampled bounds), cost
  * O(batch) per landing, never O(table); the covering stats ride in the
  * same per-file grouped aggregate every clustered landing already pays.
  * Order-preserving transforms (identity / days / truncate) make the
  * SOURCE column's min/max tight per file, so the existing range-stats
  * pruning works unchanged; bucket is not order-preserving, so it records
  * a DERIVED stat line under the transform's own spec string, consulted
  * by equality probes ([[VersionedTableOps.prunedFilesEq]]).
  */
sealed trait PartitionTransform {
  /** The source column the transform derives from. */
  def source: String
  /** Canonical spec string — the on-disk form, also the stats "column"
    * name for derived (non-order-preserving) transforms. */
  def spec: String
  /** The clustering expression, typed against the source column's actual
    * data type (truncate means prefix for strings, floor-to-width for
    * numbers — one spec, type-directed semantics). */
  def expr(dt: DataType): Column
  /** Stats names a landing must record per file so probes on the source
    * column prune: the source itself when the transform preserves order,
    * the spec string when the stat is a derived value. */
  def statNames: Seq[String]
}

object PartitionTransform {

  /** identity(c): cluster by the raw value. */
  final case class Identity(source: String) extends PartitionTransform {
    val spec = s"identity($source)"
    def expr(dt: DataType): Column = col(source)
    val statNames = Seq(source)
  }

  /** days(c): cluster a timestamp/date column by calendar day. Order-
    * preserving in the source, so source-column stats cover it. */
  final case class Days(source: String) extends PartitionTransform {
    val spec = s"days($source)"
    def expr(dt: DataType): Column = to_date(col(source))
    val statNames = Seq(source)
  }

  /** truncate(w, c): strings cluster by their first `w` chars, numbers by
    * floor-to-multiple-of-`w` — both order-preserving. */
  final case class Truncate(width: Int, source: String)
      extends PartitionTransform {
    require(width >= 1, s"truncate width must be >= 1: $width")
    val spec = s"truncate($width,$source)"
    def expr(dt: DataType): Column = dt match {
      case StringType => substring(col(source), 1, width)
      case ByteType | ShortType | IntegerType | LongType | _: DecimalType =>
        col(source) - pmod(col(source), lit(width))
      case other => throw new IllegalArgumentException(
        s"truncate($width,$source) needs a string or integral column, " +
          s"got $other")
    }
    val statNames = Seq(source)
  }

  /** bucket(n, c): cluster by `pmod(hash(c), n)` — the co-location
    * transform for a high-cardinality key. NOT order-preserving: the
    * derived bucket id is recorded as its own stats line (named by
    * `spec`) and consulted by equality probes, which hash their probe
    * values through the same expression. */
  final case class Bucket(n: Int, source: String) extends PartitionTransform {
    require(n >= 2, s"bucket count must be >= 2: $n")
    val spec = s"bucket($n,$source)"
    def expr(dt: DataType): Column = pmod(hash(col(source)), lit(n))
    val statNames = Seq(spec)
  }

  private val DaysRe = """days\(([^(),]+)\)""".r
  private val IdentityRe = """identity\(([^(),]+)\)""".r
  private val TruncateRe = """truncate\((\d+),([^(),]+)\)""".r
  private val BucketRe = """bucket\((\d+),([^(),]+)\)""".r

  /** Parse a canonical spec string; loud on anything else. */
  def parse(spec: String): PartitionTransform = parseOpt(spec).getOrElse(
    throw new IllegalArgumentException(
      s"not a partition transform: '$spec' (expected identity(c), " +
        s"days(c), truncate(w,c) or bucket(n,c))"))

  /** A stats "column" name is either a plain column or a transform spec —
    * this is the discriminator (a real column name never carries parens). */
  def parseOpt(spec: String): Option[PartitionTransform] = spec match {
    case DaysRe(c) => Some(Days(c.trim))
    case IdentityRe(c) => Some(Identity(c.trim))
    case TruncateRe(w, c) => Some(Truncate(w.toInt, c.trim))
    case BucketRe(n, c) => Some(Bucket(n.toInt, c.trim))
    case _ => None
  }

  /** The declared clustering applied to a batch: one range shuffle on the
    * transform values (each output file covers a contiguous transform
    * range → tight per-file stats), rows sorted within partitions so
    * parquet row groups cluster too. AQE may coalesce small ranges —
    * contiguity, and therefore pruning, survives coalescing. */
  /** Exact clustering for a PURE `bucket(n, k)` spec: every output
    * partition IS one bucket (partition index = bucket id, a
    * deterministic [[org.apache.spark.Partitioner]]), so every landed
    * file provably holds a single bucket — the invariant
    * storage-partitioned joins hang on ([[graft.sinks
    * .VersionedTableOps.bucketLayout]]). Range clustering cannot give
    * this: sampled boundaries may straddle a bucket, and one straddling
    * file forfeits the whole table's shuffle-free join. Also CHEAPER at
    * scale than the range path: a hash partitioner needs no sampling
    * pass over the batch. Lands exactly `n` files per landing (empty
    * buckets write nothing); the declared numFiles is a range-path
    * knob and does not apply. */
  def clusterExactBuckets(df: DataFrame, b: Bucket): DataFrame = {
    require(df.columns.contains(b.source),
      s"partition transform ${b.spec} references column '${b.source}' " +
        s"absent from the batch (${df.columns.mkString(", ")})")
    val spark = df.sparkSession
    val dt = df.schema(b.source).dataType
    val schema = df.schema
    // the key column's name must be one the batch provably lacks: on a
    // name hit withColumn REPLACES in place instead of appending, and the
    // positional strip below would then drop a real data column
    val tmp = Iterator.from(0).map(i => s"__bucket$i")
      .find(n => !df.columns.contains(n)).get
    val withKey = df.withColumn(tmp, b.expr(dt))
    val keyIdx = withKey.schema.fieldIndex(tmp)
    val keyed = withKey.rdd.map(r =>
      (r.getInt(keyIdx), Row.fromSeq(r.toSeq.patch(keyIdx, Nil, 1))))
    val byBucket = keyed.partitionBy(new org.apache.spark.Partitioner {
      override def numPartitions: Int = b.n
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }).values
    spark.createDataFrame(byBucket, schema)
  }

  /** The landing-path dispatcher: a pure single-bucket spec clusters
    * exactly (see [[clusterExactBuckets]] — partition = bucket, the SPJ
    * invariant); everything else takes the sampled range shuffle. */
  def clusterFor(df: DataFrame, transforms: Seq[PartitionTransform],
                 numFiles: Int): DataFrame = transforms match {
    case Seq(b: Bucket) => clusterExactBuckets(df, b)
    case _ => cluster(df, transforms, numFiles)
  }

  def cluster(df: DataFrame, transforms: Seq[PartitionTransform],
              numFiles: Int): DataFrame = {
    val exprs = transforms.map { t =>
      require(df.columns.contains(t.source),
        s"partition transform ${t.spec} references column '${t.source}' " +
          s"absent from the batch (${df.columns.mkString(", ")})")
      t.expr(df.schema(t.source).dataType)
    }
    df.repartitionByRange(numFiles, exprs: _*)
      .sortWithinPartitions(exprs: _*)
  }
}
