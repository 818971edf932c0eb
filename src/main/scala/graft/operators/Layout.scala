package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the file-layout half of data skipping
  * at 100 TB. A table laid out by a SINGLE sort column gives parquet
  * row-group min/max stats that prune scans on that column only; bit-
  * interleaving the (normalized) values of N columns into one Morton key
  * and range-partitioning + sorting by it makes EVERY interleaved
  * column's per-file span narrow (~range/2^(bits_allocated/N)), so
  * predicates on ANY of them skip most files. This is the standard
  * multi-dimensional clustering trick of the lakehouse engines,
  * described publicly since Orenstein & Merrett 1984 ("A class of data
  * structures for associative searching").
  *
  * Everything here is exact integer math (subtract-and-shift
  * normalization, bit interleaving) so the layout — and the per-bucket
  * stats report that proves its effectiveness — is bit-reproducible in
  * any engine: no doubles, no sampling, no UDFs; plain codegen'd
  * shift/and/or columns, one scan plus one bucket-count-sized shuffle
  * for the stats report, one range exchange for the write path.
  *
  * Reference scope note: the reference engine stores one series per
  * key-ordered store (timeseries.re) and has no multi-column layout
  * story; this module is part of the beyond-parity training-data
  * pipeline surface.
  */
object Layout {

  /** Morton value: interleave the low `bits` bits of each (already
    * normalized, non-negative) column, dimension d's bit b landing at
    * position `b * ndims + d` — so for two dims the even positions are
    * dim 0 and the odd positions dim 1. Total `bits * ndims` must fit a
    * long with headroom (≤ 62).
    */
  def zvalue(ns: Seq[Column], bits: Int): Column = {
    require(ns.nonEmpty, "zvalue needs at least one column")
    require(bits >= 1 && bits * ns.size <= 62,
      s"bits=$bits over ${ns.size} dims exceeds the 62-bit z budget")
    ns.zipWithIndex.map { case (n, d) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(n, b).bitwiseAND(lit(1L)), b * ns.size + d)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Signed shift that maps `[0, maxV-minV]` onto the full `[0, 2^bits)`
    * domain: bitLength(max-min) - bits. Positive → shift right (wide
    * ranges compress); NEGATIVE → shift left (narrow ranges STRETCH so
    * their high-order bits still land in the top interleave positions —
    * without the stretch, a dimension whose range uses fewer than `bits`
    * bits contributes constant zeros up top and the coarse buckets stop
    * discriminating on it; the standard equal-width trick of z-order
    * implementations). Shift (not divide) keeps the normalization a
    * single exact integer op on both the Spark side and any SQL oracle
    * (`length(bin(x))` is bitLength in DuckDB — no floating log2 at
    * power-of-two boundaries).
    */
  def normShift(minV: Long, maxV: Long, bits: Int): Int = {
    require(maxV >= minV, s"normShift: max $maxV < min $minV")
    val m = maxV - minV
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(m)
    bitLen - bits
  }

  /** Apply [[normShift]] to a column: `(c - min) >> s` or `<< -s`. */
  def normalize(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    val s = normShift(minV, maxV, bits)
    if (s >= 0) shiftright(c - lit(minV), s)
    else shiftleft(c - lit(minV), -s)
  }

  private def log2Exact(n: Int): Int = {
    require(n >= 1 && Integer.bitCount(n) == 1, s"$n is not a power of two")
    Integer.numberOfTrailingZeros(n)
  }

  /** Per-bucket effectiveness report for a Z-order layout over long
    * columns `cols`: bucket id (top log2(buckets) bits of the Morton
    * key), row count, each dimension's min/max within the bucket, and
    * the z span. Tight per-bucket spans on EVERY dimension are exactly
    * the property that makes min/max file skipping work after a z-write;
    * the report is the falsifiable form of that claim.
    *
    * The column min/max bounds collect to the driver first (ONE scalar
    * row — the trainCells model-parameter precedent; at scale these come
    * free from parquet footers) so the normalization constants enter the
    * plan as literals, keeping the single corpus scan broadcast-free and
    * fully codegen'd: scan → project (shift/and/or) → hash-aggregate on
    * `buckets` keys → tiny sort.
    */
  def zorderStats(df: DataFrame, cols: Seq[String], bits: Int = 12,
                  buckets: Int = 64): DataFrame = {
    require(cols.nonEmpty, "zorderStats needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits over ${cols.size} dims exceeds the 62-bit z budget")
    val zShift = bits * cols.size - log2Exact(buckets)
    require(zShift >= 0, s"buckets=$buckets exceeds 2^(bits*ndims)")
    val reserved = Set("bucket", "n_rows", "z_min", "z_max")
    require(cols.forall(c => !reserved.contains(c)),
      s"column names $cols collide with a zorderStats output column")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val spark = df.sparkSession
    val mm = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("long")), max(col(c).cast("long")))).head,
      cols.flatMap(c => Seq(min(col(c).cast("long")), max(col(c).cast("long")))).tail: _*
    ).head()
    if (mm.isNullAt(0)) {
      // empty input: the bounds agg already told us — emit the typed
      // empty frame without a second scan
      import org.apache.spark.sql.types._
      val fields = StructField("bucket", LongType) ::
        StructField("n_rows", LongType) ::
        cols.toList.flatMap(c => Seq(StructField(s"${c}_min", LongType),
          StructField(s"${c}_max", LongType))) :::
        List(StructField("z_min", LongType), StructField("z_max", LongType))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(fields))
    }
    val ns = cols.zipWithIndex.map { case (c, i) =>
      normalize(col(c).cast("long"), mm.getLong(2 * i), mm.getLong(2 * i + 1), bits)
    }
    val z = zvalue(ns, bits)
    df.select(cols.map(c => col(c).cast("long").as(c)) :+ z.as("__z"): _*)
      .groupBy(shiftright(col("__z"), zShift).as("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"))) ++
          Seq(min(col("__z")).as("z_min"), max(col("__z")).as("z_max")): _*)
      .orderBy("bucket")
  }

  /** The write path: append the Morton key and lay the frame out by it —
    * a range exchange on `z` (so files hold contiguous z runs) plus an
    * intra-partition sort (so row groups within a file are contiguous
    * too). Downstream `.write.parquet` then yields footer min/max stats
    * that are tight on every interleaved dimension. One shuffle, no
    * sampling beyond Spark's range-boundary sketch.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 12,
               numPartitions: Int = 0): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    require(!df.columns.contains("z"), "input already has a 'z' column")
    val mm = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("long")), max(col(c).cast("long")))).head,
      cols.flatMap(c => Seq(min(col(c).cast("long")), max(col(c).cast("long")))).tail: _*
    ).head()
    if (mm.isNullAt(0)) return df.withColumn("z", lit(0L))
    val ns = cols.zipWithIndex.map { case (c, i) =>
      normalize(col(c).cast("long"), mm.getLong(2 * i), mm.getLong(2 * i + 1), bits)
    }
    val withZ = df.withColumn("z", zvalue(ns, bits))
    val parts = if (numPartitions > 0) numPartitions
                else withZ.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(parts, col("z")).sortWithinPartitions("z")
  }
}
