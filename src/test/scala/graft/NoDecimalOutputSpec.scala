package graft

import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, MapType, StructType}

/** Guard against the round-1 correctness defect: fixed-scale DECIMAL
  * output columns render trailing zeros (44506.10 vs 44506.1) and are
  * hash-unsafe under the driver's cross-engine canonicalization. Decimal
  * math must stay internal; every final projection is a rounded DOUBLE.
  *
  * Also guards the round-2 defect class: ARRAY/MAP/STRUCT output columns
  * are unhashable by the driver's pandas-based canonicalization
  * (embed_quantize shipped an array column and its oracle check errored
  * instead of running). Complex values must be projected in scalar form
  * (joined string / md5) before leaving a query.
  *
  * Also asserts the double cast is value-safe: every double output of the
  * money-heavy queries stays below 2^53/10^6, so a decimal(18,6) sum
  * re-expressed as a double is still exact at much larger scale factors.
  */
class NoDecimalOutputSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val schemas: Seq[(String, org.apache.spark.sql.types.StructType)] =
    SparkEntry.queries.toSeq.map { case (name, q) => name -> q(spark, dir).schema }

  test("no SparkEntry query outputs a fixed-scale DECIMAL column") {
    val offenders = schemas.flatMap { case (name, schema) =>
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] => s"$name.${f.name}"
      }
    }
    assert(offenders.isEmpty,
      s"DECIMAL output columns are hash-unsafe across engines: $offenders")
  }

  test("no SparkEntry query outputs an ARRAY/MAP/STRUCT column (driver hashes scalars only)") {
    val offenders = schemas.flatMap { case (name, schema) =>
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"$name.${f.name}"
      }
    }
    assert(offenders.isEmpty,
      s"complex-typed output columns break the driver's canonicalization: $offenders")
  }

  test("double-projected money values stay within exact-integer range (2^53/10^6)") {
    import org.apache.spark.sql.functions._
    val bound = math.pow(2, 53) / 1e6
    Seq("pricing_summary", "composed_revenue_report", "revenue_rollup").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val doubles = df.schema.fields.filter(_.dataType == DoubleType).map(_.name)
      assert(doubles.nonEmpty, s"$name should have double money columns")
      val absCols = doubles.map(c => abs(col(c)))
      val maxAbs = df
        .select((if (absCols.length == 1) absCols.head else greatest(absCols: _*)).as("m"))
        .agg(max(col("m"))).head().getDouble(0)
      assert(maxAbs < bound,
        s"$name max |value| $maxAbs exceeds exact-double bound $bound")
    }
  }
}
