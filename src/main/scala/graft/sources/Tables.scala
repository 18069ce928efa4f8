package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet testdata loader: `dir/<name>.parquet` under a scale-factor dir.
  *
  * The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which
  * Spark only reads under `spark.sql.legacy.parquet.nanosAsLong=true`
  * (as nanosecond longs). Sessions created by Verify/Bench/tests set
  * that flag, and this loader floor-truncates the nanos to microsecond
  * timestamps so downstream operators see a real TimestampType column.
  * (`DIV` keeps the arithmetic in integer space — a double division
  * would lose precision above 2^53 ns.)
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case None => df
    }
  }
}
