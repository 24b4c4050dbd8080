package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.events must normalize every `ts` encoding the driver has shipped
  * (TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ micros, TIMESTAMP micros) to
  * the same (ts_ns, ts) pair. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(writer: String => Unit): (Seq[Long], Seq[Long]) = {
    val dir = Files.createTempDirectory("tables-spec").toString
    writer(s"$dir/events.parquet")
    val out = Tables.events(spark, dir)
      .select(col("ts_ns"), unix_micros(col("ts")))
      .orderBy("ts_ns").collect()
    (out.map(_.getLong(0)).toSeq, out.map(_.getLong(1)).toSeq)
  }

  private val micros = Seq(0L, 1L, 1700000000000000L, 1700000123456789L)

  test("events: TIMESTAMP column normalizes to exact micros") {
    val (ns, us) = roundTrip { p =>
      micros.toDF("m").select(timestamp_micros(col("m")).as("ts"))
        .write.parquet(p)
    }
    assert(us == micros)
    assert(ns == micros.map(_ * 1000L))
  }

  test("events: TIMESTAMP_NTZ column is instant-preserving under UTC session") {
    val (ns, us) = roundTrip { p =>
      micros.toDF("m")
        .select(timestamp_micros(col("m")).cast(TimestampNTZType).as("ts"))
        .write.parquet(p)
    }
    assert(us == micros)
    assert(ns == micros.map(_ * 1000L))
  }

  test("events: nanos-as-long column keeps exact sub-micro nanos in ts_ns") {
    // the nanosAsLong branch triggers on LongType: driver files store
    // TIMESTAMP(NANOS), which Spark surfaces as long under the legacy flag
    val nanos = Seq(0L, 999L, 1700000123456789123L)
    val (ns, us) = roundTrip { p =>
      nanos.toDF("ts").write.parquet(p)
    }
    assert(ns == nanos)
    assert(us == nanos.map(_ / 1000L)) // micros truncate like DuckDB NS→US
  }
}
