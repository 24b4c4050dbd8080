package graft.data

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("fkOrphans counts unmatched and null child keys in one pass") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(4L), None, Some(3L)).toDF("fk")
    val r = Integrity.fkOrphans("fk", child, "fk", parent, "pk").collect()(0)
    assert(r.getString(0) == "fk")
    assert(r.getLong(1) == 2) // the 4L orphan + the null FK
    assert(r.getLong(2) == 5)
  }

  test("fkOrphans is clean when every key resolves (duplicate parents collapse)") {
    val parent = Seq(1L, 1L, 2L).toDF("pk") // dup parent keys must not multiply
    val child = Seq(1L, 2L, 2L, 2L).toDF("fk")
    val r = Integrity.fkOrphans("fk", child, "fk", parent, "pk").collect()(0)
    assert(r.getLong(1) == 0 && r.getLong(2) == 4)
  }

  test("dupKeyRows counts every row of a duplicated key") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("c", 1)).toDF("k", "v")
    val r = Integrity.dupKeyRows("pk", df, Seq("k")).collect()(0)
    assert(r.getLong(1) == 3 && r.getLong(2) == 5) // 3 rows of key "a"
    val multi = Integrity.dupKeyRows("pk2", df, Seq("k", "v")).collect()(0)
    assert(multi.getLong(1) == 0 && multi.getLong(2) == 5)
  }

  test("nullCount and audit union") {
    val df = Seq(Some(1), None, Some(3), None).toDF("v")
    val report = Integrity.audit(Seq(
      Integrity.nullCount("nulls_v", df, "v"),
      Integrity.dupKeyRows("pk_v", df, Seq("v")))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(report("nulls_v") == ((2L, 4L)))
    // the two nulls form one duplicated group-by key → 2 violating rows
    assert(report("pk_v") == ((2L, 4L)))
  }
}
