package graft

import org.apache.spark.sql.functions._
import graft.canonical.Canonical

class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("keyJson sorts fields by lower-cased name (string equality = logical equality)") {
    val df = Seq((1L, 3, "x")).toDF("l_orderkey", "l_linenumber", "payload")
    val k = df.select(Canonical.keyJson(df,
      Seq("l_orderkey", "l_linenumber")).as("k")).head().getString(0)
    assert(k == """{"l_linenumber":3,"l_orderkey":1}""")
  }

  test("valueJson renders timestamps ISO-8601 Z and keeps nulls (ref golden melt_test.clj:67-75)") {
    val df = Seq((603L, Some("9500b E. Central"), Option.empty[String],
        java.sql.Timestamp.valueOf("2007-08-01 00:00:00")))
      .toDF("addressid", "addressline1", "addressline2", "modifieddate")
    val v = df.select(Canonical.valueJson(df).as("v")).head().getString(0)
    assert(v == """{"addressid":603,"addressline1":"9500b E. Central","addressline2":null,"modifieddate":"2007-08-01T00:00:00Z"}""")
  }

  test("NTZ timestamps (parquet isAdjustedToUTC=false) also render ISO-8601 Z") {
    val df = spark.sql(
      "SELECT TIMESTAMP_NTZ '1997-01-15 00:00:00' AS o_orderdate, 1L AS o_orderkey")
    val v = df.select(Canonical.valueJson(df).as("v")).head().getString(0)
    assert(v == """{"o_orderdate":"1997-01-15T00:00:00Z","o_orderkey":1}""")
  }

  test("decimal columns render as plain JSON numbers (ref fixture subtotal)") {
    val df = spark.sql(
      "SELECT CAST(1003.91 AS DECIMAL(19,4)) AS subtotal, 1L AS id")
    val v = df.select(Canonical.valueJson(df).as("v")).head().getString(0)
    assert(v == """{"id":1,"subtotal":1003.9100}""")
  }

  test("binary renders base64 (ref melt.clj:364-366 Blob encoder)") {
    val df = Seq((1, Array[Byte](1, 2, 3))).toDF("id", "blob")
    val v = df.select(Canonical.valueJson(df).as("v")).head().getString(0)
    assert(v == """{"blob":"AQID","id":1}""")
  }

  test("messages: keyed source → (topic, key, value); keyless uses whole row as key") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val keyed = Canonical.messages(df, SourceDef("c", "main", "t", Seq("id")))
    assert(keyed.columns.toSeq == Seq("topic", "key", "value"))
    val r = keyed.orderBy("key").head()
    assert(r.getString(0) == "melt.main.t")
    assert(r.getString(1) == """{"id":1}""")
    assert(r.getString(2) == """{"id":1,"s":"a"}""")
    val keyless = Canonical.messages(df, SourceDef("c", "main", "t", Seq.empty))
    assert(keyless.where(col("key") === col("value")).count() == 2)
  }

  test("xform hook rewrites the message frame (ref melt.clj:30-31)") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val src = SourceDef("c", "main", "t", Seq("id"),
      transform = Some(f => f.withColumn("topic", lit("custom.topic"))))
    assert(Canonical.messages(df, src).head().getString(0) == "custom.topic")
  }

  test("canonicalization is deterministic across column order (fuzz fixpoint parity)") {
    val a = Seq((1L, "x", 2.5)).toDF("b", "a", "c")
    val b = Seq(("x", 2.5, 1L)).toDF("a", "c", "b")
    val va = a.select(Canonical.valueJson(a)).head().getString(0)
    val vb = b.select(Canonical.valueJson(b)).head().getString(0)
    assert(va == vb)
  }
}
