package graft

import org.apache.spark.sql.functions._
import graft.functions.{Codecs, GzipCompress, GzipDecompress}

/** Native Catalyst codec expressions: codegen path, SQL registration via
  * the GraftExtensions descriptors, and byte-agreement with the UDF
  * codecs (SURVEY §7.4 custom-vs-built-in contract). */
class FunctionsSpec extends SparkSpec {

  test("gzip expression round-trips and agrees with the UDF codec") {
    val df = spark.createDataFrame(Seq(
      Tuple1("hello world"), Tuple1(""), Tuple1("x" * 10000))).toDF("s")
    val rows = df.select(
      org.apache.spark.sql.GraftColumnShim.column(GzipDecompress(
        GzipCompress(org.apache.spark.sql.GraftColumnShim.expression(
          col("s").cast("binary"))))).cast("string").as("rt"),
      md5(org.apache.spark.sql.GraftColumnShim.column(GzipCompress(
        org.apache.spark.sql.GraftColumnShim.expression(col("s").cast("binary")))))
        .as("native_md5"),
      md5(graft.ops.Content.gzipUdf(col("s").cast("binary"))).as("udf_md5"),
      col("s")).collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(3))     // round trip
      assert(r.getString(1) === r.getString(2))     // native == UDF bytes
    }
  }

  test("null flows through the engine's null-safe branch") {
    val df = spark.sql("SELECT CAST(NULL AS BINARY) AS b")
    val r = df.select(org.apache.spark.sql.GraftColumnShim.column(
      GzipCompress(org.apache.spark.sql.GraftColumnShim.expression(col("b")))))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("extensions descriptors register SQL-addressable functions") {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    val out = spark.sql(
      "SELECT CAST(graft_gunzip(graft_gzip(CAST('abc' AS BINARY))) AS STRING)")
      .collect()(0).getString(0)
    assert(out === "abc")
  }

  test("kernel agrees with java.util.zip reference bytes") {
    val b = "graft".getBytes("UTF-8")
    assert(Codecs.gunzip(Codecs.gzip(b)).toSeq === b.toSeq)
  }

  test("tryDecompress yields null on corrupt input for every format; " +
       "valid input round-trips (CompressContentTests.cpp:681)") {
    import graft.ops.Content
    val formats = Seq("gzip", "deflate", "bzip2", "xz-lzma2", "lzma")
    val junk = spark.createDataFrame(Seq(Tuple1("banana bread"))).toDF("c")
    formats.foreach { fmt =>
      val bad = junk.select(
        Content.tryDecompress(col("c").cast("binary"), fmt).as("d"))
        .collect()(0)
      assert(bad.isNullAt(0), s"$fmt should yield null on junk")
      val rt = junk.select(Content.tryDecompress(
        Content.compress(col("c").cast("binary"), fmt), fmt).cast("string"))
        .collect()(0).getString(0)
      assert(rt === "banana bread", s"$fmt round trip")
    }
  }
}
