package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.FlowFrame
import graft.flow._

/**
 * Table-driven port of the reference MergeContent battery
 * (extensions/libarchive/tests/MergeFileTests.cpp) — each case cites its
 * TEST_CASE. Contents are `repeat(i, 32)` as in MergeFileTests.cpp:200.
 * Cases run through the real flow dispatch (Processors.apply), so they
 * exercise the strict-fit packer and the delimiter-strategy resolution.
 * Scheduling-bound behaviors (per-trigger Batch Size, MaxBinAge resurrect)
 * map to the batch relaxation: pending bins route to `failure`.
 */
class MergeFileSpec extends SparkSpec {

  private val contents: IndexedSeq[String] = (0 to 5).map(i => i.toString * 32)

  private def proc(props: (String, String)*) =
    ProcessorDef("m", "merge", "org.apache.nifi.minifi.processors.MergeContent",
      "TIMER_DRIVEN", "1 sec", Set.empty, props.toMap)

  /** FlowFrame rows with deterministic uuids in arrival order. */
  private def frame(rows: Seq[(String, String, Map[String, String])]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("uuid", StringType),
      StructField("content", StringType),
      StructField("attributes", MapType(StringType, StringType))))
    spark.createDataFrame(
      rows.map { case (u, c, m) => Row(u, c, m) }.asJava, schema)
      .withColumn("entryDate", current_timestamp())
      .withColumn("relationship", lit(null: String))
  }

  private def fragAttrs(id: Int, idx: Int, count: Int) = Map(
    FlowFrame.FragmentAttrs.Identifier -> id.toString,
    FlowFrame.FragmentAttrs.Index -> idx.toString,
    FlowFrame.FragmentAttrs.Count -> count.toString)

  /** The 6 defragment inputs in the reference's scrambled arrival order
    * {0,2,5,4,1,3} (MergeFileTests.cpp:233). */
  private def defragInput: DataFrame = frame(
    Seq(0, 2, 5, 4, 1, 3).zipWithIndex.map { case (i, arrival) =>
      (s"u$arrival", contents(i),
        if (i < 3) fragAttrs(0, i, 3) else fragAttrs(1, i - 3, 3))
    })

  private def mergedContents(out: DataFrame): Seq[String] =
    out.filter(col(FlowFrame.Relationship) === "merged")
      .select(col(FlowFrame.Content).cast("string")).collect()
      .map(_.getString(0)).toSeq.sorted

  test("MergeFileDefragment: scrambled fragments reassemble by index " +
       "(MergeFileTests.cpp:221)") {
    val out = Processors.apply(spark,
      proc("Merge Strategy" -> "Defragment"), Some(defragInput))
    val merged = mergedContents(out)
    assert(merged === Seq(
      contents(0) + contents(1) + contents(2),
      contents(3) + contents(4) + contents(5)))
    assert(merged.forall(_.length === 96))
  }

  test("MergeFileDefragmentDelimiter: header/demarcator/footer resolved " +
       "from FILES under Delimiter Strategy=Filename (MergeFileTests.cpp:275)") {
    val dir = java.nio.file.Files.createTempDirectory("mergefile")
    def write(name: String, text: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, text.getBytes("UTF-8"))
      p.toString
    }
    val out = Processors.apply(spark, proc(
      "Merge Strategy" -> "Defragment",
      "Delimiter Strategy" -> "Filename",
      "Header File" -> write("hdr", "header"),
      "Footer File" -> write("ftr", "footer"),
      "Demarcator File" -> write("dem", "demarcator")), Some(defragInput))
    val merged = mergedContents(out)
    assert(merged === Seq(
      "header" + contents(0) + "demarcator" + contents(1) + "demarcator" + contents(2) + "footer",
      "header" + contents(3) + "demarcator" + contents(4) + "demarcator" + contents(5) + "footer"))
    assert(merged.forall(_.length === 128))
  }

  test("MergeFileBinPack: Minimum Group Size closes ready bins of three " +
       "32-byte files (MergeFileTests.cpp:400)") {
    val in = frame((0 to 5).map(i =>
      (s"u$i", contents(i), Map("tag" -> "tag"))))
    val out = Processors.apply(spark, proc(
      "Merge Strategy" -> "Bin-Packing Algorithm",
      "Minimum Group Size" -> "96",
      "Correlation Attribute Name" -> "tag"), Some(in))
    assert(mergedContents(out) === Seq(
      contents(0) + contents(1) + contents(2),
      contents(3) + contents(4) + contents(5)))
  }

  test("MergeFileOnAttribute: correlation attribute partitions bins " +
       "(MergeFileTests.cpp:551)") {
    val in = frame((0 to 5).map(i =>
      (s"u$i", contents(i),
        Map("tag" -> (if (i % 2 == 0) "even" else "odd")))))
    val out = Processors.apply(spark, proc(
      "Merge Strategy" -> "Bin-Packing Algorithm",
      "Minimum Number of Entries" -> "3",
      "Correlation Attribute Name" -> "tag"), Some(in))
    assert(mergedContents(out) === Seq(
      contents(0) + contents(2) + contents(4),
      contents(1) + contents(3) + contents(5)))
  }

  test("Maximum Group Size is respected: strict fit rejects the straddling " +
       "entry, the pending bin stays unmerged (MergeFileTests.cpp:841)") {
    val in = frame((0 to 5).map(i =>
      (s"u$i", contents(i), Map("tag" -> "tag"))))
    val out = Processors.apply(spark, proc(
      "Merge Strategy" -> "Bin-Packing Algorithm",
      "Minimum Group Size" -> "65", "Maximum Group Size" -> "65",
      "Minimum Number of Entries" -> "3", "Maximum Number of Entries" -> "3",
      "Correlation Attribute Name" -> "tag"), Some(in))
    // 32+32=64 fits; a third would make 96 > 65 → bins of two, merged
    assert(mergedContents(out) === Seq(
      contents(0) + contents(1),
      contents(2) + contents(3)))
    // the reference leaves [4,5] pending (flow3 absent); the batch sweep
    // routes the pending bin to failure instead of holding it
    val pending = out.filter(col(FlowFrame.Relationship) === "failure")
      .select(col(FlowFrame.Content).cast("string")).collect()
      .map(_.getString(0)).toSeq
    assert(pending === Seq(contents(4) + contents(5)))
  }

  test("Batch Size analog: Maximum Number of Entries bounds bins; the " +
       "trailing under-minimum bin is the pending one (MergeFileTests.cpp:793)") {
    // a correlation key keeps the case deterministic — without one the
    // dispatch bins per partition (the documented arbitrary-grouping
    // relaxation), which is partition-layout-dependent in a test
    val in = frame((0 to 4).map(i => (s"u$i", contents(i), Map("tag" -> "t"))))
    val out = Processors.apply(spark, proc(
      "Merge Strategy" -> "Bin-Packing Algorithm",
      "Minimum Number of Entries" -> "3",
      "Maximum Number of Entries" -> "3",
      "Correlation Attribute Name" -> "tag"), Some(in))
    assert(mergedContents(out) === Seq(contents(0) + contents(1) + contents(2)))
    val pending = out.filter(col(FlowFrame.Relationship) === "failure")
      .select(col(FlowFrame.Content).cast("string")).collect()
      .map(_.getString(0)).toSeq
    assert(pending === Seq(contents(3) + contents(4)))
  }

  test("oversized singleton becomes its own ready bin (BinFiles.cpp:166-173)") {
    val in = frame(Seq(
      ("u0", "x" * 100, Map("tag" -> "t")),   // alone over the 65-byte max
      ("u1", contents(1), Map("tag" -> "t")),
      ("u2", contents(2), Map("tag" -> "t"))))
    val out = Processors.apply(spark, proc(
      "Merge Strategy" -> "Bin-Packing Algorithm",
      "Maximum Group Size" -> "65",
      "Minimum Number of Entries" -> "2",
      "Correlation Attribute Name" -> "tag"), Some(in))
    assert(mergedContents(out) === Seq(contents(1) + contents(2), "x" * 100))
  }

  // ---- mergeContentArchive: TAR/ZIP formats + attribute strategies ----

  private def archiveInput: DataFrame = {
    import spark.implicits._
    Seq(
      // (correlation, ord, name, content, attrs)
      ("g1", 1, "a.txt", "alpha", Map(
        "segment.original.filename" -> "seg1.txt", "common" -> "c",
        "uniq" -> "u1", "tar.permissions" -> "644")),
      ("g1", 2, "b.txt", "beta", Map(
        "segment.original.filename" -> "seg1.txt", "common" -> "c",
        "uniq" -> "u2")),
      ("g2", 1, "solo.txt", "solo", Map(
        "segment.original.filename" -> "seg2.txt", "common" -> "c",
        "only" -> "x")))
      .toDF("corr", "ord", "name", "content", "attrs")
  }

  private def runArchive(format: String, strategy: String): Array[Row] =
    graft.ops.SplitMerge.mergeContentArchive(archiveInput, col("corr"),
      col("ord"), col("name"), col("content"), col("attrs"), format, 10,
      strategy).orderBy("correlation").collect()

  test("mergeContentArchive TAR: entries in bin order, per-entry " +
       "tar.permissions decimal-parse quirk, default S_IFREG|0755 " +
       "(MergeContent.h:214-230)") {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val rows = runArchive("TAR", "Keep Only Common Attributes")
    assert(rows.length === 2)
    val g1 = rows(0)
    val tin = new TarArchiveInputStream(
      new java.io.ByteArrayInputStream(g1.getAs[Array[Byte]]("archive")))
    val e1 = tin.getNextEntry
    assert(e1.getName === "a.txt")
    assert(new String(tin.readNBytes(e1.getSize.toInt)) === "alpha")
    // reference quirk: "644" is parsed DECIMAL → mode bits 644₁₀ = 0o1204
    assert((e1.getMode & 0xFFF) === 644)
    val e2 = tin.getNextEntry
    assert(e2.getName === "b.txt")
    assert((e2.getMode & 0xFFF) === 0x1ed) // default 0755
    assert(tin.getNextEntry === null)
  }

  test("mergeContentArchive ZIP + Keep Only Common: exact (key,value) " +
       "intersection, then mime.type/fragment.count/filename overwrite " +
       "(MergeContent.cpp:349-355,261-331)") {
    import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
    val rows = runArchive("ZIP", "Keep Only Common Attributes")
    val g1 = rows(0)
    val zin = new ZipArchiveInputStream(
      new java.io.ByteArrayInputStream(g1.getAs[Array[Byte]]("archive")))
    assert(zin.getNextEntry.getName === "a.txt")
    assert(zin.getNextEntry.getName === "b.txt")
    val a1 = g1.getAs[Map[String, String]]("attributes")
    // uniq conflicts (u1/u2) and tar.permissions is on only one member →
    // both dropped by the every-member intersection
    assert(a1 === Map(
      "segment.original.filename" -> "seg1.txt", "common" -> "c",
      "mime.type" -> "application/zip", "fragment.count" -> "2",
      "filename" -> "seg1.txt.zip"))
    // single-member bin: filename is the member's own name + ext
    val a2 = rows(1).getAs[Map[String, String]]("attributes")
    assert(a2("filename") === "solo.txt.zip")
    assert(a2("fragment.count") === "1")
  }

  test("mergeContentArchive Keep All Unique: conflicting key removed " +
       "entirely, single-valued subset key survives (MergeContent.cpp:357-369)") {
    val rows = runArchive("TAR", "Keep All Unique Attributes")
    val a1 = rows(0).getAs[Map[String, String]]("attributes")
    assert(!a1.contains("uniq")) // u1 vs u2 → removed
    // tar.permissions appears once with one value → survives under Unique
    assert(a1("tar.permissions") === "644")
    assert(a1("common") === "c")
    assert(a1("mime.type") === "application/tar")
  }

  test("tar.permissions std::stoi prefix parse: trailing junk ignored, " +
       "leading whitespace skipped, non-numeric falls back to 0755 " +
       "(MergeContent.h:223)") {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    import spark.implicits._
    val in = Seq(
      ("g", 1, "a.txt", "alpha", Map("tar.permissions" -> "644 ")),   // trailing space
      ("g", 2, "b.txt", "beta",  Map("tar.permissions" -> "0644x")),  // numeric prefix
      ("g", 3, "c.txt", "gamma", Map("tar.permissions" -> " 711")),   // leading ws
      ("g", 4, "d.txt", "delta", Map("tar.permissions" -> "x644")))   // no digit prefix
      .toDF("corr", "ord", "name", "content", "attrs")
    val rows = graft.ops.SplitMerge.mergeContentArchive(in, col("corr"),
      col("ord"), col("name"), col("content"), col("attrs"), "TAR", 10,
      "Keep All Unique Attributes").collect()
    val tin = new TarArchiveInputStream(
      new java.io.ByteArrayInputStream(rows(0).getAs[Array[Byte]]("archive")))
    val modes = Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
      .map(e => e.getName -> (e.getMode & 0xFFF)).toMap
    assert(modes("a.txt") === 644)   // "644 "  → stoi prefix 644
    assert(modes("b.txt") === 644)   // "0644x" → decimal prefix 0644 = 644
    assert(modes("c.txt") === 711)   // " 711"  → whitespace skipped
    assert(modes("d.txt") === 0x1ed) // "x644"  → unparseable → default 0755
  }

  test("multi-member bin without segment.original.filename keeps the " +
       "strategy-merged filename and appends the extension " +
       "(MergeContent.cpp: FlowFile::getAttribute miss leaves name)") {
    import spark.implicits._
    val in = Seq(
      ("g", 1, "a.txt", "alpha", Map("filename" -> "orig.log", "c" -> "v")),
      ("g", 2, "b.txt", "beta",  Map("filename" -> "orig.log", "c" -> "v")))
      .toDF("corr", "ord", "name", "content", "attrs")
    val rows = graft.ops.SplitMerge.mergeContentArchive(in, col("corr"),
      col("ord"), col("name"), col("content"), col("attrs"), "TAR", 10,
      "Keep Only Common Attributes").collect()
    val attrs = rows(0).getAs[Map[String, String]]("attributes")
    assert(attrs("filename") === "orig.log.tar")
  }
}
