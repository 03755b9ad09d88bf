package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.FlowFrame
import graft.sources.{Couchbase, Opc}

/**
 * GetCouchbaseKey / PutCouchbaseKey / PutOPC semantics against the
 * in-memory stand-in clusters — the processor logic (id resolution,
 * routing by error class, output attributes, typed value parsing) is the
 * tested surface; the wire client is the pluggable boundary
 * (GetCouchbaseKey.cpp:32-110, PutCouchbaseKey.cpp:34-80,
 * putopc.cpp:136-308).
 */
class KvConnectorSpec extends SparkSpec {

  private def frame(rows: Seq[(String, String, Map[String, String])]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("uuid", StringType),
      StructField("attributes", MapType(StringType, StringType)),
      StructField("content", StringType),
      StructField("relationship", StringType)))
    spark.createDataFrame(
      rows.map { case (u, c, m) => Row(u, m, c, null) }.asJava, schema)
  }

  private def collectRel(df: DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(3)).toMap

  private def attrsOf(df: DataFrame, uuid: String): Map[String, String] =
    df.filter(col("uuid") === uuid).collect().head
      .getMap[String, String](1).toMap

  test("PutCouchbaseKey upserts content under the doc-id chain and stamps " +
       "couchbase.* attributes (PutCouchbaseKey.cpp:52-66)") {
    val ns = "cb-put"
    val coords = Couchbase.Coords("bkt")
    val in = frame(Seq(
      ("u1", "hello", Map("cid" -> "doc-a")),   // Document Id property
      ("u2", "world", Map.empty[String, String]))) // falls back to uuid
    val out = Couchbase.putKey(in, () => Couchbase.InMemory(ns), coords,
      docIdAttr = Some("cid"))
    assert(collectRel(out) === Map("u1" -> "success", "u2" -> "success"))
    val a1 = attrsOf(out, "u1")
    assert(a1("couchbase.doc.id") === "doc-a" && a1("couchbase.bucket") === "bkt")
    assert(a1.contains("couchbase.doc.cas") &&
      a1.contains("couchbase.doc.sequence.number") &&
      a1.contains("couchbase.partition.uuid") &&
      a1.contains("couchbase.partition.id"))
    assert(attrsOf(out, "u2")("couchbase.doc.id") === "u2")
    // values actually landed
    val store = Couchbase.InMemory(ns)
    assert(new String(store.get(coords, "doc-a").toOption.get.value, "UTF-8") === "hello")
    assert(new String(store.get(coords, "u2").toOption.get.value, "UTF-8") === "world")
  }

  test("GetCouchbaseKey: fetched value becomes content, attribute mode " +
       "keeps content, content-as-id fallback, empty id and miss route " +
       "failure (GetCouchbaseKey.cpp:53-110)") {
    val ns = "cb-get"
    val coords = Couchbase.Coords("bkt")
    val seedStore = Couchbase.InMemory(ns)
    seedStore.upsert(coords, "doc-a", "VALUE-A".getBytes, "NONE", "NONE")
    seedStore.upsert(coords, "doc-b", "VALUE-B".getBytes, "NONE", "NONE")

    // content replacement via Document Id attribute
    val out1 = Couchbase.getKey(frame(Seq(("u1", "orig", Map("cid" -> "doc-a")))),
      () => Couchbase.InMemory(ns), coords, docIdAttr = Some("cid"))
    val r1 = out1.collect().head
    assert(r1.getString(3) === "success" && r1.getString(2) === "VALUE-A")
    assert(attrsOf(out1, "u1")("couchbase.doc.cas").toLong > 0)

    // put-to-attribute mode: content untouched, value in the attribute
    val out2 = Couchbase.getKey(frame(Seq(("u2", "orig", Map("cid" -> "doc-b")))),
      () => Couchbase.InMemory(ns), coords, docIdAttr = Some("cid"),
      putValueToAttribute = Some("fetched"))
    val r2 = out2.collect().head
    assert(r2.getString(3) === "success" && r2.getString(2) === "orig")
    assert(attrsOf(out2, "u2")("fetched") === "VALUE-B")

    // no Document Id property → content IS the id
    val out3 = Couchbase.getKey(frame(Seq(("u3", "doc-a", Map.empty[String, String]))),
      () => Couchbase.InMemory(ns), coords)
    assert(out3.collect().head.getString(2) === "VALUE-A")

    // empty id → failure; missing doc (non-retryable) → failure
    val out4 = Couchbase.getKey(frame(Seq(
      ("u4", "", Map.empty[String, String]),
      ("u5", "absent", Map.empty[String, String]))),
      () => Couchbase.InMemory(ns), coords)
    assert(collectRel(out4) === Map("u4" -> "failure", "u5" -> "failure"))
  }

  test("Couchbase error classes: TEMPORARY → retry, FATAL → failure, row " +
       "otherwise unchanged (CouchbaseErrorType routing)") {
    val ns = "cb-err"
    val coords = Couchbase.Coords("bkt")
    val factory: Couchbase.ClientFactory = () => Couchbase.InMemory(ns,
      failWith = Map("warm" -> Couchbase.Temporary, "cold" -> Couchbase.Fatal))
    val in = frame(Seq(
      ("u1", "x", Map("cid" -> "warm")),
      ("u2", "y", Map("cid" -> "cold"))))
    assert(collectRel(Couchbase.getKey(in, factory, coords,
      docIdAttr = Some("cid"))) === Map("u1" -> "retry", "u2" -> "failure"))
    assert(collectRel(Couchbase.putKey(in, factory, coords,
      docIdAttr = Some("cid"))) === Map("u1" -> "retry", "u2" -> "failure"))
    // retry/failure rows keep their attributes un-stamped
    val got = Couchbase.getKey(in, factory, coords, docIdAttr = Some("cid"))
    assert(!attrsOf(got, "u1").contains("couchbase.doc.cas"))
  }

  test("PutOPC: create-then-update per node existence, typed parse, " +
       "conversion failure routes failure (putopc.cpp:136-308)") {
    val ns = "opc-1"
    val parent = Opc.NodeId(1, "root")
    val factory: Opc.ConnectionFactory = () => Opc.InMemory(ns)
    // create: node absent
    val out1 = Opc.putOpc(frame(Seq(("u1", "42", Map("node" -> "n1")))),
      factory, parent, "Int64", targetIdAttr = Some("node"))
    assert(collectRel(out1) === Map("u1" -> "success"))
    assert(Opc.InMemory(ns).read(Opc.NodeId(1, "n1")) === Some(42L))
    // update: same node, new value
    val out2 = Opc.putOpc(frame(Seq(("u2", "43", Map("node" -> "n1")))),
      factory, parent, "Int64", targetIdAttr = Some("node"))
    assert(collectRel(out2) === Map("u2" -> "success"))
    assert(Opc.InMemory(ns).read(Opc.NodeId(1, "n1")) === Some(43L))
    // conversion failure → failure, node untouched
    val out3 = Opc.putOpc(frame(Seq(("u3", "not-a-number", Map("node" -> "n1")))),
      factory, parent, "Int64", targetIdAttr = Some("node"))
    assert(collectRel(out3) === Map("u3" -> "failure"))
    assert(Opc.InMemory(ns).read(Opc.NodeId(1, "n1")) === Some(43L))
  }

  test("PutOPC honors the target namespace index for attribute-resolved " +
       "targets (putopc.h:78-82)") {
    val parent = Opc.NodeId(1, "root")
    val out = Opc.putOpc(frame(Seq(("u1", "7", Map("node" -> "nX")))),
      () => Opc.InMemory("opc-ns"), parent, "Int64",
      targetIdAttr = Some("node"), targetNsIndex = Some(2))
    assert(collectRel(out) === Map("u1" -> "success"))
    assert(Opc.InMemory("opc-ns").read(Opc.NodeId(2, "nX")) === Some(7L))
    assert(Opc.InMemory("opc-ns").read(Opc.NodeId(1, "nX")) === None)
  }

  test("PutOPC value types parse per opc.h:50-59 and bad writes or " +
       "unresolvable targets route failure") {
    assert(Opc.parseValue("true", "Boolean") === Some(true))
    assert(Opc.parseValue("0", "Boolean") === Some(false))
    assert(Opc.parseValue("maybe", "Boolean") === None)
    assert(Opc.parseValue("-7", "Int32") === Some(-7))
    assert(Opc.parseValue("-7", "UInt32") === None)
    assert(Opc.parseValue("3.5", "Double") === Some(3.5))
    assert(Opc.parseValue("3.5", "Float") === Some(3.5f))
    assert(Opc.parseValue("abc", "String") === Some("abc"))
    assert(Opc.parseValue("9999999999", "Int32") === None)

    val parent = Opc.NodeId(1, "root")
    // server rejects the write → failure
    val rej = Opc.putOpc(frame(Seq(("u1", "1", Map("node" -> "n1")))),
      () => Opc.InMemory("opc-rej", rejectWrites = true), parent, "Int64",
      targetIdAttr = Some("node"))
    assert(collectRel(rej) === Map("u1" -> "failure"))
    // no target id attribute and no fixed target → failure
    val none = Opc.putOpc(frame(Seq(("u2", "1", Map.empty[String, String]))),
      () => Opc.InMemory("opc-rej"), parent, "Int64")
    assert(collectRel(none) === Map("u2" -> "failure"))
  }
}
