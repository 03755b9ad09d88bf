package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.FlowFrame
import graft.ops.Script

/**
 * ExecuteScript session API — table-driven port of the reference's lua
 * battery (extensions/lua/tests/TestExecuteScriptProcessorWithLuaScript
 * .cpp; each test cites its TEST_CASE). The script language here is
 * Scala, the session surface is the reference's.
 */
class ScriptSpec extends SparkSpec {

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

  test("Test Read File: content readable, transfer to success " +
       "(TestExecuteScriptProcessorWithLuaScript.cpp:126)") {
    val out = Script.executeScript(frame(Seq(("u1", "tempFile", Map.empty))),
      session => session.get().foreach { ff =>
        require(session.read(ff) == "tempFile")
        session.transfer(ff, "success")
      })
    val r = out.collect()
    assert(r.length === 1 && r.head.getString(3) === "success" &&
      r.head.getString(2) === "tempFile")
  }

  test("Test Write File: written content replaces, transfer to success " +
       "(cpp:159)") {
    val out = Script.executeScript(frame(Seq(("u1", "tempFile", Map.empty))),
      session => session.get().foreach { ff =>
        session.write(ff, "hello 2")
        session.transfer(ff, "success")
      })
    val r = out.collect()
    assert(r.length === 1 && r.head.getString(2) === "hello 2")
  }

  test("Test Create: a created flow file transfers with a fresh uuid " +
       "(cpp:188)") {
    val out = Script.executeScript(frame(Seq(("u1", "x", Map.empty))),
      session => {
        session.get() // consume the incoming file
        val nf = session.create()
        session.transfer(nf, "success")
      })
    val r = out.collect()
    // created file on success + unhandled original passes through (rollback)
    val byRel = r.groupBy(_.getString(3))
    assert(byRel("success").length === 1)
    assert(byRel("success").head.getString(0) !== "u1")
    assert(byRel(null).map(_.getString(0)).toSeq === Seq("u1"))
  }

  test("create(parent) inherits attributes (LuaProcessSession.h:38)") {
    val out = Script.executeScript(
      frame(Seq(("u1", "x", Map("inherited" -> "yes")))),
      session => session.get().foreach { ff =>
        val child = session.create(Some(ff))
        require(child.getAttribute("inherited") == Some("yes"))
        session.transfer(child, "success")
        session.remove(ff)
      })
    val r = out.collect()
    assert(r.length === 1 &&
      r.head.getMap[String, String](1).get("inherited") === Some("yes"))
  }

  test("Test Update Attribute: addAttribute only adds when absent, " +
       "updateAttribute only updates when present (cpp:216)") {
    val out = Script.executeScript(frame(Seq(("u1", "tempFile", Map.empty))),
      session => session.get().foreach { ff =>
        require(ff.addAttribute("test_attr", "1"))
        require(!ff.addAttribute("test_attr", "9")) // add-if-absent contract
        val attr = ff.getAttribute("test_attr").get.toInt
        require(ff.updateAttribute("test_attr", (attr + 1).toString))
        require(!ff.updateAttribute("absent", "x")) // update-if-present
        session.transfer(ff, "success")
      })
    val r = out.collect()
    assert(r.head.getMap[String, String](1)("test_attr") === "2")
  }

  test("session:get() hands the incoming file out once; remove drops it " +
       "(cpp:84 get-returns-none)") {
    val out = Script.executeScript(frame(Seq(("u1", "x", Map.empty))),
      session => {
        val first = session.get()
        require(first.isDefined)
        require(session.get().isEmpty) // consumed
        session.remove(first.get)
      })
    assert(out.collect().isEmpty)
  }

  test("unhandled incoming file is the rollback analog: passes through " +
       "with null relationship") {
    val out = Script.executeScript(frame(Seq(("u1", "keep", Map("a" -> "b")))),
      _ => ())
    val r = out.collect()
    assert(r.length === 1 && r.head.getString(3) === null &&
      r.head.getString(2) === "keep")
  }

  test("rollback emits the ORIGINAL row even when the script mutated it " +
       "before bailing out (ProcessSession rollback discards local state)") {
    val out = Script.executeScript(
      frame(Seq(("u1", "orig", Map("a" -> "1")))),
      session => session.get().foreach { ff =>
        session.write(ff, "partial")
        ff.setAttribute("poison", "x")
        // neither transfer nor remove → rollback
      })
    val r = out.collect()
    assert(r.length === 1 && r.head.getString(3) === null)
    assert(r.head.getString(2) === "orig")
    assert(r.head.getMap[String, String](1).toMap === Map("a" -> "1"))
  }

  test("remove cancels an earlier transfer of the same FlowFile " +
       "(ProcessSession::remove deletes the record)") {
    val out = Script.executeScript(frame(Seq(("u1", "x", Map.empty))),
      session => session.get().foreach { ff =>
        session.transfer(ff, "success")
        session.remove(ff)
      })
    assert(out.collect().isEmpty)
  }

  test("failure routing + one-to-many: a script can clone to multiple " +
       "relationships") {
    val out = Script.executeScript(
      frame(Seq(("u1", "ok", Map.empty), ("u2", "bad", Map.empty))),
      session => session.get().foreach { ff =>
        if (session.read(ff) == "bad") session.transfer(ff, "failure")
        else {
          session.transfer(ff, "success")
          val copy = session.create(Some(ff))
          session.write(copy, session.read(ff).toUpperCase)
          session.transfer(copy, "archive")
        }
      })
    val rels = out.collect().map(r => (r.getString(3), r.getString(2))).toSet
    assert(rels === Set(("failure", "bad"), ("success", "ok"), ("archive", "OK")))
  }
}
