package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ConsumeJournald's parse/format plane — SURVEY §2.1
 * (extensions/systemd/ConsumeJournald.cpp:106-121,136-145,173-200).
 *
 * The reference reads entries through libsystemd; the engine-relevant
 * capability is what happens to an entry once read: FIELD=VALUE pairs
 * become attributes, payload format Raw takes the MESSAGE field as
 * content, payload format Syslog renders
 * `MMM dd HH:mm:ss HOSTNAME IDENT[PID]: MESSAGE` from the
 * _HOSTNAME/SYSLOG_IDENTIFIER/_PID fields. Entries arrive in the
 * `journalctl -o export` text format: one FIELD=VALUE per line, blank
 * line between entries (binary-valued fields are out of scope offline).
 *
 * Everything is pure Catalyst: entry split + field map are higher-order
 * functions over one string column — codegen'd, no UDF, no shuffle.
 */
object Journald {

  /** Split an export-format stream into one row per journal entry. */
  def splitEntries(df: DataFrame, exportCol: Column): DataFrame =
    df.select(df.columns.map(col) :+
      posexplode(filter(split(exportCol, "\n\n"), e => length(trim(e)) > 0))
        .as(Seq("entryNo", "entry")): _*)

  /** Parse one entry's FIELD=VALUE lines into a MAP<STRING,STRING> —
    * the attribute set the reference stamps (ConsumeJournald.cpp:115). */
  def fieldsMap(entryCol: Column): Column =
    map_from_entries(
      transform(
        filter(split(entryCol, "\n"), l => instr(l, "=") > 0),
        l => struct(
          substring_index(l, "=", 1).as("key"),
          // value = everything after the FIRST '=' (values may contain '=')
          l.substr(instr(l, "=") + 1, length(l)).as("value"))))

  /** PayloadFormat::Raw — the MESSAGE field is the content
    * (ConsumeJournald.cpp:112-113). */
  def rawPayload(fields: Column): Column = element_at(fields, "MESSAGE")

  /**
   * PayloadFormat::Syslog (ConsumeJournald.cpp:173-200):
   * `MMM dd HH:mm:ss HOSTNAME IDENT[PID]: MESSAGE`; PID prefers
   * SYSLOG_PID then _PID; missing hostname/ident render as "-"
   * (the reference omits absent parts — "-" keeps the shape fixed for
   * relational use; timestamp comes from __REALTIME_TIMESTAMP µs).
   */
  def syslogPayload(fields: Column): Column =
    syslogPayloadFmt(fields, "MMM dd HH:mm:ss")

  /** The entry's __REALTIME_TIMESTAMP rendered per the Timestamp Format
    * property (ConsumeJournald.cpp:64-70): the ISO/ISO 8601/ISO8601
    * aliases mean `%FT%T%Ez` — microsecond ISO with a +hh:mm offset
    * (ConsumeJournaldTest.cpp pins "2021-04-15T17:17:09.123456+00:00");
    * any other spelling routes through the strftime→JVM pattern
    * translator the EL compiler uses. */
  def journaldTimestamp(fields: Column, format: String): Column = {
    // try_cast (r18): a malformed __REALTIME_TIMESTAMP in ONE entry must
    // render null, not throw under ANSI and poison the whole batch
    val ts = timestamp_micros(
      element_at(fields, "__REALTIME_TIMESTAMP").try_cast("long"))
    format match {
      case "ISO" | "ISO 8601" | "ISO8601" =>
        date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")
      case other => date_format(ts, graft.el.ElCompiler.datePattern(other))
    }
  }

  def syslogPayloadFmt(fields: Column, timestampFormat: String): Column = {
    val pid = coalesce(element_at(fields, "SYSLOG_PID"),
      element_at(fields, "_PID"))
    concat(
      journaldTimestamp(fields, timestampFormat), lit(" "),
      coalesce(element_at(fields, "_HOSTNAME"), lit("-")), lit(" "),
      coalesce(element_at(fields, "SYSLOG_IDENTIFIER"), lit("-")),
      when(pid.isNotNull, concat(lit("["), pid, lit("]"))).otherwise(lit("")),
      lit(": "),
      coalesce(element_at(fields, "MESSAGE"), lit("")))
  }
}
