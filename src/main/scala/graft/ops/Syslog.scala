package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ListenSyslog parse — SURVEY §2.1 (ListenSyslog.h:42-46, ListenSyslog.cpp).
 *
 * The listener's network plane maps to a socket/custom streaming source; the
 * *query* capability is the RFC5424/RFC3164 parse into attributes with
 * invalid lines routed to `invalid`. Each field is one `regexp_extract` over
 * the message — all codegen'd, no UDF.
 */
object Syslog {

  /** RFC5424: `<PRI>VERSION TIMESTAMP HOSTNAME APP-NAME PROCID MSGID SD MSG`. */
  val Rfc5424Pattern: String =
    "^<(\\d{1,3})>(\\d{1,2}) (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) (-|\\[.*\\])(?: (.*))?$"

  /** RFC3164: `<PRI>MMM dd HH:mm:ss HOST TAG[PID]: MSG`. */
  val Rfc3164Pattern: String =
    "^<(\\d{1,3})>([A-Z][a-z]{2} [ \\d]\\d \\d{2}:\\d{2}:\\d{2}) (\\S+) ([^\\[:]+)(?:\\[(\\d+)\\])?: (.*)$"

  /**
   * Parse RFC5424 lines: adds the syslog.* attribute columns the reference
   * sets, and a relationship column — `success` for parsed, `invalid` for
   * non-matching lines (ListenSyslog invalid routing).
   */
  def parseRfc5424(df: DataFrame, lineCol: Column): DataFrame = {
    val p = Rfc5424Pattern
    df
      .withColumn("syslog_valid", lineCol.rlike(p))
      .withColumn("syslog_priority", when(col("syslog_valid"), regexp_extract(lineCol, p, 1)))
      .withColumn("syslog_version", when(col("syslog_valid"), regexp_extract(lineCol, p, 2)))
      .withColumn("syslog_timestamp", when(col("syslog_valid"), regexp_extract(lineCol, p, 3)))
      .withColumn("syslog_hostname", when(col("syslog_valid"), regexp_extract(lineCol, p, 4)))
      .withColumn("syslog_app_name", when(col("syslog_valid"), regexp_extract(lineCol, p, 5)))
      .withColumn("syslog_procid", when(col("syslog_valid"), regexp_extract(lineCol, p, 6)))
      .withColumn("syslog_msgid", when(col("syslog_valid"), regexp_extract(lineCol, p, 7)))
      .withColumn("syslog_msg", when(col("syslog_valid"), regexp_extract(lineCol, p, 9)))
      .withColumn("relationship", when(col("syslog_valid"), "success").otherwise("invalid"))
      .drop("syslog_valid")
  }

  /** Severity/facility from PRI (priority = facility*8 + severity). */
  def severity(priCol: Column): Column = priCol.cast("long") % 8
  def facility(priCol: Column): Column = floor(priCol.cast("long") / 8)
}
