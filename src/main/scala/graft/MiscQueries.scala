package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Last reference-operator stragglers (SURVEY.md §2): the hardcoded
  * record-patch rule (P9), digest-prefix strip (F7), meta-refresh redirect
  * extraction (F11) and case-insensitive header scan (F13).
  */
object MiscQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P9: surgical data-repair rule — one named (file, offset) gets a fixed
    // patched length (reference PrecompressionRunnable.java:119-133 patches
    // record length 8192 at offset 81984113 of one corrupt file)
    "p9_record_patch" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .withColumn("length",
          when($"l_orderkey" === 42 && $"l_linenumber" === 1, lit(8192L))
            .otherwise($"l_quantity".cast("long")))
        .withColumn("patched_group", ($"l_orderkey" === 42).cast("int"))
        .groupBy($"patched_group").agg(sum($"length").as("total_length"))
        .orderBy($"patched_group")
    }),

    // F7: 'sha1:X' → 'X' digest-prefix strip (normalizeSHA1:401-406)
    "f7_digest_strip" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("raw", concat(lit("sha1:"), md5($"text".cast("binary"))))
        .select($"doc_id", regexp_replace($"raw", "^sha1:", "").as("digest"))
        .orderBy($"doc_id")
    }),

    // F11: meta-refresh redirect extract: '<n>; url=<target>'
    // (parseMetaRefreshContent:496-506, pattern ^\d+\s*;\s*url=\s*(.+?)$)
    "f11_meta_refresh" -> ((s, dir) => {
      import s.implicits._
      val content = concat($"o_orderkey" % 30, lit("; url=/page/"), $"o_orderkey")
      t(s, dir, "orders").select($"o_orderkey",
          regexp_extract(content, "^(\\d+)\\s*;\\s*url=\\s*(.+)$", 2).as("redirect"))
        .orderBy($"o_orderkey")
    }),

    // F13: case-insensitive header lookup over a headers map
    // (scanHeadersLC:329-353) — map_filter + lower on keys
    "f13_header_scan" -> ((s, dir) => {
      import s.implicits._
      val headers = map(
        lit("Content-Type"), $"event_type",
        lit("X-Robots-Tag"), when($"event_id" % 3 === 0, "noindex").otherwise("all"),
        lit("LOCATION"), concat(lit("/moved/"), $"event_id"))
      t(s, dir, "events")
        .withColumn("hmap", headers)
        .select($"event_id",
          element_at(map_from_entries(transform(map_entries($"hmap"),
            e => struct(lower(e("key")).as("key"), e("value").as("value")))),
            "location").as("location_header"),
          element_at(map_from_entries(transform(map_entries($"hmap"),
            e => struct(lower(e("key")).as("key"), e("value").as("value")))),
            "x-robots-tag").as("robots_header"))
        .orderBy($"event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "p9_record_patch" ->
      """SELECT CAST(l_orderkey = 42 AS INT) AS patched_group,
        |       CAST(sum(CASE WHEN l_orderkey = 42 AND l_linenumber = 1
        |                     THEN 8192 ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT)
        |         AS total_length
        |FROM lineitem GROUP BY 1 ORDER BY patched_group""".stripMargin,
    "f7_digest_strip" ->
      """SELECT doc_id, regexp_replace('sha1:' || md5(text), '^sha1:', '') AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f11_meta_refresh" ->
      """SELECT o_orderkey,
        |  regexp_extract(CAST(o_orderkey % 30 AS VARCHAR) || '; url=/page/' || o_orderkey,
        |    '^(\d+)\s*;\s*url=\s*(.+)$', 2) AS redirect
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f13_header_scan" ->
      """SELECT event_id, '/moved/' || event_id AS location_header,
        |       CASE WHEN event_id % 3 = 0 THEN 'noindex' ELSE 'all' END AS robots_header
        |FROM events ORDER BY event_id""".stripMargin
  )
}
