package graft

import org.apache.spark.sql.functions._
import graft.operators.Selection
import graft.sources.Tables

/** End-to-end on the reference's OWN example data: a user of
  * brendano257/DataSelector can point graft at their JSON files and get the
  * same selection keys and the same export format their current tool emits.
  */
class ReferenceDataSpec extends SparkSpec {

  private val dataDir = "/root/reference/example/data"

  test("reference ethane.json: epoch correction and key format match formatISODate") {
    val ethane = Tables.seriesJson(spark, s"$dataDir/ethane.json", "ethane")
    val keyed = Selection.keyedSeries(ethane)
    // first record: date=1098130020 (2004-10-18 20:07 UTC), UTCoffset=-2
    // → corrected 2004-10-18 18:07, salt flask_number=3625-99
    // (reference index.js:401 + 726-735)
    val first = keyed.orderBy("epoch").limit(1).collect().head
    assert(first.getAs[String]("key_m") === "2004-10-18 18:07")
    assert(first.getAs[String]("sel_key") === "2004-10-18 18:07 3625-99")
  }

  test("rect selection + sorted JSON export on two reference compounds") {
    val series = Seq("ethane", "propane").map(c =>
      Selection.keyedSeries(Tables.seriesJson(spark, s"$dataDir/$c.json", c)))
      .reduce(_.unionByName(_))
      .withColumnRenamed("series", "compound")
    // a value-outlier rectangle across both compounds
    val sel = series.filter(col("value") > 3000.0)
      .select("compound", "sel_key")
    assert(sel.count() > 0, "expected outliers above 3000 in the example data")

    val json = Selection.exportJson(sel)
    // shape: sorted keys, each mapping to a sorted list of compounds
    val keyLines = json.linesIterator.filter(_.contains("\": [")).toSeq
    assert(keyLines.nonEmpty)
    val keys = keyLines.map(_.trim.takeWhile(_ != ':').replaceAll("\"", ""))
    assert(keys == keys.sorted, "export keys must be sorted like getJSONfile")
    assert(json.contains("\"ethane\"") || json.contains("\"propane\""))

    // applying the export back as a filter (the README's downstream use)
    // removes exactly the selected points
    val applied = series.join(broadcast(sel), Seq("compound", "sel_key"), "left_anti")
    assert(applied.count() === series.count() - series.join(
      broadcast(sel), Seq("compound", "sel_key"), "left_semi").count())
  }

  test("exportJson is byte-identical to the reference's getJSONfile rendering") {
    // The fixture is the reference's own rendering pipeline — JS
    // JSON.stringify(Object.fromEntries(sorted), mapReplacer, " ") plus the
    // global '],' → '],\n' regexReplace (index.js:818-836) — executed by
    // node over the same value>1500 selection on ethane+propane
    // (tools/gen_export_fixture.mjs regenerates it). 458 keys, one shared
    // key ("2011-03-07 19:27 3931-99" → both compounds), so multi-entry
    // objects, multi-element arrays, and the post-],  newline quirk are all
    // pinned byte-for-byte.
    val fixture = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        getClass.getResource("/reference_export_fixture.json").toURI)),
      java.nio.charset.StandardCharsets.UTF_8)
    val series = Seq("ethane", "propane").map(c =>
      Selection.keyedSeries(Tables.seriesJson(spark, s"$dataDir/$c.json", c)))
      .reduce(_.unionByName(_))
      .withColumnRenamed("series", "compound")
    val sel = series.filter(col("value") > 1500.0).select("compound", "sel_key")
    assert(Selection.exportJson(sel) === fixture)
  }
}
