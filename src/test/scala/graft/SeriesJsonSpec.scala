package graft

import java.nio.file.Files

import graft.sources.Tables

class SeriesJsonSpec extends SparkSpec {

  test("reads reference-shaped JSON series into the generic graft model") {
    // one record shaped exactly like /root/reference/example/data/ethane.json
    val json =
      """[{"site_code": "SUM", "year": 2004, "month": 10, "day": 18,
        |"flask_number": "3625-99", "value": 2114.881, "lat": 72.5962,
        |"lon": -38.422, "alt": 3214.54, "date": 1098130020.0,
        |"meas_date": 1120615500.0},
        |{"site_code": "SUM", "year": 2005, "month": 1, "day": 2,
        |"flask_number": "3700-01", "value": 1900.5, "lat": 72.5962,
        |"lon": -38.422, "alt": 3214.54, "date": 1104652800.0,
        |"meas_date": 1120615600.0}]""".stripMargin
    val f = Files.createTempFile("series", ".json")
    Files.writeString(f, json)

    val df = Tables.seriesJson(spark, f.toString, "ethane")
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[String]("series") == "ethane"))
    val first = rows.minBy(_.getAs[Double]("epoch"))
    assert(first.getAs[Double]("epoch") === 1098130020.0)
    assert(first.getAs[String]("salt") === "3625-99")
    assert(first.getAs[Double]("value") === 2114.881)
    assert(df.columns.contains("lat") && df.columns.contains("alt"))
  }

  test("tolerates records with missing fields — permissive schema, nulls filterable") {
    // second record lacks flask_number and value: reader must not throw,
    // and a QC pipeline can drop incomplete rows with a plain filter
    val json =
      """[{"flask_number": "A-1", "value": 10.5, "date": 1098130020.0},
        |{"date": 1098130080.0}]""".stripMargin
    val f = Files.createTempFile("series-sparse", ".json")
    Files.writeString(f, json)

    val df = Tables.seriesJson(spark, f.toString, "x")
    assert(df.count() === 2)
    val complete = df.filter(df("salt").isNotNull && df("value").isNotNull)
    assert(complete.count() === 1)
    assert(complete.head.getAs[String]("salt") === "A-1")
  }
}
