package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Num.r6

/** Catalog/metadata scalar operators (SURVEY.md §2.1 filter_band_links,
  * §2.3 proj_extract_metadata; reference processor.py:105-109, 329-340).
  *
  * URL and GranuleUR strings are synthesized deterministically from the
  * testdata so the DuckDB oracle reproduces them bit-for-bit; the
  * filter/parse logic is exactly the reference's (band-substring link
  * filter, dot-split tile extraction, ISO-8601 round-trip, yyyyDDD cache
  * key).
  */
object Meta {

  type Q = (SparkSession, String) => DataFrame

  /** Band-link filter — processor.py:105-109: keep only asset URLs for
    * the four needed bands (here the B02/B04/B08 reflectance set). */
  val bandLinksQ: Q = (s, d) => {
    val p = Tables.part(s, d)
    p.select(
        col("p_partkey"),
        concat(lit("https://lpdaac.example/"), col("p_brand"), lit("/G"),
          col("p_partkey").cast("string"), lit(".B0"),
          (col("p_size") % 9).cast("string"), lit(".tif")).as("url"))
      .filter(col("url").rlike("\\.(B02|B04|B08)\\.tif$"))
      .withColumn("band", regexp_extract(col("url"), "(B0[0-9])\\.tif$", 1))
      .orderBy("p_partkey")
  }

  val bandLinksSql: String =
    """SELECT p_partkey, url, regexp_extract(url, '(B0[0-9])\.tif$', 1) AS band
      |FROM (
      |  SELECT p_partkey,
      |    'https://lpdaac.example/' || p_brand || '/G' || CAST(p_partkey AS VARCHAR)
      |      || '.B0' || CAST(p_size % 9 AS VARCHAR) || '.tif' AS url
      |  FROM part)
      |WHERE regexp_matches(url, '\.(B02|B04|B08)\.tif$')
      |ORDER BY p_partkey""".stripMargin

  /** GranuleUR/ISO metadata extraction — processor.py:329-340: tile id is
    * the 3rd dot-field of the UR; granule date parses from the ISO string;
    * cache key is strftime('%Y%j') (processor.py:343). */
  val extractMetadataQ: Q = (s, d) => {
    val px = Pixels.pixels(s, d)
    px.select("tile_id", "time").distinct()
      .withColumn("granule_ur",
        concat_ws(".", lit("HLS"), lit("S30"),
          concat(lit("T0"), col("tile_id").cast("string")),
          date_format(col("time"), "yyyyDDD'T'HHmmss"), lit("v2.0")))
      .withColumn("iso",
        date_format(col("time"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .select(
        col("granule_ur"),
        split(col("granule_ur"), "\\.").getItem(2).as("tile_field"),
        unix_timestamp(to_timestamp(col("iso"), "yyyy-MM-dd'T'HH:mm:ss'Z'")).as("epoch_s"),
        date_format(col("time"), "yyyyDDD").as("cache_key"))
      .orderBy("granule_ur")
  }

  val extractMetadataSql: String = Pixels.withPixels(
    """SELECT granule_ur,
      |  split_part(granule_ur, '.', 3) AS tile_field,
      |  CAST(epoch(strptime(iso, '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS epoch_s,
      |  strftime(time, '%Y%j') AS cache_key
      |FROM (
      |  SELECT DISTINCT tile_id, time,
      |    concat_ws('.', 'HLS', 'S30', 'T0' || CAST(tile_id AS VARCHAR),
      |      strftime(time, '%Y%jT%H%M%S'), 'v2.0') AS granule_ur,
      |    strftime(time, '%Y-%m-%dT%H:%M:%SZ') AS iso
      |  FROM pixels)
      |ORDER BY granule_ur""".stripMargin)

  /** Band-set completeness gate — processor.py:111-116/128-143: a granule
    * is processed only if ALL four band files arrived; partial sets are
    * rejected. Granules and their asset bands are synthesized from part
    * rows; the gate is `count(DISTINCT needed band) = 4` per granule —
    * the keyed-aggregate + HAVING shape of the reference's check. */
  val bandCompletenessQ: Q = (s, d) => {
    val p = Tables.part(s, d)
    val links = p.select(
      (col("p_partkey") % 500).as("granule_id"),
      element_at(
        array(lit("B02"), lit("B04"), lit("B08"), lit("Fmask"), lit("B05"), lit("B07")),
        (col("p_size") % 6 + 1).cast("int")).as("band"))
    val needed = Seq("B02", "B04", "B08", "Fmask")
    links
      .groupBy("granule_id")
      .agg(
        count(lit(1)).as("n_links"),
        countDistinct(when(col("band").isin(needed: _*), col("band"))).as("n_needed"))
      .filter(col("n_needed") === 4)
      .orderBy("granule_id")
  }

  val bandCompletenessSql: String =
    """SELECT granule_id, count(*) AS n_links,
      |  count(DISTINCT CASE WHEN band IN ('B02','B04','B08','Fmask')
      |        THEN band END) AS n_needed
      |FROM (
      |  SELECT p_partkey % 500 AS granule_id,
      |    ['B02','B04','B08','Fmask','B05','B07'][CAST(p_size % 6 + 1 AS INT)] AS band
      |  FROM part)
      |GROUP BY granule_id
      |HAVING count(DISTINCT CASE WHEN band IN ('B02','B04','B08','Fmask')
      |       THEN band END) = 4
      |ORDER BY granule_id""".stripMargin

  /** Dataset index metadata — arcgis.py:103-153 (sink_index_json math):
    * one row with grid bounds, center point, dims, affine transform
    * coefficients, and the date span — computed relationally from the
    * pixel cube at 0.00027°/px west-anchored like the reference grid
    * (processor.py:184-196). A single global aggregate: partial combine
    * map-side, one tiny final row. */
  val indexMetaQ: Q = (s, d) => {
    val px = Pixels.pixels(s, d)
    val pxDeg = 0.00027
    px.agg(
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        countDistinct("date").as("n_dates"),
        countDistinct("tile_id").as("n_tiles"))
      .select(
        (col("max_x") - col("min_x") + 1).as("width"),
        (col("max_y") - col("min_y") + 1).as("height"),
        col("n_dates"), col("n_tiles"),
        r6(col("min_x") * pxDeg).as("west"),
        r6((col("max_x") + 1) * lit(pxDeg)).as("east"),
        r6(col("min_y") * pxDeg).as("south"),
        r6((col("max_y") + 1) * lit(pxDeg)).as("north"),
        r6((col("min_x") + col("max_x") + 1) * lit(pxDeg) / 2.0).as("center_lon"),
        r6((col("min_y") + col("max_y") + 1) * lit(pxDeg) / 2.0).as("center_lat"),
        r6(lit(pxDeg)).as("t_a"),
        r6(lit(-pxDeg)).as("t_e"))
  }

  val indexMetaSql: String = Pixels.withPixels(
    """SELECT CAST(max(x) - min(x) + 1 AS INT) AS width,
      |  CAST(max(y) - min(y) + 1 AS INT) AS height,
      |  count(DISTINCT date) AS n_dates,
      |  count(DISTINCT tile_id) AS n_tiles,
      |  0.0 + round(min(x) * 0.00027, 6) AS west,
      |  0.0 + round((max(x) + 1) * 0.00027, 6) AS east,
      |  0.0 + round(min(y) * 0.00027, 6) AS south,
      |  0.0 + round((max(y) + 1) * 0.00027, 6) AS north,
      |  0.0 + round((min(x) + max(x) + 1) * 0.00027 / 2.0, 6) AS center_lon,
      |  0.0 + round((min(y) + max(y) + 1) * 0.00027 / 2.0, 6) AS center_lat,
      |  0.0 + round(0.00027, 6) AS t_a,
      |  0.0 + round(-0.00027, 6) AS t_e
      |FROM pixels""".stripMargin)

  val queries: Map[String, Q] = Map(
    "c01_band_links" -> bandLinksQ,
    "c02_extract_metadata" -> extractMetadataQ,
    "c03_band_completeness" -> bandCompletenessQ,
    "c04_index_meta" -> indexMetaQ)

  val oracle: Map[String, String] = Map(
    "c01_band_links" -> bandLinksSql,
    "c02_extract_metadata" -> extractMetadataSql,
    "c03_band_completeness" -> bandCompletenessSql,
    "c04_index_meta" -> indexMetaSql)
}
