package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

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

  val queries: Map[String, Q] = Map(
    "c01_band_links" -> bandLinksQ,
    "c02_extract_metadata" -> extractMetadataQ)

  val oracle: Map[String, String] = Map(
    "c01_band_links" -> bandLinksSql,
    "c02_extract_metadata" -> extractMetadataSql)
}
