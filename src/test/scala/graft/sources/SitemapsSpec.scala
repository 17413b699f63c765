package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  private val doc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://d.com/a</loc>
      |    <lastmod>2024-03-05T10:00:00+00:00</lastmod>
      |    <changefreq>Daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc> https://d.com/b </loc></url>
      |  <url><lastmod>2024-01-01</lastmod></url>
      |  <url><loc>https://d.com/c</loc><lastmod>bogus</lastmod><priority>junk</priority></url>
      |  <url><loc>https://d.com/d</loc><lastmod>2024-02-30</lastmod></url>
      |</urlset>""".stripMargin

  private val index =
    """<sitemapindex>
      |  <sitemap><loc>https://d.com/sitemap-1.xml</loc><lastmod>2024-02-02</lastmod></sitemap>
      |  <sitemap><loc>https://d.com/sitemap-2.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin

  test("parseSitemap: loc/lastmod/changefreq/priority, loc-less entries dropped") {
    val got = Sitemaps.parseSitemap(
        Seq(("https://d.com/sitemap.xml", doc)).toDF("u", "x"), col("u"), col("x"))
      .select("loc", "lastmod_date", "changefreq", "priority", "is_index")
      .as[(String, Option[java.sql.Date], Option[String], Option[Double], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("https://d.com/a", Some(java.sql.Date.valueOf("2024-03-05")), Some("daily"), Some(0.8), false),
      ("https://d.com/b", None, None, None, false),
      // malformed lastmod/priority parse to null, never an ANSI error
      ("https://d.com/c", None, None, None, false),
      // digit-SHAPED but invalid date (Feb 30) must also null, not raise
      ("https://d.com/d", None, None, None, false)))
  }

  test("parseSitemap: CDATA-wrapped values and namespace-qualified tags parse") {
    // both are common in the wild: CMS generators CDATA-wrap loc, and
    // some emit namespace-prefixed tags; a surviving CDATA wrapper
    // would silently fail host matching downstream in Robots/Frontier
    val wrapped =
      """<urlset>
        |  <url><loc><![CDATA[https://d.com/cdata?a=1&b=2]]></loc>
        |       <lastmod><![CDATA[2024-04-01]]></lastmod></url>
        |  <url><sm:loc>https://d.com/ns</sm:loc>
        |       <sm:priority>0.5</sm:priority></url>
        |</urlset>""".stripMargin
    val got = Sitemaps.parseSitemap(
        Seq(("https://d.com/sitemap.xml", wrapped)).toDF("u", "x"), col("u"), col("x"))
      .select("loc", "lastmod_date", "priority")
      .as[(String, Option[java.sql.Date], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("https://d.com/cdata?a=1&b=2", Some(java.sql.Date.valueOf("2024-04-01")), None),
      ("https://d.com/ns", None, Some(0.5))))
  }

  test("parseSitemap: sitemapindex entries surface as is_index rows") {
    val got = Sitemaps.parseSitemap(
        Seq(("https://d.com/sitemap.xml", index)).toDF("u", "x"), col("u"), col("x"))
      .select("loc", "is_index", "lastmod_date")
      .as[(String, Boolean, Option[java.sql.Date])].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("https://d.com/sitemap-1.xml", true, Some(java.sql.Date.valueOf("2024-02-02"))),
      ("https://d.com/sitemap-2.xml", true, None)))
  }

  test("newSince: strictly-newer entries plus unknown-freshness entries") {
    val entries = Sitemaps.parseSitemap(
      Seq(("https://d.com/sitemap.xml", doc)).toDF("u", "x"), col("u"), col("x"))
    val got = Sitemaps.newSince(entries, java.sql.Date.valueOf("2024-03-01"))
      .select("loc").as[String].collect().toSet
    // /a is newer; /b, /c, /d have no (valid) lastmod → conservative keep
    assert(got === Set("https://d.com/a", "https://d.com/b",
      "https://d.com/c", "https://d.com/d"))
    val none = Sitemaps.newSince(entries, java.sql.Date.valueOf("2024-03-05"))
      .select("loc").as[String].collect().toSet
    // equal-to-mark is NOT strictly newer
    assert(none === Set("https://d.com/b", "https://d.com/c", "https://d.com/d"))
  }
}
