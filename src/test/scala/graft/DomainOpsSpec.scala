package graft

import graft.operators.DomainOps

import org.apache.spark.sql.functions._

class DomainOpsSpec extends SparkSpec {
  import spark.implicits._

  test("extractDomain: scheme/port/path stripped, case folded, junk empty") {
    val rows = Seq(
      "https://Example.COM/path/x",
      "http://a.b.example.org",
      "https://example.net:8443/y",
      "ftp://not-web.example.com/z",
      "plain text")
      .toDF("url")
      .select(DomainOps.extractDomain(col("url")).as("d"))
      .as[String].collect().toSeq
    assert(rows == Seq("example.com", "a.b.example.org", "example.net", "", ""))
  }

  test("capPerDomain keeps exactly cap rows per domain, deterministically") {
    val docs = (1L to 40L).map(i => (i, s"https://site${i % 3}.example.com/d/$i"))
      .toDF("doc_id", "url")
    val kept = DomainOps
      .capPerDomain(docs, DomainOps.extractDomain(col("url")), "doc_id", cap = 5)
    val byDomain = kept.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(byDomain.values.toSet == Set(5L), s"cap violated: $byDomain")
    assert(byDomain.keySet ==
      Set("site0.example.com", "site1.example.com", "site2.example.com"))
    // deterministic: a second run selects the same rows
    val ids1 = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = DomainOps
      .capPerDomain(docs, DomainOps.extractDomain(col("url")), "doc_id", cap = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("the cap plans as a WindowGroupLimit (skew bounded map-side)") {
    val docs = (1L to 40L).map(i => (i, s"https://one.example.com/d/$i"))
      .toDF("doc_id", "url")
    val plan = DomainOps
      .capPerDomain(docs, DomainOps.extractDomain(col("url")), "doc_id", cap = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("domainStats reports totals and capped counts") {
    val docs = (1L to 7L).map(i => (i, s"https://site${i % 2}.example.com/d/$i"))
      .toDF("doc_id", "url")
    val rows = DomainOps
      .domainStats(docs, DomainOps.extractDomain(col("url")), cap = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("site0.example.com") == ((3L, 3L)))
    assert(rows("site1.example.com") == ((4L, 3L)))
  }
}
