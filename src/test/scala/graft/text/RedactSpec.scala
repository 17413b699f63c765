package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, URLs, phones, IPs with tokens") {
    val df = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "see https://a.example.com/p?q=1 or call 555-123-4567",
      "server 192.168.1.100 is down",
      "clean text with no pii at all").toDF("t")
    val out = df.select(Redact.redactPii(col("t")).as("r")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "see <URL> or call <PHONE>")
    assert(out(2) == "server <IP> is down")
    assert(out(3) == "clean text with no pii at all")
  }

  test("URLs are redacted before the narrower patterns can half-match them") {
    val df = Seq("go to https://u@h.example.com/10.0.0.1/x now").toDF("t")
    val out = df.select(Redact.redactPii(col("t")).as("r")).as[String].head()
    assert(out == "go to <URL> now") // the email/IP inside the URL never leak
  }

  test("piiCount counts all occurrences") {
    val df = Seq("a@b.co and c@d.org and 1.2.3.4").toDF("t")
    val n = df.select(
      Redact.piiCount(col("t"), Redact.EmailPattern).as("e"),
      Redact.piiCount(col("t"), Redact.Ipv4Pattern).as("i")).head()
    assert(n.getLong(0) == 2L && n.getLong(1) == 1L)
  }
}
