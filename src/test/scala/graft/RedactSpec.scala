package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** PII redaction (X53): the regexp chain must mask every PII form,
 *  leave near-misses alone, and keep surrounding text intact. */
class RedactSpec extends SparkTestBase {

  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.redactPii(col("t")))
      .head.getString(0)

  test("emails, IPv4s, and intl phones are masked; context survives") {
    assert(redact("mail a.b+c%d@sub.example.org now") === "mail <EMAIL> now")
    assert(redact("at 192.168.0.1 and 8.8.8.8.") === "at <IP> and <IP>.")
    assert(redact("call +12025550123 today") === "call <PHONE> today")
    assert(redact("x a@b.co 10.0.0.1 +1234567 y") === "x <EMAIL> <IP> <PHONE> y")
  }

  test("near-misses stay untouched") {
    // 4-digit octets, embedded digits, short/long phones, bare @
    assert(redact("v1.2.3.4000 build") === "v1.2.3.4000 build")
    assert(redact("a1.2.3.4b") === "a1.2.3.4b")
    assert(redact("+123456 is short") === "+123456 is short")
    assert(redact("price @ 10") === "price @ 10")
  }

  test("emails are eaten before their host could be mistaken for other PII") {
    // the host embeds a full IPv4 — email-first ordering must consume
    // it whole instead of leaving "u@<IP>.co" behind
    assert(redact("u@1.2.3.4.co") === "<EMAIL>")
    // digits-only host with no alpha TLD is NOT an email by design;
    // the embedded address still gets masked as an IP
    assert(redact("u@1.2.3.44") === "u@<IP>")
  }

  test("replacement is global, not first-match") {
    assert(redact("a@b.io c@d.io e@f.io") === "<EMAIL> <EMAIL> <EMAIL>")
  }

  test("graft_redact SQL function ≡ the Column builder") {
    graft.core.GraftFunctions.register(spark)
    val out = spark
      .sql("SELECT graft_redact('a@b.io at 10.0.0.1, +12345678') AS r")
      .head.getString(0)
    assert(out === "<EMAIL> at <IP>, <PHONE>")
  }
}
