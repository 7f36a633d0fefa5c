package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{PiiFunctions => P}

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Int, Int, Int, Int, String) = {
    val r = Seq(text).toDF("t").select(
      P.countEmails(col("t")), P.countSsns(col("t")),
      P.countPhones(col("t")), P.countIps(col("t")),
      P.redact(col("t"))).head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
  }

  test("detects and redacts each PII family") {
    val (e, s, p, i, red) = one(
      "mail a.b+c@sub.example.org, ssn 123-45-6789, " +
        "call +1 555-123-4567, host 192.168.0.1 end")
    assert(e === 1)
    assert(s === 1)
    // the SSN digit run is also phone-shaped; counters are independent
    assert(p === 2)
    assert(i === 1)
    assert(red ===
      "mail [EMAIL], ssn [SSN], call [PHONE], host [IP] end")
  }

  test("clean text passes through untouched") {
    val t = "no pii here, just words and the number 42."
    assert(one(t) === ((0, 0, 0, 0, t)))
  }

  test("redaction order: SSN wins over phone, dots keep IPs off the phone class") {
    val (_, _, _, _, red) = one("id 987-65-4321 ip 10.0.0.7")
    assert(red === "id [SSN] ip [IP]")
  }

  test("short digit runs are not phones") {
    val (_, _, p, _, red) = one("row 12345 and 555-01")
    assert(p === 0)
    assert(red === "row 12345 and 555-01")
  }
}
