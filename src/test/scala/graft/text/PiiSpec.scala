package graft.text

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite {
  import graft.TestSession.spark
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("t").select(Pii.scrub(col("t"))).as[String].head()

  private def counts(s: String): (Long, Long, Long) =
    Seq(s).toDF("t").select(
      Pii.countMatches(col("t"), Pii.EmailRe),
      Pii.countMatches(col("t"), Pii.Ipv4Re),
      Pii.countMatches(col("t"), Pii.PhoneRe))
      .as[(Long, Long, Long)].head()

  test("redacts realistic emails, IPs and phones") {
    assert(scrubOne("mail jane.doe+spam@sub.example.co.uk now") ==
      "mail <EMAIL> now")
    assert(scrubOne("server at 192.168.0.1 and 10.255.3.77 down") ==
      "server at <IP> and <IP> down")
    assert(scrubOne("call 555-0042 or 555-867-5309 today") ==
      "call <PHONE> or <PHONE> today")
  }

  test("mixed text redacts every class and counts match") {
    val s = "from a_b%c@d-e.io via 8.8.8.8 tel 123-456-7890 end"
    assert(scrubOne(s) == "from <EMAIL> via <IP> tel <PHONE> end")
    assert(counts(s) == ((1L, 1L, 1L)))
  }

  test("scrub is idempotent") {
    val s = "x y9@z.org 1.2.3.4 555-1234 plain words"
    val once = scrubOne(s)
    assert(scrubOne(once) == once)
    assert(counts(once) == ((0L, 0L, 0L)))
  }

  test("does not over-match: bare domains, versions, long digit runs") {
    val s = "see example.com version 1.2.3 and 12345-678901 intact"
    assert(scrubOne(s) == s)
    assert(counts(s) == ((0L, 0L, 0L)))
  }

  test("word boundaries: digits glued to the pattern do not redact") {
    // 5555-0042 is not a 3-4 phone (boundary fails on the leading run);
    // 1.2.3.4.5 still contains a bounded dotted-quad prefix by design
    // (recall-favoring), so only the phone case must stay intact.
    assert(scrubOne("id 5555-0042 kept") == "id 5555-0042 kept")
  }

  test("luhnValid resolves names needing quoting; rejects backticks") {
    // 4532015112830366 passes Luhn; 4532015112830367 fails. The column
    // name carries a space and a dot — resolvable only because the
    // splice is backtick-quoted (a bare dot would parse as a struct path).
    val df = Seq("4532015112830366", "4532015112830367")
      .toDF("card no.1")
    val got = df.select(Pii.luhnValid("card no.1", 16)).as[Boolean].collect()
    assert(got.toSeq == Seq(true, false))
    val ex = intercept[IllegalArgumentException] {
      Pii.luhnValid("bad`name", 16)
    }
    assert(ex.getMessage.contains("backtick"))
  }
}
