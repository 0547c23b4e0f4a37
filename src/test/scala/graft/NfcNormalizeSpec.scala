package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize
import org.apache.spark.unsafe.types.UTF8String

/** The Unicode NFC custom expression: composition semantics, ASCII
  * identity fast path, null propagation, idempotence. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(NfcNormalize(col("t")).as("n"))
      .collect().head.getString(0)

  test("decomposed e + U+0301 composes to precomposed é") {
    assert(nfc("caf" + "e\u0301") == "caf\u00e9")
    assert(nfc("e\u0301").length == 1)
  }

  test("already-composed and pure-ASCII strings are unchanged") {
    assert(nfc("caf\u00e9") == "caf\u00e9")
    assert(nfc("plain ascii") == "plain ascii")
  }

  test("idempotent: nfc(nfc(x)) == nfc(x)") {
    val mixed = "a\u030Ab c\u0327 x\u0301y" // ring, cedilla, acute combining marks
    assert(nfc(nfc(mixed)) == nfc(mixed))
  }

  test("ASCII fast path returns the input object (no re-encode)") {
    val s = UTF8String.fromString("ascii only")
    assert(NfcNormalize.norm(s) eq s)
    // non-ASCII but already normalized also avoids re-encoding
    val t = UTF8String.fromString("caf\u00e9")
    assert(NfcNormalize.norm(t) eq t)
  }

  test("null propagates") {
    val r = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(NfcNormalize(col("t")).as("n")).collect().head
    assert(r.isNullAt(0))
  }
}
