package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnMapping, Credentials, MappingRegistry}
import graft.transform.Transforms

class ControlPlaneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val keyHex = "00112233445566778899aabbccddeeff00112233445566778899aabbccddeeff"
  private val ivHex = "0102030405060708090a0b0c"

  test("connector password AES-GCM roundtrip matches the reference wire format (A19)") {
    val (ct, tag) = Credentials.encryptPassword("s3cr3t-pw", keyHex, ivHex)
    assert(Credentials.decryptPassword(ct, tag, keyHex, ivHex) === "s3cr3t-pw")
  }

  test("tampered auth tag is rejected") {
    val (ct, tag) = Credentials.encryptPassword("pw", keyHex, ivHex)
    val bad = (if (tag.head == '0') "1" else "0") + tag.tail
    intercept[Exception](Credentials.decryptPassword(ct, bad, keyHex, ivHex))
  }

  test("MappingRegistry parses per-connector target schemas (dynamic model mapping)") {
    val json =
      """{"conn-1": {"columns": [
        |  {"name": "customer_id", "source": "Customer Id", "type": "string"},
        |  {"name": "subscribed_on", "source": "Subscription Date", "type": "date",
        |   "format": "yyyy-MM-dd"}]},
        | "conn-2": {"columns": [
        |  {"name": "n", "source": "num", "type": "integer"}]}}""".stripMargin
    val reg = MappingRegistry.parse(json)
    assert(reg.keySet === Set("conn-1", "conn-2"))
    assert(reg("conn-1").columns === Seq(
      ColumnMapping("customer_id", "Customer Id", "string"),
      ColumnMapping("subscribed_on", "Subscription Date", "date", Some("yyyy-MM-dd"))))
  }

  test("a registry mapping drives the transform end-to-end") {
    val reg = MappingRegistry.parse(
      """{"c": {"columns": [
        |  {"name": "id", "source": "raw_id", "type": "integer"},
        |  {"name": "day", "source": "raw_day", "type": "date", "format": "dd/MM/yyyy"}]}}""".stripMargin)
    val df = Seq(("7", "02/01/2024")).toDF("raw_id", "raw_day")
    val out = Transforms.mapColumnsToTarget(df, reg("c")).head()
    assert(out.getInt(0) === 7)
    assert(out.getDate(1).toString === "2024-01-02")
  }

  test("malformed registry JSON fails loudly") {
    intercept[IllegalArgumentException](MappingRegistry.parse("""{"c": {"columns": 5}}"""))
    intercept[IllegalArgumentException](MappingRegistry.parse("""[1,2]"""))
  }
}
