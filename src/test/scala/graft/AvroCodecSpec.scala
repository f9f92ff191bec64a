package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Binary Avro codec roundtrips for both union branches of the
  * TradeEvent envelope (trade_event.avsc:6-231), including the
  * None/Some cases of the optional Trade_Condition.
  */
class AvroCodecSpec extends AnyFunSuite {

  private val td = TradeData(
    Trade_Id = "T42",
    Trade_Condition = Some(Seq("click", "regular")),
    Price = 123.45,
    Symbol = "SYM3",
    Event_Timestamp = 1706745600123L,
    Volume = 69.0)

  private val cred = TradeCredential(
    context = Seq("https://www.w3.org/2018/credentials/v1"),
    id = "vc:trade-42",
    issuanceDate = "2024-01-01T00:00:07Z",
    issuer = Issuer("did:web:graft.example:issuer"),
    credentialSubject = CredentialSubject("did:key:z8", Claims(td)),
    proof = Proof(jwt = "jwt-42", `type` = "JwtProof2020"),
    `type` = Seq("VerifiableCredential"))

  test("tradeData branch roundtrips (Some Trade_Condition)") {
    val ev = TradeEvent("2024-01-01T00:00:07Z", "SYM3", "trade-42",
      tradeData = Some(td), tradeCredential = None)
    val codec = new AvroCodec
    assert(codec.decode(codec.encode(ev)) === ev)
  }

  test("tradeData branch roundtrips (None Trade_Condition)") {
    val ev = TradeEvent("2024-01-01T00:00:07Z", "SYM3", "trade-42",
      tradeData = Some(td.copy(Trade_Condition = None)), tradeCredential = None)
    val codec = new AvroCodec
    assert(codec.decode(codec.encode(ev)) === ev)
  }

  test("tradeCredential branch roundtrips") {
    val ev = TradeEvent("2024-01-01T00:00:07Z", "SYM3", "trade-42",
      tradeData = None, tradeCredential = Some(cred))
    val codec = new AvroCodec
    assert(codec.decode(codec.encode(ev)) === ev)
  }

  test("codec instance is reusable across messages (pooled shape)") {
    val codec = new AvroCodec
    val evs = (0 until 50).map { i =>
      TradeEvent(s"2024-01-01T00:00:$i", s"SYM${i % 7}", s"trade-$i",
        tradeData = if (i % 2 == 0) Some(td.copy(Trade_Id = s"T$i")) else None,
        tradeCredential = if (i % 2 == 1) Some(cred.copy(id = s"vc:trade-$i")) else None)
    }
    evs.foreach(ev => assert(codec.decode(codec.encode(ev)) === ev))
  }

  test("encode is deterministic byte-for-byte") {
    val ev = TradeEvent("2024-01-01T00:00:07Z", "SYM3", "trade-42",
      tradeData = None, tradeCredential = Some(cred))
    val a = new AvroCodec().encode(ev)
    val b = new AvroCodec().encode(ev)
    assert(java.util.Arrays.equals(a, b))
  }

  // --- Confluent registry wire format ---------------------------

  test("wire frame is magic 0x0 + big-endian schema id + avro payload") {
    val ev = TradeEvent("2024-01-01T00:00:07Z", "SYM3", "trade-42",
      tradeData = Some(td), tradeCredential = None)
    val codec = new AvroCodec
    val framed = codec.encodeWire(ev, schemaId = 0x01020304)
    // hand-built golden frame: header bytes are the spec'd layout
    assert(framed(0) === 0x0.toByte)
    assert(framed.slice(1, 5).toSeq ===
      Seq(0x01.toByte, 0x02.toByte, 0x03.toByte, 0x04.toByte))
    assert(framed.drop(5).toSeq === codec.encode(ev).toSeq,
      "payload after the 5-byte header is plain Avro binary")
  }

  test("hand-built golden frame decodes: header + payload → (id, event)") {
    val ev = TradeEvent("2024-01-01T00:00:07Z", "SYM3", "trade-42",
      tradeData = Some(td), tradeCredential = None)
    val codec = new AvroCodec
    val golden = Array[Byte](0x0, 0x0, 0x0, 0x0, 42) ++ codec.encode(ev)
    val (id, got) = codec.decodeWire(golden)
    assert(id === 42)
    assert(got === ev)
  }

  test("unframed bytes fail loudly (wrong magic)") {
    val ev = TradeEvent("2024-01-01T00:00:07Z", "SYM3", "trade-42",
      tradeData = Some(td), tradeCredential = None)
    val codec = new AvroCodec
    val bare = codec.encode(ev)
    // plain Avro binary of this envelope starts with a non-zero byte,
    // so a consumer expecting registry framing must reject it
    assertThrows[IllegalArgumentException](codec.decodeWire(bare))
    assertThrows[IllegalArgumentException](
      codec.decodeWire(Array[Byte](0x1, 0, 0, 0, 1)))
    assertThrows[IllegalArgumentException](codec.decodeWire(Array.empty[Byte]))
  }
}
