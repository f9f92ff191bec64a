package graft

import org.apache.avro.Schema
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.SchemaRegistryClient.{SchemaRegistryException, SchemaRef}

/** The registry seam end-to-end, zero egress: the in-process
  * Confluent-subset stub ([[SchemaRegistryServer]]) driven by the
  * REST client ([[SchemaRegistryClient]]) through the reference's
  * three flows — the initialiser's register-in-dependency-order with
  * references (schema_registry_manager.py:23-66), the producer's
  * `use.latest.version` latest fetch (kafka_producer.py:49-62), and
  * the consumer's wire-format id resolution — ending in BYTE-LEVEL
  * agreement between the id the registry issued and the id inside
  * the framed Avro message ([[AvroCodec]]'s Confluent framing).
  */
class SchemaRegistrySpec extends AnyFunSuite {

  private val tradeData =
    """{"type": "record", "name": "TradeData", "fields": [
         {"name": "Trade_Id", "type": "string"},
         {"name": "Price", "type": "double"},
         {"name": "Event_Timestamp", "type": "long"}]}"""

  private val tradeCredential =
    """{"type": "record", "name": "TradeCredential", "fields": [
         {"name": "context", "type": {"type": "array", "items": "string"}},
         {"name": "claims", "type": "TradeData"}]}"""

  private val tradeEvent =
    """{"type": "record", "name": "TradeEvent", "fields": [
         {"name": "symbol", "type": "string"},
         {"name": "tradeData", "type": ["null", "TradeData"], "default": null},
         {"name": "tradeCredential", "type": ["null", "TradeCredential"], "default": null}]}"""

  private val catalog = Map(
    "TradeEvent" -> tradeEvent,
    "TradeCredential" -> tradeCredential,
    "TradeData" -> tradeData)

  private def withRegistry[A](f: (SchemaRegistryServer, SchemaRegistryClient) => A): A = {
    val server = new SchemaRegistryServer()
    try f(server, new SchemaRegistryClient(server.baseUrl))
    finally server.close()
  }

  test("initialiser flow: dependency-ordered registration with references, " +
    "content-addressed ids, idempotent re-registration") {
    withRegistry { (server, client) =>
      val reg = client.registerCatalog(catalog)
      assert(reg.keySet === catalog.keySet)
      assert(server.subjectNames ===
        Seq("TradeData-value", "TradeCredential-value", "TradeEvent-value"),
        "registration must hit the registry in dependency order")
      assert(reg.values.map(_._3).toSeq.sorted === Seq(1, 2, 3),
        "global ids are dense and content-addressed")

      val latest = client.latestVersion("TradeEvent-value")
      assert(latest.version === 1)
      assert(latest.schema === tradeEvent)
      assert(latest.references.toSet === Set(
        SchemaRef("TradeCredential", "TradeCredential-value", 1),
        SchemaRef("TradeData", "TradeData-value", 1)))

      // the whole catalog again: same ids, same versions, no growth
      assert(client.registerCatalog(catalog) === reg)
      assert(client.latestVersion("TradeEvent-value").version === 1)
      assert(client.subjects().toSet ===
        Set("TradeData-value", "TradeCredential-value", "TradeEvent-value"))
    }
  }

  test("a changed schema under the same subject gets a new version and id; " +
    "missing subjects/ids carry the registry error codes") {
    withRegistry { (_, client) =>
      val id1 = client.register("TradeData-value", tradeData)
      // a default-carrying addition: passes the subject's BACKWARD
      // gate (SchemaCompatSpec covers the rejection paths)
      val evolved = tradeData.replace(
        """{"name": "Price", "type": "double"}""",
        """{"name": "Price", "type": "double"}, {"name": "Volume", "type": "double", "default": 0.0}""")
      assert(evolved != tradeData, "fixture must actually evolve")
      val id2 = client.register("TradeData-value", evolved)
      assert(id2 != id1)
      val latest = client.latestVersion("TradeData-value")
      assert(latest.version === 2 && latest.id === id2)

      val e1 = intercept[SchemaRegistryException](
        client.latestVersion("nope-value"))
      assert(e1.status === 404 && e1.getMessage.contains("40401"))
      val e2 = intercept[SchemaRegistryException](client.schemaById(999))
      assert(e2.status === 404 && e2.getMessage.contains("40403"))

      // Confluent semantics: re-POSTing a schema the subject ALREADY
      // registered (any prior version, not only latest) returns the
      // existing id and appends NO new version — appending would
      // mint a version that bypassed the compatibility gate (e.g.
      // v1 re-registered after a field-removing v2 under BACKWARD)
      val idAgain = client.register("TradeData-value", tradeData)
      assert(idAgain === id1, "re-registering v1 returns v1's id")
      assert(client.latestVersion("TradeData-value").version === 2,
        "no phantom v3 from re-registering prior content")
    }
  }

  test("wire-format id agreement: producer frames with the registry's " +
    "latest id; consumer resolves the framed id back to the same schema") {
    withRegistry { (_, client) =>
      // producer startup: register (initialiser) then resolve latest
      // (use.latest.version) — the real TradeEvent schema, subject
      // named by the reference's TopicNameStrategy
      val registered = client.register("trade_event-value",
        TradeAvro.tradeEventSchema.toString)
      val latest = client.latestVersion("trade_event-value")
      assert(latest.id === registered)

      val td = TradeData("T42", Some(Seq("click")), 123.45, "SYM3",
        1706745600123L, 69.0)
      val ev = TradeEvent("2024-01-01T00:00:07Z", "SYM3", "trade-42",
        tradeData = Some(td), tradeCredential = None)
      val codec = new AvroCodec
      val framed = codec.encodeWire(ev, latest.id)

      // consumer: read the frame, resolve its id against the registry
      val (frameId, decoded) = codec.decodeWire(framed)
      assert(frameId === latest.id, "id inside the frame == registry id")
      assert(decoded === ev)
      val resolved = new Schema.Parser().parse(client.schemaById(frameId))
      assert(resolved === TradeAvro.tradeEventSchema,
        "registry-resolved schema is the writer schema, canonical-form equal")
    }
  }
}
