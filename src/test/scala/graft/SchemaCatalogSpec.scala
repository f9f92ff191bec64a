package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.SchemaCatalog

/** Schema catalog: reference discovery, deterministic topological
  * registration order, unknown-reference and cycle failure, and
  * end-to-end parsing through Avro's own parser with cross-schema
  * named-type resolution (the initialiser's register-with-references
  * flow).
  */
class SchemaCatalogSpec extends AnyFunSuite {

  private val tradeData =
    """{"type": "record", "name": "TradeData", "fields": [
         {"name": "Trade_Id", "type": "string"},
         {"name": "Trade_Condition", "type": ["null", {"type": "array", "items": "string"}], "default": null},
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

  test("references sees through unions, arrays, and nested fields") {
    assert(SchemaCatalog.references(tradeData) === Set.empty)
    assert(SchemaCatalog.references(tradeCredential) === Set("TradeData"))
    assert(SchemaCatalog.references(tradeEvent) ===
      Set("TradeData", "TradeCredential"))
  }

  test("registration order puts every schema after its references") {
    val order = SchemaCatalog.registrationOrder(catalog)
    assert(order === Seq("TradeData", "TradeCredential", "TradeEvent"))
    // deterministic under input-map reordering
    assert(SchemaCatalog.registrationOrder(
      catalog.toSeq.reverse.toMap) === order)
  }

  test("self-referential (recursive) schemas register and parse fine") {
    val node = Map("Node" ->
      """{"type": "record", "name": "Node", "fields": [
           {"name": "v", "type": "long"},
           {"name": "next", "type": ["null", "Node"], "default": null}]}""")
    assert(SchemaCatalog.registrationOrder(node) === Seq("Node"))
    assert(SchemaCatalog.parseAll(node)("Node").getName === "Node")
  }

  test("unknown references and cycles fail loudly") {
    val dangling = Map("A" ->
      """{"type": "record", "name": "A", "fields": [{"name": "x", "type": "Ghost"}]}""")
    val e1 = intercept[IllegalArgumentException] {
      SchemaCatalog.registrationOrder(dangling)
    }
    assert(e1.getMessage.contains("Ghost"))
    val cyclic = Map(
      "A" -> """{"type": "record", "name": "A", "fields": [{"name": "b", "type": "B"}]}""",
      "B" -> """{"type": "record", "name": "B", "fields": [{"name": "a", "type": "A"}]}""")
    val e2 = intercept[IllegalArgumentException] {
      SchemaCatalog.registrationOrder(cyclic)
    }
    assert(e2.getMessage.contains("cycle"))
  }

  test("parseAll resolves named types across schemas via one parser") {
    val parsed = SchemaCatalog.parseAll(catalog)
    assert(parsed.keySet === catalog.keySet)
    val event = parsed("TradeEvent")
    // the union branch resolves to the SAME parsed record, not a copy
    val branch = event.getField("tradeData").schema().getTypes.get(1)
    assert(branch === parsed("TradeData"))
  }

  test("malformed schemas surface Avro's own parse errors") {
    val bad = Map("Bad" ->
      """{"type": "record", "name": "Bad", "fields": [{"name": "x", "type": "nope"}]}""")
    // "nope" is discovered as an unknown reference before Avro parsing
    intercept[IllegalArgumentException] {
      SchemaCatalog.parseAll(bad)
    }
    val badEnum = Map("E" ->
      """{"type": "enum", "name": "E", "symbols": ["ok", "ok"]}""")
    intercept[org.apache.avro.SchemaParseException] {
      SchemaCatalog.parseAll(badEnum)
    }
  }
}
