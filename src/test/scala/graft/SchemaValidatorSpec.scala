package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.SchemaValidator
import graft.model.SchemaValidator.SchemaValidationException

/** The pre-registration schema lint
  * (avro_schema_validator.py:17-180): every reference check class —
  * structure, names, record fields, enum symbols, fixed size, union
  * arity, array/map payloads — plus the two spec-level union rules
  * the in-repo registration adds.
  */
class SchemaValidatorSpec extends AnyFunSuite {

  private def errs(json: String): Seq[String] =
    SchemaValidator.validate(json).errors

  test("the repo's real schemas validate clean") {
    for (s <- Seq(
        graft.model.TradeAvro.tradeEventSchema,
        graft.model.HealthAvro.healthSensorRecordSchema))
      assert(SchemaValidator.validate(s.toString).ok, s.getFullName)
  }

  test("missing type/name and bad identifiers are errors") {
    assert(errs("""{"name": "X"}""").exists(_.contains("missing required 'type'")))
    assert(errs("""{"type": "record", "fields": []}""")
      .exists(_.contains("missing required 'name'")))
    assert(errs("""{"type": "record", "name": "9bad", "fields": []}""")
      .exists(_.contains("invalid name")))
    assert(errs("""{"type": "record", "name": "A", "namespace": "a..b", "fields": []}""")
      .exists(_.contains("invalid namespace")))
  }

  test("record fields: array shape, names, duplicates, types") {
    assert(errs("""{"type": "record", "name": "A", "fields": {}}""")
      .exists(_.contains("'fields' must be an array")))
    assert(errs("""{"type": "record", "name": "A", "fields": [{"type": "int"}]}""")
      .exists(_.contains("missing 'name'")))
    assert(errs("""{"type": "record", "name": "A", "fields": [
        {"name": "f", "type": "int"}, {"name": "f", "type": "long"}]}""")
      .exists(_.contains("duplicate field 'f'")))
    assert(errs("""{"type": "record", "name": "A", "fields": [{"name": "f"}]}""")
      .exists(_.contains("field 'f' missing 'type'")))
  }

  test("enum symbols: non-empty, unique, identifier-shaped") {
    assert(errs("""{"type": "enum", "name": "E", "symbols": []}""")
      .exists(_.contains("at least one symbol")))
    assert(errs("""{"type": "enum", "name": "E", "symbols": ["A", "A"]}""")
      .exists(_.contains("duplicate symbol")))
    assert(errs("""{"type": "enum", "name": "E", "symbols": ["A-B"]}""")
      .exists(_.contains("invalid symbol")))
    assert(SchemaValidator.validate(
      """{"type": "enum", "name": "E", "symbols": ["A", "B"]}""").ok)
  }

  test("fixed size must be a present non-negative integer") {
    assert(errs("""{"type": "fixed", "name": "F"}""")
      .exists(_.contains("missing 'size'")))
    assert(errs("""{"type": "fixed", "name": "F", "size": -1}""")
      .exists(_.contains("non-negative")))
    assert(SchemaValidator.validate(
      """{"type": "fixed", "name": "F", "size": 16}""").ok)
  }

  test("unions: arity >= 2, no nested unions, distinct branches") {
    def rec(t: String) =
      s"""{"type": "record", "name": "A", "fields": [{"name": "f", "type": $t}]}"""
    assert(errs(rec("""["null"]""")).exists(_.contains(">= 2 types")))
    assert(errs(rec("""["null", ["int", "long"]]"""))
      .exists(_.contains("may not be a union")))
    assert(errs(rec("""["int", "int"]"""))
      .exists(_.contains("duplicate union branch")))
    assert(SchemaValidator.validate(rec("""["null", "string"]""")).ok)
  }

  test("array/map payloads are required and recursed") {
    def rec(t: String) =
      s"""{"type": "record", "name": "A", "fields": [{"name": "f", "type": $t}]}"""
    assert(errs(rec("""{"type": "array"}""")).exists(_.contains("missing 'items'")))
    assert(errs(rec("""{"type": "map"}""")).exists(_.contains("missing 'values'")))
    // nested complex types recurse: the inner enum's duplicate symbol
    // surfaces from two levels down
    assert(errs(rec("""{"type": "array", "items":
        {"type": "enum", "name": "E", "symbols": ["X", "X"]}}"""))
      .exists(_.contains("duplicate symbol")))
  }

  test("unknown string type references warn, not error (registry may resolve)") {
    val r = SchemaValidator.validate(
      """{"type": "record", "name": "A", "fields": [
          {"name": "f", "type": "SomeOtherRecord"}]}""")
    assert(r.ok)
  }

  test("validateOrThrow reports every problem at once, like the initialiser") {
    val bad = """{"type": "record", "name": "9x", "fields": [
        {"name": "a", "type": ["null"]}, {"name": "a", "type": "int"}]}"""
    val e = intercept[SchemaValidationException](
      SchemaValidator.validateOrThrow(bad, "bad.avsc"))
    assert(e.getMessage.contains("invalid name"))
    assert(e.getMessage.contains(">= 2 types"))
    assert(e.getMessage.contains("duplicate field"))
  }

  test("unparseable JSON is a reported error, not an exception") {
    assert(errs("{nope").nonEmpty)
  }
}
