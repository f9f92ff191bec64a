package graft

import org.apache.avro.Schema
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{SchemaCompat, SchemaRegistryClient, SchemaRegistryServer}
import graft.model.SchemaRegistryClient.SchemaRegistryException

/** The evolution gate: [[SchemaCompat]]'s Confluent-rule matrix over
  * Avro's resolution rules, and the registry stub ENFORCING it —
  * incompatible registrations bounce with HTTP 409, dry-run checks
  * answer without registering, and per-subject modes switch the
  * rules (the behavior a reference operator relies on when evolving
  * trade_event.avsc against a live registry).
  */
class SchemaCompatSpec extends AnyFunSuite {

  private def parse(s: String): Schema = new Schema.Parser().parse(s)

  private val base =
    """{"type":"record","name":"User","fields":[
        {"name":"name","type":"string"},
        {"name":"age","type":"long"}]}"""
  private val addWithDefault =
    """{"type":"record","name":"User","fields":[
        {"name":"name","type":"string"},
        {"name":"age","type":"long"},
        {"name":"email","type":"string","default":""}]}"""
  private val addNoDefault =
    """{"type":"record","name":"User","fields":[
        {"name":"name","type":"string"},
        {"name":"age","type":"long"},
        {"name":"email","type":"string"}]}"""
  private val removeAge =
    """{"type":"record","name":"User","fields":[
        {"name":"name","type":"string"}]}"""
  private val ageAsString =
    """{"type":"record","name":"User","fields":[
        {"name":"name","type":"string"},
        {"name":"age","type":"string"}]}"""
  private val ageAsDouble =
    """{"type":"record","name":"User","fields":[
        {"name":"name","type":"string"},
        {"name":"age","type":"double"}]}"""

  test("the public compatibility matrix over Avro resolution rules") {
    import SchemaCompat._
    val b = parse(base)
    // add WITH default: compatible in every direction
    assert(check(Backward, parse(addWithDefault), Seq(b)))
    assert(check(Forward, parse(addWithDefault), Seq(b)))
    assert(check(Full, parse(addWithDefault), Seq(b)))
    // add WITHOUT default: forward-only (old reader ignores it; new
    // reader cannot fill it from old data)
    assert(!check(Backward, parse(addNoDefault), Seq(b)))
    assert(check(Forward, parse(addNoDefault), Seq(b)))
    assert(!check(Full, parse(addNoDefault), Seq(b)))
    // remove a no-default field: backward-only (mirror image)
    assert(check(Backward, parse(removeAge), Seq(b)))
    assert(!check(Forward, parse(removeAge), Seq(b)))
    // type change long -> string: incompatible both ways
    assert(!check(Backward, parse(ageAsString), Seq(b)))
    assert(!check(Forward, parse(ageAsString), Seq(b)))
    // numeric promotion long -> double: readable by the NEW schema
    // only (long promotes to double, not back)
    assert(check(Backward, parse(ageAsDouble), Seq(b)))
    assert(!check(Forward, parse(ageAsDouble), Seq(b)))
    // NONE: anything goes
    assert(check(None, parse(ageAsString), Seq(b)))
    // first version of a subject is always acceptable
    assert(check(Full, b, Seq.empty))
  }

  test("transitive modes check EVERY prior, not just the latest") {
    import SchemaCompat._
    val v1 = parse(base)
    val v2 = parse(addWithDefault)
    // candidate reads v2 (its extra field has a default) but not v1
    // (addNoDefault's email can't be filled from v1 data)... build a
    // case: v3 adds a second no-default field relative to v1 but
    // with-default relative to nothing — use addNoDefault: it can
    // read NEITHER prior; and a with-default evolution reads both.
    assert(check(BackwardTransitive, parse(addWithDefault), Seq(v1, v2)))
    assert(!check(BackwardTransitive, parse(addNoDefault), Seq(v1, v2)))
    // non-transitive BACKWARD only looks at the latest prior: a
    // candidate identical to v2 passes even though v1 history exists
    assert(check(Backward, v2, Seq(v1, v2)))
  }

  test("the registry stub enforces the subject mode with 409 and answers dry-runs") {
    val server = new SchemaRegistryServer()
    try {
      val client = new SchemaRegistryClient(server.baseUrl)
      // default mode is the registry default
      assert(client.getCompatibility("users-value") === "BACKWARD")
      client.register("users-value", base)

      // dry-run: no registration happens either way
      assert(client.testCompatibility("users-value", addWithDefault))
      assert(!client.testCompatibility("users-value", addNoDefault))
      assert(client.latestVersion("users-value").version === 1)

      // incompatible evolution bounces with the registry's 409
      val e = intercept[SchemaRegistryException](
        client.register("users-value", addNoDefault))
      assert(e.status === 409)
      assert(client.latestVersion("users-value").version === 1,
        "a rejected registration must not create a version")

      // compatible evolution lands as version 2
      client.register("users-value", addWithDefault)
      assert(client.latestVersion("users-value").version === 2)

      // NONE disables the gate; the previously-rejected schema lands
      client.setCompatibility("users-value", "NONE")
      client.register("users-value", addNoDefault)
      assert(client.latestVersion("users-value").version === 3)

      // FORWARD mode on a fresh subject: removing a no-default field
      // is the forward-incompatible case
      client.setCompatibility("fwd-value", "FORWARD")
      client.register("fwd-value", base)
      assert(!client.testCompatibility("fwd-value", removeAge))
      intercept[SchemaRegistryException](
        client.register("fwd-value", removeAge))
      assert(client.testCompatibility("fwd-value", addNoDefault))

      // malformed candidate: dry-run answers false instead of 500
      assert(!client.testCompatibility("users-value",
        """{"type":"record","name":"User"}"""))
    } finally server.close()
  }
}
