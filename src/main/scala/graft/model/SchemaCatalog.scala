package graft.model

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.Schema

/** Schema catalog: named-Avro-schema dependency analysis, the
  * counterpart of the reference's initialiser component
  * (kafka_initialiser/app/schema_loader.py:27-189 — reference
  * discovery, Kahn topological sort, registration in dependency
  * order; validation per avro_schema_validator.py:18-187).
  *
  * The reference registers against a Confluent registry with
  * `SchemaReference`s; this catalog is registry-agnostic: it returns
  * the registration ORDER (every schema after everything it
  * references) and validates each schema with Avro's own parser,
  * preloaded with its already-parsed dependencies — driver-side setup
  * like the DID bootstrap (SURVEY.md §2.5 U3), not a Spark operator.
  */
object SchemaCatalog {

  private val mapper = new ObjectMapper

  private val primitives = Set(
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
    "record", "enum", "fixed", "array", "map", "union")

  /** Named-type references of one schema JSON: every textual value in
    * a type position ("type" / "items" / "values", including inside
    * union arrays) that is not an Avro keyword. Matches how the
    * reference discovers cross-file references before registry
    * resolution.
    */
  def references(schemaJson: String): Set[String] = {
    val out = Set.newBuilder[String]
    def capture(n: JsonNode): Unit =
      if (n.isTextual) {
        if (!primitives.contains(n.asText)) out += n.asText
      } else if (n.isArray) n.elements().asScala.foreach(capture)
      else if (n.isObject) walk(n)
    def walk(n: JsonNode): Unit =
      if (n.isObject) {
        Seq("type", "items", "values").foreach { k =>
          val c = n.get(k)
          if (c != null) capture(c)
        }
        val fields = n.get("fields")
        if (fields != null) fields.elements().asScala.foreach(walk)
      } else if (n.isArray) n.elements().asScala.foreach(walk)
    walk(mapper.readTree(schemaJson))
    out.result()
  }

  /** Registration order over a (name → schema JSON) catalog: Kahn's
    * algorithm over the in-catalog reference edges, name-sorted at
    * each step so the order is deterministic. References to names
    * outside the catalog fail loudly (the reference's initialiser
    * likewise refuses to register a schema whose dependency is
    * unknown). SELF-reference is valid Avro (recursive records) and
    * imposes no ordering constraint; cycles ACROSS schemas fail
    * loudly because no one-schema-at-a-time registration order can
    * satisfy them.
    */
  def registrationOrder(schemas: Map[String, String]): Seq[String] = {
    val deps: Map[String, Set[String]] = schemas.map { case (name, json) =>
      val refs = references(json)
      val unknown = refs.filterNot(schemas.contains)
      require(unknown.isEmpty,
        s"schema $name references unknown types: ${unknown.toSeq.sorted.mkString(", ")}")
      // self-reference is VALID Avro (recursive records like linked
      // nodes parse fine) and is not an ordering constraint
      name -> (refs - name)
    }
    val order = Seq.newBuilder[String]
    var remaining = deps
    while (remaining.nonEmpty) {
      val ready = remaining.collect {
        case (n, ds) if ds.forall(d => !remaining.contains(d)) => n
      }.toSeq.sorted
      require(ready.nonEmpty,
        "schema reference cycle among: " +
          s"${remaining.keys.toSeq.sorted.mkString(", ")} — mutual " +
          "recursion across named types cannot be registered one-by-one")
      order ++= ready
      remaining = remaining -- ready
    }
    order.result()
  }

  /** Parse every schema in dependency order with ONE Avro parser —
    * earlier schemas' named types are visible to later ones, exactly
    * the reference's register-with-references flow. Returns the
    * parsed schemas keyed by catalog name; any structural error
    * (wrong field shapes, bad enum symbols, union rules) surfaces as
    * Avro's own SchemaParseException.
    */
  def parseAll(schemas: Map[String, String]): Map[String, Schema] = {
    val parser = new Schema.Parser()
    registrationOrder(schemas).map { name =>
      name -> parser.parse(schemas(name))
    }.toMap
  }
}
