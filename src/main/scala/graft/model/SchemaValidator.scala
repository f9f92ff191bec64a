package graft.model

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Hand-rolled Avro schema validation — the initialiser's
  * pre-registration lint (kafka_initialiser/app/avro_schema_validator.py:17-180),
  * which checks schema JSON BEFORE the Avro parser sees it so a
  * malformed file fails with a per-problem report instead of the
  * parser's first-error-only exception. Checks mirrored from the
  * reference: required type/name, identifier-shaped names and
  * dot-separated namespaces, record field presence/uniqueness/typed,
  * enum symbols non-empty/unique/identifier-shaped, fixed size a
  * non-negative integer, unions with ≥ 2 branches, array `items` /
  * map `values` presence — each recursed through nested complex
  * types; unknown string type references are WARNINGS (they may
  * resolve against the registry), everything else an error.
  *
  * Two spec-level checks the reference omits (its parser would still
  * reject them at registration): a union branch may not itself be a
  * union, and union branches must be distinct by type/name —
  * included because this validator fronts OUR in-repo registration
  * ([[SchemaCatalog.parseAll]]) where Avro's parser is the only
  * other line of defense.
  */
object SchemaValidator {

  final case class Result(errors: Seq[String], warnings: Seq[String]) {
    def ok: Boolean = errors.isEmpty
  }

  final class SchemaValidationException(msg: String)
    extends IllegalArgumentException(msg)

  private val mapper = new ObjectMapper

  private val Primitives = Set(
    "null", "boolean", "int", "long", "float", "double", "bytes", "string")
  private val Complex = Set("record", "enum", "fixed", "array", "map")

  /** Avro identifier: [A-Za-z_][A-Za-z0-9_]* (the spec rule; the
    * reference's looser isalnum variant admits dashes, which Avro's
    * parser then rejects — spec-correct here).
    */
  private def validName(n: String): Boolean =
    n.nonEmpty && (n.head.isLetter || n.head == '_') &&
      n.forall(c => c.isLetterOrDigit || c == '_')

  private def validNamespace(ns: String): Boolean =
    ns.split("\\.", -1).forall(validName)

  /** Validate a schema JSON string. Never throws on bad input —
    * unparseable JSON is itself a reported error.
    */
  def validate(schemaJson: String, where: String = "schema"): Result = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]

    def checkNamed(n: JsonNode, ctx: String): Unit = {
      if (!n.has("type")) errors += s"$ctx: missing required 'type'"
      if (!n.has("name")) errors += s"$ctx: missing required 'name'"
      val name = Option(n.get("name")).map(_.asText("")).getOrElse("")
      if (name.nonEmpty && !validName(name))
        errors += s"$ctx: invalid name '$name'"
      Option(n.get("namespace")).map(_.asText("")).filter(_.nonEmpty)
        .foreach { ns =>
          if (!validNamespace(ns)) errors += s"$ctx: invalid namespace '$ns'"
        }
    }

    def checkType(t: JsonNode, ctx: String): Unit =
      if (t == null) errors += s"$ctx: missing type"
      else if (t.isTextual) {
        val s = t.asText()
        if (!Primitives(s) && !validName(s) && !validNamespace(s))
          warnings += s"$ctx: potentially invalid type reference '$s'"
      } else if (t.isArray) { // union
        if (t.size() < 2) errors += s"$ctx: union must have >= 2 types"
        val seen = scala.collection.mutable.Set[String]()
        t.elements().asScala.foreach { b =>
          if (b.isArray) errors += s"$ctx: union branch may not be a union"
          else {
            val key =
              if (b.isTextual) b.asText()
              else Option(b.get("type")).map(_.asText()).getOrElse("?") match {
                case c @ ("record" | "enum" | "fixed") =>
                  c + ":" + Option(b.get("name")).map(_.asText()).getOrElse("")
                case other => other
              }
            if (!seen.add(key))
              errors += s"$ctx: duplicate union branch '$key'"
            checkType(b, s"$ctx union")
          }
        }
      } else if (t.isObject) {
        Option(t.get("type")).map(_.asText()) match {
          case Some("array") =>
            if (!t.has("items")) errors += s"$ctx: array missing 'items'"
            else checkType(t.get("items"), s"$ctx array items")
          case Some("map") =>
            if (!t.has("values")) errors += s"$ctx: map missing 'values'"
            else checkType(t.get("values"), s"$ctx map values")
          case Some(c) if Complex(c) => checkSchema(t, s"$ctx $c")
          case Some(p) if Primitives(p) => ()
          case Some(other) =>
            warnings += s"$ctx: potentially invalid type '$other'"
          case None => errors += s"$ctx: inline type missing 'type'"
        }
      } else errors += s"$ctx: type must be a string, array, or object"

    def checkSchema(n: JsonNode, ctx: String): Unit = {
      if (!n.isObject) { errors += s"$ctx: schema must be a JSON object"; return }
      checkNamed(n, ctx)
      Option(n.get("type")).map(_.asText()).getOrElse("") match {
        case "record" =>
          val fields = n.get("fields")
          if (fields == null || !fields.isArray)
            errors += s"$ctx: record 'fields' must be an array"
          else {
            val seen = scala.collection.mutable.Set[String]()
            fields.elements().asScala.zipWithIndex.foreach { case (f, i) =>
              if (!f.isObject) errors += s"$ctx: field $i must be an object"
              else {
                val fn = Option(f.get("name")).map(_.asText("")).getOrElse("")
                if (fn.isEmpty) errors += s"$ctx: field $i missing 'name'"
                else {
                  if (!seen.add(fn)) errors += s"$ctx: duplicate field '$fn'"
                  if (!f.has("type"))
                    errors += s"$ctx: field '$fn' missing 'type'"
                  else checkType(f.get("type"), s"$ctx field '$fn'")
                }
              }
            }
          }
        case "enum" =>
          val symbols = n.get("symbols")
          if (symbols == null || !symbols.isArray)
            errors += s"$ctx: enum 'symbols' must be an array"
          else if (symbols.size() == 0)
            errors += s"$ctx: enum must have at least one symbol"
          else {
            val seen = scala.collection.mutable.Set[String]()
            symbols.elements().asScala.foreach { s =>
              val sym = s.asText("")
              if (!s.isTextual) errors += s"$ctx: enum symbol must be a string"
              else {
                if (!seen.add(sym)) errors += s"$ctx: duplicate symbol '$sym'"
                if (!validName(sym)) errors += s"$ctx: invalid symbol '$sym'"
              }
            }
          }
        case "fixed" =>
          val size = n.get("size")
          if (size == null) errors += s"$ctx: fixed missing 'size'"
          else if (!size.isIntegralNumber || size.asLong() < 0)
            errors += s"$ctx: fixed 'size' must be a non-negative integer"
        case _ => ()
      }
    }

    try checkSchema(mapper.readTree(schemaJson), where)
    catch {
      case e: Exception =>
        errors += s"$where: unparseable schema JSON: ${e.getMessage}"
    }
    Result(errors.result(), warnings.result())
  }

  /** The initialiser's fail-fast form: throw with the full
    * per-problem report when any error was found.
    */
  def validateOrThrow(schemaJson: String, where: String = "schema"): Unit = {
    val r = validate(schemaJson, where)
    if (!r.ok)
      throw new SchemaValidationException(
        s"Schema validation failed for $where:\n" +
          (r.errors ++ r.warnings.map("warning: " + _)).mkString("\n"))
  }
}
