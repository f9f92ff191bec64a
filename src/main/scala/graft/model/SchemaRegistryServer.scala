package graft.model

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process Confluent Schema Registry stub — the REST subset the
  * reference stack actually exercises (initialiser registration with
  * references at kafka_initialiser/app/schema_registry_manager.py:
  * 23-66, producer `use.latest.version` fetch + subject listing at
  * kafka_producer/app/handlers/kafka_producer.py:49-62, consumers
  * resolving wire-format ids), served over the JDK's built-in
  * httpserver on loopback so the register→fetch→encode flow is
  * testable with zero egress and no broker container:
  *
  *  - `POST /subjects/{subject}/versions` — register; body
  *    `{"schema": …, "schemaType": "AVRO", "references": […]}` →
  *    `{"id": n}`. Ids are GLOBAL and content-addressed (the
  *    Confluent contract): registering byte-identical schema text +
  *    references anywhere returns the existing id, and re-posting a
  *    schema already current under the subject adds no new version.
  *  - `GET /subjects` — all subject names.
  *  - `GET /subjects/{subject}/versions/latest` —
  *    `{subject, version, id, schema, references}` (what
  *    `use.latest.version: true` resolves against).
  *  - `GET /schemas/ids/{id}` — `{"schema": …}` (what a consumer
  *    resolves a wire-format frame's 4-byte id against).
  *  - `GET`/`PUT /config/{subject}` — per-subject compatibility
  *    mode (default BACKWARD, the registry default the reference
  *    runs under); registration of an incompatible evolution is
  *    REJECTED with HTTP 409 after checking [[SchemaCompat]]'s
  *    rules against the subject's prior versions (references
  *    resolved through the store).
  *  - `POST /compatibility/subjects/{subject}/versions/latest` —
  *    dry-run check, `{"is_compatible": bool}`.
  *
  * Errors use the registry's public shape:
  * `{"error_code": 40401|40403, "message": …}`.
  *
  * Loopback bind only — same rationale as
  * [[graft.streaming.MetricsHttpServer]].
  */
final class SchemaRegistryServer(port: Int = 0) extends AutoCloseable {

  private val mapper = new ObjectMapper

  /** (schemaJson, canonical references) → global id. */
  private val byContent = mutable.LinkedHashMap[(String, String), Int]()
  /** global id → (schemaJson, references JSON array text). */
  private val byId = mutable.LinkedHashMap[Int, (String, String)]()
  /** global id → parsed Avro schema (references resolved). */
  private val parsedById = mutable.LinkedHashMap[Int, org.apache.avro.Schema]()
  /** subject → versions, each (version, global id). */
  private val subjects = mutable.LinkedHashMap[String, Vector[(Int, Int)]]()
  /** subject → compatibility mode; absent = the registry default
    * (BACKWARD, the Confluent default the reference runs under). */
  private val configBySubject = mutable.LinkedHashMap[String, SchemaCompat.Mode]()

  private def compatOf(subject: String): SchemaCompat.Mode =
    configBySubject.getOrElse(subject, SchemaCompat.Backward)

  /** Incompatible-registration signal → HTTP 409 (the registry's
    * public behavior). */
  private final class IncompatibleSchema(msg: String)
    extends RuntimeException(msg)

  /** Parse a schema with its referenced types preloaded (references
    * must already be registered — the initialiser's dependency-order
    * contract).
    */
  private def parseResolved(schema: String, refsJson: String): org.apache.avro.Schema = {
    val parser = new org.apache.avro.Schema.Parser()
    val types = new java.util.HashMap[String, org.apache.avro.Schema]()
    mapper.readTree(refsJson).elements().asScala.foreach { r =>
      val depSubject = r.get("subject").asText
      val depVersion = r.get("version").asInt
      val depId = subjects.getOrElse(depSubject, Vector.empty)
        .collectFirst { case (v, i) if v == depVersion => i }
        .getOrElse(throw new IllegalArgumentException(
          s"unresolved reference: $depSubject v$depVersion"))
      val dep = parsedById(depId)
      types.put(dep.getFullName, dep)
    }
    parser.addTypes(types)
    parser.parse(schema)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def error(ex: HttpExchange, http: Int, code: Int, msg: String): Unit =
    respond(ex, http, s"""{"error_code":$code,"message":${mapper.writeValueAsString(msg)}}""")

  private def parseBody(body: String): (String, String) = {
    val node = mapper.readTree(body)
    val schema = Option(node.get("schema")).map(_.asText)
      .getOrElse(throw new IllegalArgumentException("missing schema"))
    val refs = Option(node.get("references"))
      .map(_.asInstanceOf[ArrayNode]).map(mapper.writeValueAsString)
      .getOrElse("[]")
    (schema, refs)
  }

  private def registerBody(subject: String, body: String): String =
    synchronized {
      val (schema, refs) = parseBody(body)
      val key = (schema, refs)
      val versions = subjects.getOrElse(subject, Vector.empty)
      val known = byContent.get(key)
      // Compatibility gate BEFORE any state changes (the registry's
      // 409 path): a brand-new schema under a subject with history
      // must pass the subject's mode against its prior versions.
      // Re-registering content the subject has already seen skips
      // the check (it passed when first accepted).
      if (known.isEmpty || !versions.exists(v => known.contains(v._2))) {
        val candidate = parseResolved(schema, refs)
        val priors = versions.map { case (_, i) => parsedById(i) }
        if (!SchemaCompat.check(compatOf(subject), candidate, priors))
          throw new IncompatibleSchema(
            s"Schema being registered is incompatible with an earlier schema for subject \"$subject\"")
      }
      val id = byContent.getOrElseUpdate(key, {
        val next = byId.size + 1
        byId(next) = key
        parsedById(next) = parseResolved(schema, refs)
        next
      })
      // Confluent semantics: re-POSTing content the subject has
      // ALREADY registered (any version, not only latest) returns
      // the existing id and appends nothing — appending would mint
      // a new version that bypassed the compatibility gate above
      // (e.g. re-registering v1 after a field-removing v2 under
      // BACKWARD would otherwise silently accept an incompatible
      // chain).
      if (!versions.exists(_._2 == id))
        subjects(subject) = versions :+ ((versions.size + 1, id))
      s"""{"id":$id}"""
    }

  private def compatBody(subject: String, body: String): String =
    synchronized {
      val (schema, refs) = parseBody(body)
      val versions = subjects.getOrElse(subject, Vector.empty)
      val ok =
        try {
          val candidate = parseResolved(schema, refs)
          SchemaCompat.check(compatOf(subject), candidate,
            versions.map { case (_, i) => parsedById(i) })
        } catch { case _: org.apache.avro.SchemaParseException => false }
      s"""{"is_compatible":$ok}"""
    }

  private def latestBody(subject: String): Option[String] = synchronized {
    subjects.get(subject).flatMap(_.lastOption).map { case (version, id) =>
      val (schema, refs) = byId(id)
      val o: ObjectNode = mapper.createObjectNode()
      o.put("subject", subject)
      o.put("version", version)
      o.put("id", id)
      o.put("schema", schema)
      o.set("references", mapper.readTree(refs))
      mapper.writeValueAsString(o)
    }
  }

  private val server: HttpServer = HttpServer.create(
    new InetSocketAddress(java.net.InetAddress.getByName("127.0.0.1"), port), 0)

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val path = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
      try (ex.getRequestMethod, path) match {
        case ("GET", List("subjects")) =>
          respond(ex, 200, synchronized {
            subjects.keys.map(mapper.writeValueAsString)
              .mkString("[", ",", "]")
          })
        case ("POST", List("subjects", subject, "versions")) =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          try respond(ex, 200, registerBody(subject, body))
          catch { case e: IncompatibleSchema =>
            error(ex, 409, 409, e.getMessage)
          }
        case ("POST", List("compatibility", "subjects", subject, "versions", "latest")) =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          respond(ex, 200, compatBody(subject, body))
        case ("GET", List("config", subject)) =>
          respond(ex, 200, synchronized {
            s"""{"compatibilityLevel":"${compatOf(subject).name}"}"""
          })
        case ("PUT", List("config", subject)) =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          val mode = SchemaCompat.modeOf(
            mapper.readTree(body).get("compatibility").asText)
          synchronized { configBySubject(subject) = mode }
          respond(ex, 200, s"""{"compatibility":"${mode.name}"}""")
        case ("GET", List("subjects", subject, "versions", "latest")) =>
          latestBody(subject) match {
            case Some(b) => respond(ex, 200, b)
            case None => error(ex, 404, 40401, s"Subject '$subject' not found.")
          }
        case ("GET", List("schemas", "ids", idStr)) =>
          synchronized(byId.get(idStr.toInt)) match {
            case Some((schema, _)) =>
              respond(ex, 200,
                s"""{"schema":${mapper.writeValueAsString(schema)}}""")
            case None => error(ex, 404, 40403, "Schema not found")
          }
        case (m, p) =>
          error(ex, 404, 40401, s"no route: $m /${p.mkString("/")}")
      } catch {
        case e: Throwable =>
          error(ex, 422, 42201, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  })
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort"

  /** Registered subject names, insertion-ordered (test readout). */
  def subjectNames: Seq[String] = synchronized(subjects.keys.toSeq)

  override def close(): Unit = server.stop(0)
}
