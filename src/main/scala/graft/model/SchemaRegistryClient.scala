package graft.model

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Minimal Confluent Schema Registry REST client — the Scala
  * counterpart of the reference's registry flow, covering exactly
  * what its services call: subject registration with references
  * (schema_registry_manager.py:23-66), `get_subjects` +
  * latest-version fetch for `use.latest.version: true` producers
  * (kafka_producer.py:49-62), and id resolution for wire-format
  * consumers. Driver-side setup code (the [[SchemaCatalog]] / DID
  * bootstrap convention) — NOT a Spark operator; executors never
  * talk to the registry, they get broadcast schema strings.
  *
  * JDK `java.net.http` — no dependency; works against any
  * Confluent-API registry, certified in-process against
  * [[SchemaRegistryServer]] (`SchemaRegistrySpec` pins wire-format
  * id agreement end-to-end).
  */
final class SchemaRegistryClient(baseUrl: String,
                                 timeout: Duration = Duration.ofSeconds(10)) {

  import SchemaRegistryClient._

  private val mapper = new ObjectMapper
  private val http = HttpClient.newBuilder().connectTimeout(timeout).build()

  private def get(path: String): String = send(
    HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      .timeout(timeout).GET().build())

  private def post(path: String, body: String): String = send(
    HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      .timeout(timeout)
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build())

  private def send(req: HttpRequest): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new SchemaRegistryException(resp.statusCode(), resp.body())
    resp.body()
  }

  /** Register `schemaJson` under `subject` (AVRO, with references);
    * returns the registry's global schema id. Content-identical
    * re-registration returns the existing id.
    */
  def register(subject: String, schemaJson: String,
               references: Seq[SchemaRef] = Nil): Int = {
    val o: ObjectNode = mapper.createObjectNode()
    o.put("schema", schemaJson)
    o.put("schemaType", "AVRO")
    val arr: ArrayNode = mapper.createArrayNode()
    references.foreach { r =>
      val ro = mapper.createObjectNode()
      ro.put("name", r.name); ro.put("subject", r.subject)
      ro.put("version", r.version)
      arr.add(ro)
    }
    o.set("references", arr)
    mapper.readTree(post(s"/subjects/$subject/versions",
      mapper.writeValueAsString(o))).get("id").asInt
  }

  /** All subject names (the producer's startup `get_subjects`). */
  def subjects(): Seq[String] =
    mapper.readTree(get("/subjects")).elements().asScala
      .map(_.asText).toSeq

  /** Latest version under `subject` — what a
    * `use.latest.version: true` serializer resolves before framing
    * messages with the returned id.
    */
  def latestVersion(subject: String): SchemaVersion = {
    val n = mapper.readTree(get(s"/subjects/$subject/versions/latest"))
    SchemaVersion(
      subject = n.get("subject").asText,
      version = n.get("version").asInt,
      id = n.get("id").asInt,
      schema = n.get("schema").asText,
      references = Option(n.get("references")).toSeq
        .flatMap(_.elements().asScala)
        .map(r => SchemaRef(r.get("name").asText, r.get("subject").asText,
          r.get("version").asInt)))
  }

  /** Schema text by global id — what a consumer resolves a
    * wire-format frame's 4-byte id against.
    */
  def schemaById(id: Int): String =
    mapper.readTree(get(s"/schemas/ids/$id")).get("schema").asText

  /** The subject's compatibility mode (registry default when never
    * set). */
  def getCompatibility(subject: String): String =
    mapper.readTree(get(s"/config/$subject"))
      .get("compatibilityLevel").asText

  /** Set the subject's compatibility mode (BACKWARD / FORWARD /
    * FULL / *_TRANSITIVE / NONE). */
  def setCompatibility(subject: String, mode: String): Unit = {
    val resp = send(HttpRequest.newBuilder(
        URI.create(s"$baseUrl/config/$subject"))
      .timeout(timeout)
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .method("PUT", HttpRequest.BodyPublishers.ofString(
        s"""{"compatibility":${mapper.writeValueAsString(mode)}}""",
        StandardCharsets.UTF_8))
      .build())
    require(mapper.readTree(resp).get("compatibility") != null)
  }

  /** Dry-run: would `schemaJson` be accepted as the subject's next
    * version under its current mode? Never registers anything.
    */
  def testCompatibility(subject: String, schemaJson: String,
                        references: Seq[SchemaRef] = Nil): Boolean = {
    val o: ObjectNode = mapper.createObjectNode()
    o.put("schema", schemaJson)
    o.put("schemaType", "AVRO")
    val arr: ArrayNode = mapper.createArrayNode()
    references.foreach { r =>
      val ro = mapper.createObjectNode()
      ro.put("name", r.name); ro.put("subject", r.subject)
      ro.put("version", r.version)
      arr.add(ro)
    }
    o.set("references", arr)
    mapper.readTree(post(
      s"/compatibility/subjects/$subject/versions/latest",
      mapper.writeValueAsString(o))).get("is_compatible").asBoolean
  }

  /** The initialiser flow end-to-end: register every schema of a
    * (name → schema JSON) catalog in [[SchemaCatalog]]'s
    * deterministic dependency order, each under subject
    * `{name}-value` (the reference's TopicNameStrategy default) with
    * references pointing at its dependencies' just-registered
    * subject versions. Returns name → (subject, version, id).
    */
  def registerCatalog(schemas: Map[String, String])
      : Map[String, (String, Int, Int)] = {
    val done = scala.collection.mutable.LinkedHashMap[String, (String, Int, Int)]()
    for (name <- SchemaCatalog.registrationOrder(schemas)) {
      val subject = s"$name-value"
      val refs = SchemaCatalog.references(schemas(name))
        .filter(_ != name).toSeq.sorted.map { dep =>
          val (depSubject, depVersion, _) = done(dep)
          SchemaRef(dep, depSubject, depVersion)
        }
      val id = register(subject, schemas(name), refs)
      val v = latestVersion(subject)
      done(name) = (subject, v.version, id)
    }
    done.toMap
  }
}

object SchemaRegistryClient {
  /** A registered schema reference: named type → subject@version. */
  final case class SchemaRef(name: String, subject: String, version: Int)

  /** One subject version as the registry reports it. */
  final case class SchemaVersion(subject: String, version: Int, id: Int,
                                 schema: String, references: Seq[SchemaRef])

  /** Non-2xx registry response, body preserved (carries the
    * registry's `error_code`).
    */
  final class SchemaRegistryException(val status: Int, body: String)
    extends RuntimeException(s"registry HTTP $status: $body")
}
