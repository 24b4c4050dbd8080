package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.types.EngineSchema

/** Confluent Schema Registry client + the reference's accept-new-version
  * flow (glassflow-api/internal/schema_registry/schema_registry.go:45-101;
  * internal/schema_v2/schema.go:64-120):
  *
  *  - fetch schema by wire-format id (`GET /schemas/ids/{id}`), JSON-schema
  *    type only
  *  - JSON-schema `properties` (+`additionalProperties`) flatten to dotted
  *    field names; nested objects recurse with a `parent.` prefix
  *    (schema_registry.go:89-101)
  *  - an unknown version is accepted iff it is BACKWARD compatible with the
  *    latest accepted version: every previous field still present with the
  *    same normalized engine type (schema_v2/validate.go:35-62)
  *
  * HTTP is an injectable seam (`url => body`) — pure-testable without a
  * registry, and the default impl is a plain java.net.http GET with
  * optional basic auth.
  */
object SchemaRegistry {

  private val mapper = new ObjectMapper()

  final case class Config(
    url: String,
    apiKey: Option[String] = None,
    apiSecret: Option[String] = None)

  /** url → response body (Left = transport/HTTP error). */
  type Http = String => Either[String, String]

  def defaultHttp(cfg: Config): Http = { url =>
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      (cfg.apiKey, cfg.apiSecret) match {
        case (Some(k), Some(s)) =>
          val cred = java.util.Base64.getEncoder
            .encodeToString(s"$k:$s".getBytes("UTF-8"))
          b.header("Authorization", s"Basic $cred")
        case _ => ()
      }
      val resp = client.send(b.GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 200) Right(resp.body())
      else if (resp.statusCode() == 404) Left(s"schema not found: $url")
      else Left(s"registry returned ${resp.statusCode()} for $url")
    } catch { case e: Exception => Left(s"registry request failed: ${e.getMessage}") }
  }

  final class Client(cfg: Config, http: Http) {
    def fetchSchema(id: Long): Either[String, Seq[(String, String)]] =
      http(s"${cfg.url.stripSuffix("/")}/schemas/ids/$id")
        .flatMap(parseRegistryResponse)
  }

  def client(cfg: Config): Client = new Client(cfg, defaultHttp(cfg))
  def client(cfg: Config, http: Http): Client = new Client(cfg, http)

  /** Registry envelope `{schema: "<json-schema>", schemaType: "JSON"}`;
    * absent schemaType means AVRO (Confluent default) and is rejected —
    * the reference supports JSON schemas only (schema_registry.go:45-47). */
  def parseRegistryResponse(body: String): Either[String, Seq[(String, String)]] = {
    val node =
      try mapper.readTree(body)
      catch { case e: Exception => return Left(s"bad registry response: ${e.getMessage}") }
    val sType = Option(node.get("schemaType")).map(_.asText()).getOrElse("AVRO")
    if (sType != "JSON") Left(s"unexpected schema format: expected JSON, got $sType")
    else Option(node.get("schema")).map(_.asText()) match {
      case None => Left("registry response has no schema")
      case Some(s) => parseJsonSchema(s)
    }
  }

  /** JSON-schema object → flattened (dotted-name, engine-type) fields. */
  def parseJsonSchema(schema: String): Either[String, Seq[(String, String)]] = {
    val root =
      try mapper.readTree(schema)
      catch { case e: Exception => return Left(s"invalid json schema: ${e.getMessage}") }
    if (root.path("type").asText() != "object") Left("invalid schema: type must be object")
    else {
      val props = Option(root.get("properties"))
      val addl = Option(root.get("additionalProperties")).filter(_.isObject)
      if (props.isEmpty && addl.isEmpty) Left("invalid schema: no properties")
      else Right(props.toSeq.flatMap(extractFields) ++ addl.toSeq.flatMap(extractFields))
    }
  }

  private def extractFields(properties: JsonNode): Seq[(String, String)] =
    properties.fields().asScala.toSeq.flatMap { e =>
      val (key, value) = (e.getKey, e.getValue)
      typeOf(value) match {
        case None => Nil // untyped property: skipped (extractFieldTypes does the same)
        case Some("object") =>
          parseJsonSchema(value.toString) match {
            case Right(nested) => nested.map { case (n, t) => s"$key.$n" -> t }
            case Left(_) => Nil // unparseable nested object: skipped
          }
        case Some(t) => Seq(key -> t)
      }
    }

  /** `"type": "string"` or `"type": ["string","null"]` → the non-null type. */
  private def typeOf(value: JsonNode): Option[String] = {
    val t = value.get("type")
    if (t == null) None
    else if (t.isArray) t.elements().asScala.map(_.asText()).find(_ != "null")
    else Some(t.asText())
  }

  /** Per-source accepted-version store with the backward-compat accept rule
    * (schema.go validateAndSaveNewSchemaVersion). Thread-safe — version
    * resolution happens on the driver during batch prep, potentially from
    * several concurrent pipelines. */
  final class VersionStore(client: Client) {
    private val versions = TrieMap[Long, Seq[(String, String)]]()
    @volatile private var latest: Option[(Long, Seq[(String, String)])] = None

    /** Seed the declared (pipeline-config) schema as the initial version. */
    def register(id: Long, fields: Seq[(String, String)]): Unit = {
      versions.put(id, fields)
      latest = Some((id, fields))
    }

    def knownVersions: Set[Long] = versions.keySet.toSet

    /** Resolve a wire-format schema id: known → cached fields; unknown →
      * fetch from the registry and accept iff backward compatible with the
      * latest accepted version. */
    def accept(id: Long): Either[String, Seq[(String, String)]] =
      versions.get(id) match {
        case Some(fields) => Right(fields)
        case None => client.fetchSchema(id).flatMap { fields =>
          if (fields.isEmpty) Left(s"schema $id has no fields")
          else latest match {
            case Some((latestId, prev)) if !EngineSchema.isBackwardCompatible(prev, fields) =>
              Left(s"schema $id is not backward compatible with accepted version $latestId")
            case _ =>
              versions.put(id, fields)
              latest = Some((id, fields))
              Right(fields)
          }
        }
      }
  }
}
