package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.col
import graft.core.FlowFrame

/**
 * GetCouchbaseKey / PutCouchbaseKey — SURVEY §2.1/§2.2
 * (extensions/couchbase/processors/GetCouchbaseKey.cpp:32-110,
 * PutCouchbaseKey.cpp:34-80).
 *
 * The processor semantics — document-id resolution chain, put-to-attribute
 * mode, success/retry/failure routing by error class, and the
 * `couchbase.*` output attributes — are implemented fully and run
 * distributed (one client per partition, rows streamed through). The wire
 * client is the pluggable boundary: no Couchbase SDK ships in this
 * container, so [[InMemory]] (a real, thread-safe KV with CAS/sequence
 * bookkeeping) stands in where the reference binds couchbase-cxx-client
 * via its CouchbaseClusterService controller
 * (extensions/couchbase/controllerservices/CouchbaseClusterService.h).
 * A deployment supplies a `ClientFactory` wrapping the Java SDK and every
 * routing/attribute behavior here applies unchanged.
 */
object Couchbase {

  /** Error classes driving routing (CouchbaseClusterService.h:
    * CouchbaseErrorType — TEMPORARY → retry, FATAL → failure). */
  sealed trait ErrorType extends Serializable
  case object Temporary extends ErrorType
  case object Fatal extends ErrorType

  /** bucket.scope.collection coordinates; defaults mirror
    * couchbase::scope/collection::default_name. */
  final case class Coords(bucket: String, scope: String = "_default",
                          collection: String = "_default")

  final case class GetResult(value: Array[Byte], cas: Long, expiry: String,
                             bucketName: String)
  final case class UpsertResult(cas: Long, sequenceNumber: Long,
                                partitionUuid: Long, partitionId: Long,
                                bucketName: String)

  /** The wire boundary (CouchbaseClusterService get/upsert). */
  trait Client extends Serializable {
    def get(c: Coords, docId: String): Either[ErrorType, GetResult]
    def upsert(c: Coords, docId: String, value: Array[Byte],
               persistTo: String, replicateTo: String): Either[ErrorType, UpsertResult]
  }

  /** Factory so executors build their own client per partition (the
    * reference pools connections per processor instance). */
  type ClientFactory = () => Client

  /** JVM-wide store backing [[InMemory]] clients — partitions of a
    * local[n] session share one "cluster"; `namespace` isolates tests. */
  private object Store {
    val docs = TrieMap.empty[(String, String, String, String, String),
      (Array[Byte], Long)] // -> (value, cas)
    val casCounter = new AtomicLong(1)
    val seqCounter = new AtomicLong(1)
  }

  /** In-memory stand-in cluster: real CAS/sequence bookkeeping, optional
    * fault injection by doc-id predicate (for retry/failure tests). */
  final case class InMemory(namespace: String,
                            failWith: Map[String, ErrorType] = Map.empty)
      extends Client {
    private def key(c: Coords, id: String) =
      (namespace, c.bucket, c.scope, c.collection, id)
    def get(c: Coords, docId: String): Either[ErrorType, GetResult] =
      failWith.get(docId).map(Left(_)).getOrElse {
        Store.docs.get(key(c, docId)) match {
          case Some((v, cas)) => Right(GetResult(v, cas, "0", c.bucket))
          case None => Left(Fatal) // document_not_found is non-retryable
        }
      }
    def upsert(c: Coords, docId: String, value: Array[Byte],
               persistTo: String, replicateTo: String): Either[ErrorType, UpsertResult] =
      failWith.get(docId).map(Left(_)).getOrElse {
        val cas = Store.casCounter.getAndIncrement()
        Store.docs.put(key(c, docId), (value, cas))
        Right(UpsertResult(cas, Store.seqCounter.getAndIncrement(),
          partitionUuid = c.bucket.hashCode.toLong & 0xffffffffL,
          partitionId = (docId.hashCode & 0x3ff).toLong, // vBucket-style id
          bucketName = c.bucket))
      }
  }

  /** Row-encoder-safe input: relationship/content typed string even when
    * the upstream frame carries a VOID null relationship. */
  private def normalized(df: DataFrame): DataFrame = df
    .withColumn(FlowFrame.Relationship,
      col(FlowFrame.Relationship).cast("string"))
    .withColumn(FlowFrame.Content, col(FlowFrame.Content).cast("string"))

  /**
   * GetCouchbaseKey (GetCouchbaseKey.cpp:32-110). Per input FlowFile:
   *  - doc id = `Document Id` property (EL against attributes via
   *    `docIdAttr`) when set, else the FlowFile CONTENT (the reference
   *    buffers content as the id, GetCouchbaseKey.cpp:53-56); empty →
   *    failure.
   *  - hit: value becomes the content — or lands in attribute
   *    `putValueToAttribute` with content untouched — plus
   *    couchbase.bucket/doc.id/doc.cas/doc.expiry attributes, routed
   *    success.
   *  - TEMPORARY error → retry (row unchanged), FATAL → failure.
   */
  def getKey(df: DataFrame, factory: ClientFactory, coords: Coords,
             docIdAttr: Option[String] = None,
             putValueToAttribute: Option[String] = None,
             docIdLiteral: Option[String] = None): DataFrame = {
    val in = normalized(df)
    val schema = in.schema
    val iAttrs = schema.fieldIndex(FlowFrame.Attributes)
    val iContent = schema.fieldIndex(FlowFrame.Content)
    val iRel = schema.fieldIndex(FlowFrame.Relationship)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    in.mapPartitions { rows =>
      val client = factory()
      rows.map { r =>
        val attrs = r.getMap[String, String](iAttrs)
        val content = Option(r.getString(iContent)).getOrElse("")
        // Option(_) guards null-VALUED attributes (a composite EL that
        // evaluated to null) — absent and null both fall through
        val docId = docIdLiteral
          .orElse(docIdAttr.flatMap(a => attrs.get(a)).flatMap(Option(_)))
          .getOrElse(content)
        def withRel(rel: String, newAttrs: Map[String, String] = attrs.toMap,
                    newContent: String = content): Row = {
          val vals = r.toSeq.toArray
          vals(iAttrs) = newAttrs
          vals(iContent) = newContent
          vals(iRel) = rel
          Row.fromSeq(vals.toIndexedSeq)
        }
        if (docId.isEmpty) withRel("failure")
        else client.get(coords, docId) match {
          case Right(res) =>
            val fetched = new String(res.value, "UTF-8")
            val base = attrs.toMap ++ Map(
              "couchbase.bucket" -> res.bucketName,
              "couchbase.doc.id" -> docId,
              "couchbase.doc.cas" -> res.cas.toString,
              "couchbase.doc.expiry" -> res.expiry)
            putValueToAttribute match {
              case Some(a) => withRel("success", base + (a -> fetched))
              case None => withRel("success", base, fetched)
            }
          case Left(Temporary) => withRel("retry")
          case Left(Fatal) => withRel("failure")
        }
      }
    }
  }

  /**
   * PutCouchbaseKey (PutCouchbaseKey.cpp:34-80). Doc id resolution chain:
   * `Document Id` property → FlowFile uuid → generated (the uuid column is
   * always present here, so the generated branch never triggers). Content
   * upserts as the value; success rows gain couchbase.bucket/doc.id/
   * doc.cas/doc.sequence.number/partition.uuid/partition.id; TEMPORARY →
   * retry, FATAL → failure (content always unchanged).
   */
  def putKey(df: DataFrame, factory: ClientFactory, coords: Coords,
             docIdAttr: Option[String] = None,
             persistTo: String = "NONE", replicateTo: String = "NONE",
             docIdLiteral: Option[String] = None): DataFrame = {
    val in = normalized(df)
    val schema = in.schema
    val iUuid = schema.fieldIndex(FlowFrame.Uuid)
    val iAttrs = schema.fieldIndex(FlowFrame.Attributes)
    val iContent = schema.fieldIndex(FlowFrame.Content)
    val iRel = schema.fieldIndex(FlowFrame.Relationship)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    in.mapPartitions { rows =>
      val client = factory()
      rows.map { r =>
        val attrs = r.getMap[String, String](iAttrs)
        val content = Option(r.getString(iContent)).getOrElse("")
        val docId = docIdLiteral
          .orElse(docIdAttr.flatMap(a => attrs.get(a)).flatMap(Option(_)))
          .getOrElse(r.getString(iUuid))
        def withRel(rel: String, newAttrs: Map[String, String] = attrs.toMap): Row = {
          val vals = r.toSeq.toArray
          vals(iAttrs) = newAttrs
          vals(iRel) = rel
          Row.fromSeq(vals.toIndexedSeq)
        }
        client.upsert(coords, docId, content.getBytes("UTF-8"),
            persistTo, replicateTo) match {
          case Right(res) => withRel("success", attrs.toMap ++ Map(
            "couchbase.bucket" -> res.bucketName,
            "couchbase.doc.id" -> docId,
            "couchbase.doc.cas" -> res.cas.toString,
            "couchbase.doc.sequence.number" -> res.sequenceNumber.toString,
            "couchbase.partition.uuid" -> res.partitionUuid.toString,
            "couchbase.partition.id" -> res.partitionId.toString))
          case Left(Temporary) => withRel("retry")
          case Left(Fatal) => withRel("failure")
        }
      }
    }
  }
}
