package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema compatibility policy, vendored semantics of
  * `/root/reference/src/main/java/io/confluent/connect/hdfs/schema/Compatibility.java:18-23`
  * with the version-comparison rules of `schema/SchemaUtils.java:38-61`:
  *  - NONE:     any schema inequality forces a change (rotate + adopt).
  *  - BACKWARD/FULL: a *newer* version replaces the current schema;
  *    older-versioned records are projected up.
  *  - FORWARD:  an *older* version replaces the current schema;
  *    newer-versioned records are projected down.
  * A missing version under any mode but NONE is an error
  * (`SchemaUtils.java:43-47`).
  */
sealed trait Compatibility
object Compatibility {
  case object None     extends Compatibility
  case object Backward extends Compatibility
  case object Forward  extends Compatibility
  case object Full     extends Compatibility

  def fromString(s: String): Compatibility = s.toUpperCase match {
    case "NONE" => None
    case "BACKWARD" => Backward
    case "FORWARD" => Forward
    case "FULL" => Full
    case other => throw new IllegalArgumentException(s"unknown compatibility: $other")
  }
}

/** A versioned schema, the unit the reference tracks per topic-partition
  * (Kafka Connect `Schema.version()`). */
final case class VersionedSchema(version: Int, schema: StructType)

object SchemaEvolution {

  /** Should the writer switch its current schema to the incoming one?
    * Port of `SchemaUtils.shouldChangeSchema` (`SchemaUtils.java:38-61`). */
  def shouldChangeSchema(incoming: VersionedSchema, current: Option[VersionedSchema],
                         compat: Compatibility): Boolean = current match {
    case scala.None => true
    case Some(cur) =>
      compat match {
        case Compatibility.None => incoming.schema != cur.schema
        case Compatibility.Backward | Compatibility.Full => incoming.version > cur.version
        case Compatibility.Forward => incoming.version < cur.version
      }
  }

  /** Raised when a record cannot be projected to the target schema —
    * the analog of the Connect `SchemaProjectorException` the reference
    * surfaces on incompatible evolution (`SchemaUtils.java:64-91`). */
  final class SchemaProjectionException(msg: String)
    extends IllegalArgumentException(msg)

  /** Projection list taking a frame of arbitrary (sub/super)schema onto
    * `target`: fields missing from the source are filled with `defaults`
    * (or typed nulls when the target field is nullable), extra source
    * fields are dropped, and every column is cast to the target type.
    * Port of the Connect `SchemaProjector` usage at
    * `SchemaUtils.java:64-91` / `TopicPartitionWriter.java:378-379`,
    * expressed as a plain Catalyst projection so it pushes through the
    * optimizer (column pruning still reaches the scan).
    *
    * A target field that is missing from the source, non-nullable, and
    * has no default throws [[SchemaProjectionException]] — matching the
    * reference's required-field-without-default failure instead of
    * silently emitting nulls.
    */
  def projectionTo(source: StructType, target: StructType,
                   defaults: Map[String, Any] = Map.empty,
                   caseSensitive: Boolean = false): Seq[Column] = {
    // match the analyzer's resolution mode: case-INsensitive by
    // default (a source column present as "UserId" must satisfy a
    // target field "userid" — a case-sensitive contains() would
    // null-fill a column whose data exists, or spuriously refuse a
    // non-nullable one), case-sensitive when the session analyzes
    // case-sensitively (spark.sql.caseSensitive=true — [[project]]
    // passes the conf through)
    def key(n: String): String = if (caseSensitive) n else n.toLowerCase
    // under insensitive lowering, two source names collapsing to one
    // key would make toMap keep an arbitrary winner — refuse loudly,
    // but only when the projection actually resolves the ambiguous
    // name (the analyzer raises AMBIGUOUS_REFERENCE on resolution, not
    // on the mere presence of colliding columns: {UserId, userid,
    // other} projected onto {other} is legal)
    val referenced = target.fields.iterator.map(f => key(f.name)).toSet
    val collisions = source.fieldNames.groupBy(key)
      .filter { case (k, ns) => ns.length > 1 && referenced.contains(k) }
    require(collisions.isEmpty,
      "source schema has columns that collide under the session's name " +
        s"resolution and are referenced by the target: " +
        collisions.values.map(_.mkString("/")).mkString(", "))
    val sourceByLower = source.fieldNames.map(n => key(n) -> n).toMap
    target.fields.toSeq.map { f =>
      val base: Column =
        if (sourceByLower.contains(key(f.name)))
          col(sourceByLower(key(f.name)))
        else defaults.get(f.name) match {
          case Some(v) => lit(v)
          case scala.None if f.nullable => lit(null)
          case scala.None =>
            throw new SchemaProjectionException(
              s"target field '${f.name}' is non-nullable, missing from the " +
                s"source schema, and has no default")
        }
      base.cast(f.dataType).as(f.name)
    }
  }

  def project(df: DataFrame, target: StructType,
              defaults: Map[String, Any] = Map.empty): DataFrame =
    df.select(projectionTo(df.schema, target, defaults,
      caseSensitive = df.sparkSession.sessionState.conf.caseSensitiveAnalysis): _*)
}
