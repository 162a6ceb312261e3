package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single Message Transforms — the Kafka Connect runtime's
  * `transforms=` chain applied to every record BEFORE the sink sees
  * it. A reference deployment's SMT configs
  * (`transforms=route,mask` + `transforms.route.type=...RegexRouter`)
  * are part of what a switching user carries over, so the classic
  * roster is re-expressed here as per-batch DataFrame transforms:
  * field edits are pure projections (codegen'd, zero shuffle), topic
  * routers rewrite the `topic` column and compose with the
  * multi-topic demux plane — routing IS the directory in this engine,
  * exactly as record.topic() is in Connect.
  *
  * Chain semantics match Connect: transforms apply in the declared
  * alias order; a router mid-chain re-routes the record for every
  * transform after it. Determinism contract: every transform here is
  * a pure function of the record (TimestampRouter reads RECORD time,
  * never wallclock), so replayed batches re-transform identically —
  * the commit protocol's requirement.
  *
  * The stream envelope is reserved: no transform may touch `part` or
  * `off` (offset identity), and only routers may touch `topic`.
  */
sealed trait Smt {
  def alias: String
  /** Topic-rewriting transforms compose only with the multi-topic
    * plane (a single-topic stream has no `topic` column to rewrite). */
  def routesTopic: Boolean
  def apply(df: DataFrame): DataFrame
}

object Smt {

  /** Roster of supported `transforms.<alias>.type` values (Connect's
    * classic built-ins; the unqualified class names). */
  val Types: Seq[String] =
    Seq("InsertField", "MaskField", "RegexRouter", "ReplaceField",
      "TimestampRouter")

  private val Reserved = Set("part", "off", "topic")

  /** Connect's `InsertField` with a static field: adds a constant
    * string column. */
  final case class InsertField(alias: String, field: String, value: String)
      extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame = df.withColumn(field, lit(value))
  }

  /** Connect's `ReplaceField`: drop `exclude` fields, then apply
    * `renames` (from:to pairs). */
  final case class ReplaceField(alias: String, renames: Seq[(String, String)],
                                exclude: Seq[String]) extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame = {
      val dropped = if (exclude.isEmpty) df else df.drop(exclude: _*)
      renames.foldLeft(dropped) { case (d, (from, to)) =>
        d.withColumnRenamed(from, to)
      }
    }
  }

  /** Connect's `MaskField`: null out the listed fields (type
    * preserved), or substitute a literal replacement. */
  final case class MaskField(alias: String, fields: Seq[String],
                             replacement: Option[String]) extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame =
      fields.foldLeft(df) { (d, f) =>
        require(d.columns.contains(f),
          s"transforms.$alias (MaskField): no column '$f' in the stream")
        val dt = d.schema(f).dataType
        val masked: Column = replacement match {
          case Some(v) => lit(v).cast(dt)
          case scala.None => lit(null).cast(dt)
        }
        d.withColumn(f, masked)
      }
  }

  /** Connect's `RegexRouter`: when the WHOLE topic matches `regex`,
    * rewrite it via `replacement` (capture groups as `$1`...);
    * non-matching topics pass through — Connect's
    * `matcher.matches()` + `replaceFirst` semantics. */
  final case class RegexRouter(alias: String, regex: String,
                               replacement: String) extends Smt {
    val routesTopic = true
    private def anchored = s"^(?:$regex)$$"
    def apply(df: DataFrame): DataFrame =
      df.withColumn("topic",
        when(col("topic").rlike(anchored),
          regexp_replace(col("topic"), anchored, replacement))
          .otherwise(col("topic")))
  }

  /** Connect's `TimestampRouter`: topic = `topic.format` with
    * `$${topic}` and `$${timestamp}` substituted, the timestamp
    * rendered by `timestamp.format` from RECORD time (`tsField` — the
    * config's `timestamp.field`), so replays route identically. */
  final case class TimestampRouter(alias: String, topicFormat: String,
                                   tsFormat: String, tsField: String)
      extends Smt {
    val routesTopic = true
    def apply(df: DataFrame): DataFrame = {
      require(df.columns.contains(tsField),
        s"transforms.$alias (TimestampRouter): no record-time column " +
          s"'$tsField' in the stream")
      val token = "(\\$\\{topic\\}|\\$\\{timestamp\\})".r
      val parts = scala.collection.mutable.ListBuffer.empty[Column]
      var at = 0
      token.findAllMatchIn(topicFormat).foreach { m =>
        if (m.start > at) parts += lit(topicFormat.substring(at, m.start))
        parts += (if (m.matched == "${topic}") col("topic")
                  else date_format(col(tsField), tsFormat))
        at = m.end
      }
      if (at < topicFormat.length) parts += lit(topicFormat.substring(at))
      df.withColumn("topic", concat(parts.toSeq: _*))
    }
  }

  /** Parse + validate the `transforms` key family from raw props:
    * Left(errors) or Right(chain in declared order). `tsField` feeds
    * TimestampRouter. Validates alias declarations, types, per-type
    * required/known params, and the reserved stream envelope. */
  def parse(props: Map[String, String],
            tsField: String): Either[Seq[String], Seq[Smt]] = {
    val declared = props.getOrElse("transforms", "").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
    val errors = Seq.newBuilder[String]
    if (declared.distinct.size != declared.size)
      errors += s"transforms declares duplicate aliases: " +
        declared.diff(declared.distinct).distinct.mkString(", ")
    val prefix = "transforms."
    val smtKeys = props.keySet.filter(_.startsWith(prefix))
    // every transforms.<alias>.<param> must belong to a declared alias
    val byAlias = smtKeys.groupBy { k =>
      k.stripPrefix(prefix).split("\\.", 2)(0)
    }
    (byAlias.keySet -- declared).toSeq.sorted.foreach { a =>
      errors += s"transforms.$a.* configured but '$a' is not declared " +
        s"in transforms (${if (declared.isEmpty) "empty" else declared.mkString(", ")})"
    }
    val knownParams: Map[String, Set[String]] = Map(
      "InsertField" -> Set("static.field", "static.value"),
      "ReplaceField" -> Set("renames", "exclude"),
      "MaskField" -> Set("fields", "replacement"),
      "RegexRouter" -> Set("regex", "replacement"),
      "TimestampRouter" -> Set("topic.format", "timestamp.format"))
    def p(alias: String, param: String): Option[String] =
      props.get(s"$prefix$alias.$param").map(_.trim).filter(_.nonEmpty)
    def reservedIn(alias: String, what: String, names: Seq[String]): Unit =
      names.filter(Reserved).foreach { n =>
        errors += s"transforms.$alias: $what must not touch the stream " +
          s"envelope column '$n' (part/off are offset identity; only " +
          "routers rewrite topic)"
      }
    val chain = declared.flatMap { alias =>
      p(alias, "type") match {
        case scala.None =>
          errors += s"transforms.$alias.type is required (one of " +
            s"${Types.mkString(", ")})"
          scala.None
        case Some(t) if !Types.contains(t) =>
          errors += s"transforms.$alias.type '$t' is unknown; valid " +
            s"values are ${Types.mkString(", ")}"
          scala.None
        case Some(t) =>
          val extra = byAlias.getOrElse(alias, Set.empty)
            .map(_.stripPrefix(s"$prefix$alias."))
            .filterNot(param => param == "type" || knownParams(t)(param))
          extra.toSeq.sorted.foreach { param =>
            errors += s"transforms.$alias.$param is not a $t parameter " +
              s"(known: ${knownParams(t).toSeq.sorted.mkString(", ")})"
          }
          t match {
            case "InsertField" =>
              (p(alias, "static.field"), p(alias, "static.value")) match {
                case (Some(f), Some(v)) =>
                  reservedIn(alias, "static.field", Seq(f))
                  Some(InsertField(alias, f, v))
                case _ =>
                  errors += s"transforms.$alias (InsertField) requires " +
                    "static.field and static.value"
                  scala.None
              }
            case "ReplaceField" =>
              val renames = p(alias, "renames").toSeq
                .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
                .map { r =>
                  r.split(":") match {
                    case Array(from, to)
                        if from.trim.nonEmpty && to.trim.nonEmpty =>
                      Some(from.trim -> to.trim)
                    case _ =>
                      errors += s"transforms.$alias: rename '$r' must be " +
                        "from:to"
                      scala.None
                  }
                }.flatten
              val exclude = p(alias, "exclude").toSeq
                .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
              if (renames.isEmpty && exclude.isEmpty) {
                errors += s"transforms.$alias (ReplaceField) requires " +
                  "renames and/or exclude"
                scala.None
              } else {
                reservedIn(alias, "renames",
                  renames.flatMap(r => Seq(r._1, r._2)))
                reservedIn(alias, "exclude", exclude)
                Some(ReplaceField(alias, renames, exclude))
              }
            case "MaskField" =>
              p(alias, "fields") match {
                case Some(fs) =>
                  val fields = fs.split(",").map(_.trim).filter(_.nonEmpty)
                    .toSeq
                  reservedIn(alias, "fields", fields)
                  Some(MaskField(alias, fields, p(alias, "replacement")))
                case scala.None =>
                  errors += s"transforms.$alias (MaskField) requires fields"
                  scala.None
              }
            case "RegexRouter" =>
              (p(alias, "regex"), p(alias, "replacement")) match {
                case (Some(r), Some(rep)) =>
                  try { java.util.regex.Pattern.compile(r) } catch {
                    case e: Exception =>
                      errors += s"transforms.$alias: invalid regex '$r' " +
                        s"(${e.getMessage.linesIterator.next()})"
                  }
                  Some(RegexRouter(alias, r, rep))
                case _ =>
                  errors += s"transforms.$alias (RegexRouter) requires " +
                    "regex and replacement"
                  scala.None
              }
            case "TimestampRouter" =>
              (p(alias, "topic.format"), p(alias, "timestamp.format")) match {
                case (Some(f), Some(tf)) =>
                  Some(TimestampRouter(alias, f, tf, tsField))
                case _ =>
                  errors += s"transforms.$alias (TimestampRouter) requires " +
                    "topic.format and timestamp.format"
                  scala.None
              }
          }
      }
    }
    val errs = errors.result()
    if (errs.nonEmpty) Left(errs) else Right(chain)
  }
}
