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

  /** Row-conditional application under predicate column `p` (Connect's
    * `transforms.<alias>.predicate` gating): transform rows where `p`,
    * pass the rest through unchanged. None for schema-reshaping
    * transforms — a relational batch has ONE schema, so a per-row
    * drop/rename/flatten cannot be conditional (rejected at parse). */
  def applyWhen(df: DataFrame, p: Column): Option[DataFrame] = {
    val _ = (df, p); scala.None
  }
}

/** Connect's `predicates.<alias>` family: named row predicates the
  * transform chain gates on. */
sealed trait SmtPredicate {
  def name: String
  /** The predicate as a Column over the stream's rows. */
  def test(df: DataFrame): Column
}

object SmtPredicate {
  /** Predicate type roster (Connect's built-ins; HasHeaderKey is
    * rejected at parse — this engine's stream envelope carries no
    * headers plane). */
  val Types: Seq[String] = Seq("RecordIsTombstone", "TopicNameMatches")

  /** True when the WHOLE topic matches `pattern` (Connect's
    * `matcher.matches()`). Needs the multi-topic plane's `topic`
    * column. */
  final case class TopicNameMatches(name: String, pattern: String)
      extends SmtPredicate {
    def test(df: DataFrame): Column = {
      require(df.columns.contains("topic"),
        s"predicates.$name (TopicNameMatches): no 'topic' column — " +
          "this predicate needs the multi-topic plane")
      col("topic").rlike(s"^(?:$pattern)$$")
    }
  }

  /** True when the record value is a tombstone — in the flattened
    * relational envelope: every payload (non-envelope) column NULL. */
  final case class RecordIsTombstone(name: String) extends SmtPredicate {
    def test(df: DataFrame): Column = {
      // Connect tests record.value() == null and NOTHING else — on
      // the normalized Kafka envelope (topic, part, off, ts, key,
      // value) the value column alone decides; ts/key are non-null on
      // every real tombstone, so an all-payload-null test would never
      // fire there. Flattened envelopes without a value column fall
      // back to all-payload-null with ts/key excluded as envelope.
      if (df.columns.contains("value")) col("value").isNull
      else {
        val payload =
          df.columns.filterNot(Smt.EnvelopeColumns ++ Set("ts", "key"))
        if (payload.isEmpty) lit(true)
        else payload.map(col(_).isNull).reduce(_ && _)
      }
    }
  }
}

/** A transform gated by a predicate (optionally negated) — Connect's
  * `transforms.<alias>.predicate` / `.negate`. Parse admits only
  * row-conditional inner transforms. */
final case class Predicated(inner: Smt, pred: SmtPredicate,
                            negate: Boolean) extends Smt {
  def alias: String = inner.alias
  def routesTopic: Boolean = inner.routesTopic
  def apply(df: DataFrame): DataFrame = {
    val p = if (negate) !pred.test(df) else pred.test(df)
    inner.applyWhen(df, p).getOrElse(throw new IllegalStateException(
      s"transforms.$alias: inner transform cannot be row-conditional " +
        "(parse should have rejected this)"))
  }
}

object Smt {

  /** The UTC wall clock of an instant, as TIMESTAMP_NTZ, by epoch
    * arithmetic — NEVER through the session zone. (`convert_timezone
    * (lit("UTC"), instant)` implicitly casts the instant to NTZ via
    * the SESSION wall clock first; during that zone's fall-back hour
    * the repeated wall clock resolves to one offset and the render
    * lands an hour off. UTC has no DST, so epoch micros split into
    * days + time-of-day are exact for every instant.) */
  private[ingest] def instantToUtcWall(ts: Column): Column = {
    val us = unix_micros(ts)
    val tod = pmod(us, lit(86400000000L)) // non-negative, pre-epoch safe
    val days = ((us - tod) / lit(86400000000L)).cast("int")
    date_add(lit(java.sql.Date.valueOf("1970-01-01")), days)
      .cast("timestamp_ntz") +
      make_dt_interval(lit(0), lit(0), lit(0),
        (tod.cast("decimal(20,0)") / lit(1000000L)).cast("decimal(18,6)"))
  }

  /** Roster of supported `transforms.<alias>.type` values (Connect's
    * classic built-ins; the unqualified class names). */
  val Types: Seq[String] =
    Seq("Cast", "ExtractField", "Flatten", "InsertField", "MaskField",
      "RegexRouter", "ReplaceField", "TimestampConverter",
      "TimestampRouter")

  /** The stream envelope: offset identity + routing. */
  val EnvelopeColumns: Set[String] = Set("part", "off", "topic")
  private val Reserved = EnvelopeColumns

  /** Transform types whose effect is a pure VALUE edit and so can be
    * row-conditional under a predicate; schema-reshaping types
    * (drop/rename/flatten/cast/extract) cannot — a relational batch
    * has one schema. */
  val RowConditionalTypes: Set[String] =
    Set("InsertField", "MaskField", "RegexRouter", "TimestampRouter")

  /** Connect `Cast.spec` type names → Spark types. */
  val CastTypes: Map[String, org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Map("int8" -> ByteType, "int16" -> ShortType, "int32" -> IntegerType,
      "int64" -> LongType, "float32" -> FloatType, "float64" -> DoubleType,
      "boolean" -> BooleanType, "string" -> StringType,
      "bytes" -> BinaryType)
  }

  /** Connect's zero value for a masked field (`MaskField` with no
    * replacement): the type's zero, NOT SQL NULL — a carried-over
    * Connect config must keep producing empty strings/zeros where
    * downstream code assumes non-null. Types Connect's primitive
    * mapping does not cover fail at apply, like Connect's
    * DataException. */
  private def zeroValue(dt: org.apache.spark.sql.types.DataType,
                        alias: String, f: String): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => lit("")
      case BooleanType => lit(false)
      case _: NumericType => lit(0).cast(dt)
      case BinaryType => lit(Array.emptyByteArray)
      // Connect masks logical time types through their physical int64
      // zero — epoch 0. TZ-free constructors, NOT a cast chain: a
      // timestamp→date cast renders in the SESSION zone, so a
      // west-of-UTC session would mask dates to 1969-12-31
      case TimestampType => timestamp_millis(lit(0L))
      case DateType => date_from_unix_date(lit(0))
      case other => throw new IllegalArgumentException(
        s"transforms.$alias (MaskField): masking a ${other.simpleString} " +
          s"column '$f' with no replacement is not supported (Connect " +
          "masks primitive types only)")
    }
  }

  /** Parse-time validation of a datetime render pattern under SPARK's
    * pattern rules (not SimpleDateFormat's — e.g. week-year 'Y' is
    * rejected): constructing the session formatter and rendering one
    * instant forces every lazily-checked element, so an illegal
    * pattern fails config validation instead of mid-stream. */
  private def patternError(fmt: String): Option[String] =
    try {
      org.apache.spark.sql.catalyst.util.TimestampFormatter(
        fmt, java.time.ZoneId.of("UTC"), isParsing = false).format(0L)
      scala.None
    } catch {
      case e: Throwable =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.next())
    }

  /** Connect's `InsertField` with a static field: adds a constant
    * string column. */
  final case class InsertField(alias: String, field: String, value: String)
      extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame = df.withColumn(field, lit(value))
    override def applyWhen(df: DataFrame, p: Column): Option[DataFrame] = {
      val orig: Column =
        if (df.columns.contains(field)) col(field)
        else lit(null).cast("string")
      Some(df.withColumn(field, when(p, lit(value)).otherwise(orig)))
    }
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

  /** Connect's `MaskField`: mask the listed fields to the type's ZERO
    * value (empty string / 0 / false — Connect's documented masking),
    * or substitute a literal replacement. */
  final case class MaskField(alias: String, fields: Seq[String],
                             replacement: Option[String]) extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame = applyGated(df, scala.None)
    override def applyWhen(df: DataFrame, p: Column): Option[DataFrame] =
      Some(applyGated(df, Some(p)))
    private def applyGated(df: DataFrame, p: Option[Column]): DataFrame =
      fields.foldLeft(df) { (d, f) =>
        require(d.columns.contains(f),
          s"transforms.$alias (MaskField): no column '$f' in the stream")
        val dt = d.schema(f).dataType
        val masked: Column = replacement match {
          case Some(v) => lit(v).cast(dt)
          case scala.None => zeroValue(dt, alias, f)
        }
        d.withColumn(f,
          p.fold(masked)(c => when(c, masked).otherwise(col(f))))
      }
  }

  /** Connect's `Cast`: per-field type casts from a `spec` of
    * `field:type` pairs (the whole-value form has no analog here —
    * records are structured). Spark's `cast` is Connect's cast
    * semantics: numeric widening/narrowing, string round-trips,
    * boolean ↔ numeric. */
  final case class CastField(alias: String,
                             spec: Seq[(String, org.apache.spark.sql.types.DataType)])
      extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame =
      spec.foldLeft(df) { case (d, (f, dt)) =>
        require(d.columns.contains(f),
          s"transforms.$alias (Cast): no column '$f' in the stream")
        d.withColumn(f, col(f).cast(dt))
      }
  }

  /** Connect's `ExtractField` (value form): replace the record value
    * with ONE of its fields. Flattened to columns: the stream envelope
    * (part/off/topic) survives, the payload becomes the extracted
    * field — expanded to its subfields when it is a struct, a single
    * column otherwise. */
  final case class ExtractField(alias: String, field: String) extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.types.StructType
      require(df.columns.contains(field),
        s"transforms.$alias (ExtractField): no column '$field' in the stream")
      val envelope = df.columns.filter(Reserved).toSeq
      df.schema(field).dataType match {
        case st: StructType =>
          val clash = st.fieldNames.filter(Reserved)
          require(clash.isEmpty,
            s"transforms.$alias (ExtractField): subfield(s) " +
              s"${clash.mkString(", ")} of '$field' collide with the " +
              "stream envelope")
          df.select(envelope.map(col) ++
            st.fieldNames.toSeq.map(n => col(s"$field.$n").as(n)): _*)
        case _ => df.select(envelope.map(col) :+ col(field): _*)
      }
    }
  }

  /** Connect's `Flatten`: recursively hoist nested struct fields to
    * top-level columns named `outer<delim>inner` (delimiter '.' by
    * default, as in Connect). A pure projection — Catalyst prunes the
    * unreferenced subtrees at the scan. */
  final case class Flatten(alias: String, delimiter: String) extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.types.{DataType, StructType}
      def expand(name: String, c: Column, dt: DataType): Seq[(String, Column)] =
        dt match {
          case st: StructType => st.fields.toSeq.flatMap(f =>
            expand(s"$name$delimiter${f.name}", c.getField(f.name), f.dataType))
          case _ => Seq(name -> c)
        }
      val cols = df.schema.fields.toSeq.flatMap(f =>
        expand(f.name, col(s"`${f.name}`"), f.dataType))
      df.select(cols.map { case (n, c) => c.as(n) }: _*)
    }
  }

  /** Connect's `TimestampConverter`: convert a time-valued field
    * between representations. The source column may be a timestamp/
    * date, a string (parsed with `format`), or a number (epoch at
    * `unix.precision`); `target.type` picks the output — Timestamp,
    * Date, string (rendered with `format`), or unix (epoch at
    * `unix.precision`). Connect's `Time` target has no Spark type and
    * is rejected at parse. */
  final case class TimestampConverter(alias: String, field: String,
                                      targetType: String,
                                      format: Option[String],
                                      unixPrecision: String) extends Smt {
    val routesTopic = false
    def apply(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.types._
      require(df.columns.contains(field),
        s"transforms.$alias (TimestampConverter): no column '$field' " +
          "in the stream")
      // Connect's TimestampConverter pins UTC for every wall-clock
      // conversion; Spark's to_timestamp/date casts use the SESSION
      // zone. All wall→instant reads therefore parse to
      // TIMESTAMP_NTZ and convert by EPOCH ARITHMETIC on the wall
      // fields — UTC has no DST, so the instant is exactly
      // days·86400s + time-of-day. (An earlier session-zone
      // round-trip — shift the UTC wall into the session zone, cast
      // back — canceled exactly EXCEPT in the session zone's
      // fall-back hour, where cast resolution of the repeated wall
      // clock could land one hour off; it also froze the session
      // zone at transform-build time.)
      def utcWallToInstant(ntz: Column): Column =
        timestamp_micros(
          unix_date(ntz.cast(DateType)).cast(LongType) * lit(86400000000L) +
            hour(ntz).cast(LongType) * lit(3600000000L) +
            minute(ntz).cast(LongType) * lit(60000000L) +
            // SECOND extracts an exact DECIMAL(8,6) incl. the fraction
            (date_part(lit("SECOND"), ntz) * lit(1000000)).cast(LongType))
      val asTs: Column = df.schema(field).dataType match {
        case TimestampType => col(field)
        case DateType =>
          utcWallToInstant(col(field).cast("timestamp_ntz"))
        case StringType => format match {
          case Some(f) => utcWallToInstant(to_timestamp_ntz(col(field), lit(f)))
          case scala.None => utcWallToInstant(to_timestamp_ntz(col(field)))
        }
        case _: NumericType => unixPrecision match {
          case "seconds" => timestamp_seconds(col(field).cast("long"))
          case "microseconds" => timestamp_micros(col(field).cast("long"))
          case _ => timestamp_millis(col(field).cast("long"))
        }
        case other => throw new IllegalArgumentException(
          s"transforms.$alias (TimestampConverter): cannot read a " +
            s"${other.simpleString} column '$field' as a timestamp")
      }
      val out: Column = targetType match {
        case "Timestamp" => asTs
        // instant→wall renders pin UTC too (the NTZ wall is rendered
        // as-is, independent of the session zone)
        case "Date" =>
          Smt.instantToUtcWall(asTs).cast(DateType)
        case "string" => // format required at parse
          date_format(Smt.instantToUtcWall(asTs), format.get)
        case "unix" => unixPrecision match {
          case "seconds" => unix_seconds(asTs)
          case "microseconds" => unix_micros(asTs)
          case _ => unix_millis(asTs)
        }
      }
      df.withColumn(field, out)
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
    def apply(df: DataFrame): DataFrame = applyWhen(df, lit(true)).get
    override def applyWhen(df: DataFrame, p: Column): Option[DataFrame] =
      Some(df.withColumn("topic",
        when(p && col("topic").rlike(anchored),
          regexp_replace(col("topic"), anchored, replacement))
          .otherwise(col("topic"))))
  }

  /** Connect's `TimestampRouter`: topic = `topic.format` with
    * `$${topic}` and `$${timestamp}` substituted, the timestamp
    * rendered by `timestamp.format` from RECORD time (`tsField` — the
    * config's `timestamp.field`), so replays route identically. */
  final case class TimestampRouter(alias: String, topicFormat: String,
                                   tsFormat: String, tsField: String)
      extends Smt {
    val routesTopic = true
    def apply(df: DataFrame): DataFrame = applyWhen(df, lit(true)).get
    override def applyWhen(df: DataFrame, p: Column): Option[DataFrame] = {
      require(df.columns.contains(tsField),
        s"transforms.$alias (TimestampRouter): no record-time column " +
          s"'$tsField' in the stream")
      // Connect throws on a record with no timestamp; a silent NULL
      // here would null-propagate into the topic and misroute the
      // record, so the row errors instead (lazily — only a null
      // record time evaluates the raise)
      // render in UTC regardless of the session zone (Connect's
      // TimestampRouter pins UTC): convert_timezone yields the UTC
      // wall clock as TIMESTAMP_NTZ, which date_format renders
      // as-is — a session-zone render would route the same record
      // into different directories on differently-configured
      // clusters, breaking replay determinism
      val rendered = when(col(tsField).isNotNull,
          date_format(Smt.instantToUtcWall(col(tsField)), tsFormat))
        .otherwise(raise_error(lit(s"transforms.$alias (TimestampRouter): " +
          s"null record time in '$tsField'")).cast("string"))
      val token = "(\\$\\{topic\\}|\\$\\{timestamp\\})".r
      val parts = scala.collection.mutable.ListBuffer.empty[Column]
      var at = 0
      token.findAllMatchIn(topicFormat).foreach { m =>
        if (m.start > at) parts += lit(topicFormat.substring(at, m.start))
        parts += (if (m.matched == "${topic}") col("topic") else rendered)
        at = m.end
      }
      if (at < topicFormat.length) parts += lit(topicFormat.substring(at))
      // when() keeps both the rewrite and the null-time raise lazy —
      // gated-out rows route (and validate) nothing
      Some(df.withColumn("topic",
        when(p, concat(parts.toSeq: _*)).otherwise(col("topic"))))
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
    // ---- the predicates.<alias> family (Connect's named predicates) ----
    val predPrefix = "predicates."
    val predDeclared = props.getOrElse("predicates", "").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
    if (predDeclared.distinct.size != predDeclared.size)
      errors += "predicates declares duplicate aliases: " +
        predDeclared.diff(predDeclared.distinct).distinct.mkString(", ")
    val predByAlias = props.keySet.filter(_.startsWith(predPrefix))
      .groupBy(_.stripPrefix(predPrefix).split("\\.", 2)(0))
    (predByAlias.keySet -- predDeclared).toSeq.sorted.foreach { a =>
      errors += s"predicates.$a.* configured but '$a' is not declared in " +
        s"predicates (${if (predDeclared.isEmpty) "empty"
          else predDeclared.mkString(", ")})"
    }
    def pp(alias: String, param: String): Option[String] =
      props.get(s"$predPrefix$alias.$param").map(_.trim).filter(_.nonEmpty)
    val predKnown: Map[String, Set[String]] = Map(
      "TopicNameMatches" -> Set("pattern"),
      "RecordIsTombstone" -> Set.empty)
    val predicates: Map[String, SmtPredicate] = predDeclared.flatMap { a =>
      pp(a, "type") match {
        case scala.None =>
          errors += s"predicates.$a.type is required (one of " +
            s"${SmtPredicate.Types.mkString(", ")})"
          scala.None
        case Some("HasHeaderKey") =>
          errors += s"predicates.$a: HasHeaderKey has no consumer — " +
            "this engine's stream envelope carries no headers plane"
          scala.None
        case Some(t) if !SmtPredicate.Types.contains(t) =>
          errors += s"predicates.$a.type '$t' is unknown; valid values " +
            s"are ${SmtPredicate.Types.mkString(", ")}"
          scala.None
        case Some(t) =>
          predByAlias.getOrElse(a, Set.empty)
            .map(_.stripPrefix(s"$predPrefix$a."))
            .filterNot(param => param == "type" || predKnown(t)(param))
            .toSeq.sorted.foreach { param =>
              errors += s"predicates.$a.$param is not a $t parameter" +
                (if (predKnown(t).nonEmpty)
                   s" (known: ${predKnown(t).toSeq.sorted.mkString(", ")})"
                 else "")
            }
          t match {
            case "TopicNameMatches" => pp(a, "pattern") match {
              case Some(r) =>
                try { java.util.regex.Pattern.compile(r) } catch {
                  case e: Exception =>
                    errors += s"predicates.$a: invalid pattern '$r' " +
                      s"(${e.getMessage.linesIterator.next()})"
                }
                Some(SmtPredicate.TopicNameMatches(a, r))
              case scala.None =>
                errors += s"predicates.$a (TopicNameMatches) requires pattern"
                scala.None
            }
            case _ => Some(SmtPredicate.RecordIsTombstone(a))
          }
      }
    }.map(p => p.name -> p).toMap

    val knownParams: Map[String, Set[String]] = Map(
      "InsertField" -> Set("static.field", "static.value"),
      "ReplaceField" -> Set("renames", "exclude"),
      "MaskField" -> Set("fields", "replacement"),
      "RegexRouter" -> Set("regex", "replacement"),
      "TimestampRouter" -> Set("topic.format", "timestamp.format"),
      "Cast" -> Set("spec"),
      "ExtractField" -> Set("field"),
      "Flatten" -> Set("delimiter"),
      "TimestampConverter" -> Set("field", "target.type", "format",
        "unix.precision"))
    def p(alias: String, param: String): Option[String] =
      props.get(s"$prefix$alias.$param").map(_.trim).filter(_.nonEmpty)
    // when a TimestampRouter is anywhere in the chain, the record-time
    // field it reads is part of the routing contract — a field edit
    // that masks/renames/drops it would null- or miss-route records,
    // so it joins the reserved set chain-wide
    val hasTsRouter = declared.exists(a =>
      p(a, "type").contains("TimestampRouter"))
    val reserved: Set[String] =
      if (hasTsRouter && tsField.nonEmpty) Reserved + tsField else Reserved
    def reservedIn(alias: String, what: String, names: Seq[String]): Unit =
      names.filter(reserved).foreach { n =>
        errors += s"transforms.$alias: $what must not touch the stream " +
          s"envelope column '$n' (part/off are offset identity; only " +
          "routers rewrite topic" +
          (if (hasTsRouter && n == tsField)
             s"; '$tsField' is read by the TimestampRouter in this chain"
           else "") + ")"
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
            .filterNot(param => param == "type" || param == "predicate" ||
              param == "negate" || knownParams(t)(param))
          extra.toSeq.sorted.foreach { param =>
            errors += s"transforms.$alias.$param is not a $t parameter " +
              s"(known: ${knownParams(t).toSeq.sorted.mkString(", ")})"
          }
          val built: Option[Smt] = t match {
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
              // Connect's documented defaults apply when the params are
              // absent — a carried-over config relying on them works
              val f = p(alias, "topic.format")
                .getOrElse("${topic}-${timestamp}")
              val tf = p(alias, "timestamp.format").getOrElse("yyyyMMdd")
              patternError(tf).foreach { e =>
                errors += s"transforms.$alias: timestamp.format '$tf' is " +
                  s"not a valid Spark datetime pattern ($e)"
              }
              Some(TimestampRouter(alias, f, tf, tsField))
            case "Cast" =>
              p(alias, "spec") match {
                case Some(specStr) =>
                  val entries = specStr.split(",").map(_.trim)
                    .filter(_.nonEmpty).toSeq
                  // a spec that names NO entries (",", "") must error,
                  // not silently drop the declared transform from the
                  // chain — every entry that fails below records its
                  // own error, so pairs.isEmpty alone can't tell the
                  // two apart
                  if (entries.isEmpty)
                    errors += s"transforms.$alias (Cast): spec " +
                      s"'$specStr' names no field:type entries"
                  val pairs = entries.flatMap { entry =>
                      entry.split(":") match {
                        case Array(f, t)
                            if f.trim.nonEmpty && t.trim.nonEmpty =>
                          CastTypes.get(t.trim) match {
                            case Some(dt) => Some(f.trim -> dt)
                            case scala.None =>
                              errors += s"transforms.$alias (Cast): " +
                                s"unknown type '${t.trim}' in spec; valid " +
                                s"types are ${CastTypes.keys.toSeq.sorted.mkString(", ")}"
                              scala.None
                          }
                        case _ =>
                          errors += s"transforms.$alias (Cast): spec " +
                            s"entry '$entry' must be field:type (the " +
                            "whole-value form has no analog — records " +
                            "are structured)"
                          scala.None
                      }
                    }
                  reservedIn(alias, "spec", pairs.map(_._1))
                  if (pairs.isEmpty) scala.None
                  else Some(CastField(alias, pairs))
                case scala.None =>
                  errors += s"transforms.$alias (Cast) requires spec"
                  scala.None
              }
            case "ExtractField" =>
              p(alias, "field") match {
                case Some(f) =>
                  reservedIn(alias, "field", Seq(f))
                  Some(ExtractField(alias, f))
                case scala.None =>
                  errors += s"transforms.$alias (ExtractField) requires field"
                  scala.None
              }
            case "Flatten" =>
              Some(Flatten(alias, p(alias, "delimiter").getOrElse(".")))
            case "TimestampConverter" =>
              val target = p(alias, "target.type")
              val fmt = p(alias, "format")
              val precision = p(alias, "unix.precision")
                .getOrElse("milliseconds")
              val validTargets = Seq("Timestamp", "Date", "string", "unix")
              target match {
                case scala.None =>
                  errors += s"transforms.$alias (TimestampConverter) " +
                    s"requires target.type (one of ${validTargets.mkString(", ")})"
                case Some("Time") =>
                  errors += s"transforms.$alias (TimestampConverter): " +
                    "target.type Time has no Spark type; use string with " +
                    "a time-of-day format"
                case Some(t) if !validTargets.contains(t) =>
                  errors += s"transforms.$alias (TimestampConverter): " +
                    s"unknown target.type '$t'; valid values are " +
                    validTargets.mkString(", ")
                case _ => ()
              }
              if (target.contains("string") && fmt.isEmpty)
                errors += s"transforms.$alias (TimestampConverter): " +
                  "target.type string requires format"
              fmt.foreach(f => patternError(f).foreach { e =>
                errors += s"transforms.$alias: format '$f' is not a " +
                  s"valid Spark datetime pattern ($e)"
              })
              if (!Seq("milliseconds", "seconds", "microseconds")
                  .contains(precision))
                errors += s"transforms.$alias (TimestampConverter): " +
                  s"unknown unix.precision '$precision'; valid values " +
                  "are milliseconds, seconds, microseconds"
              p(alias, "field") match {
                case Some(f) if target.exists(validTargets.contains) =>
                  reservedIn(alias, "field", Seq(f))
                  Some(TimestampConverter(alias, f, target.get, fmt,
                    precision))
                case Some(_) => scala.None // target errors already added
                case scala.None =>
                  errors += s"transforms.$alias (TimestampConverter) " +
                    "requires field"
                  scala.None
              }
          }
          // ---- predicate gating (transforms.<alias>.predicate/.negate) ----
          val negate = p(alias, "negate") match {
            case scala.None => false
            case Some("true") => true
            case Some("false") => false
            case Some(v) =>
              errors += s"transforms.$alias.negate must be true or " +
                s"false, got '$v'"
              false
          }
          p(alias, "predicate") match {
            case scala.None =>
              if (p(alias, "negate").nonEmpty)
                errors += s"transforms.$alias.negate set without a predicate"
              built
            case Some(ref) if !RowConditionalTypes.contains(t) =>
              errors += s"transforms.$alias: a $t cannot be gated by a " +
                "predicate — it reshapes the schema, and a relational " +
                "batch has one schema per micro-batch (gate " +
                s"${RowConditionalTypes.toSeq.sorted.mkString("/")}, or " +
                "split the stream instead)"
              scala.None
            case Some(ref) => predicates.get(ref) match {
              case Some(pr) => built.map(Predicated(_, pr, negate))
              case scala.None =>
                errors += s"transforms.$alias.predicate '$ref' is not " +
                  s"declared in predicates (${if (predDeclared.isEmpty)
                    "empty" else predDeclared.mkString(", ")})"
                scala.None
            }
          }
      }
    }
    val errs = errors.result()
    if (errs.nonEmpty) Left(errs) else Right(chain)
  }
}
