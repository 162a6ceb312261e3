package graft.partition

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout as a drop-in `partitioner.class` — set
  * `partitioner.class=graft.partition.ZOrderPartitioner` and records
  * land in `zfile=<z-prefix>` directories along the Morton curve over
  * (configured numeric field, record-time hour). Where the built-in
  * time family prunes only time predicates, this layout gives every
  * directory a bounding box in BOTH dimensions (see
  * [[graft.operators.ZOrder]] and the `zorder_scan_pruning` report).
  *
  * Consumed keys (the partitioner receives the full validated map,
  * the reference's `Partitioner.configure(config)` contract —
  * `DataWriter.java:537-558`):
  *  - `partition.field.name` (required): the numeric payload column
  *    forming the non-time coordinate.
  *  - `path.format` (optional, `"<bits>,<fileBits>"`, default
  *    `"10,6"`): per-coordinate fold width and the Z-prefix width —
  *    up to `2^fileBits` directories, each a Z-range.
  *
  * The path expression is pure bit arithmetic built once at plan time
  * — codegen'd and prunable like every built-in partitioner. */
class ZOrderPartitioner extends PluggablePartitioner {

  private var fieldName: String = ""
  private var bits: Int = 10
  private var fileBits: Int = 6

  override def configure(props: Map[String, String]): Unit = {
    fieldName = props.getOrElse("partition.field.name", "")
    require(fieldName.nonEmpty,
      "partition.field.name is required by ZOrderPartitioner " +
        "(the non-time Z coordinate)")
    props.get("path.format").filter(_.nonEmpty).foreach { pf =>
      pf.split(",").map(_.trim) match {
        case Array(b, f) if b.forall(_.isDigit) && f.forall(_.isDigit) =>
          bits = b.toInt
          fileBits = f.toInt
        case _ => throw new IllegalArgumentException(
          s"path.format for ZOrderPartitioner must be '<bits>,<fileBits>', got '$pf'")
      }
    }
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(fileBits >= 1 && fileBits <= 2 * bits,
      s"fileBits must be in [1, ${2 * bits}], got $fileBits")
  }

  def encode(kafkaPartition: Column, ts: Column,
             field: String => Column): Column = {
    val fold = lit(1L << bits)
    val u = pmod(field(fieldName).cast("long"), fold)
    // exact integer hour: subtract the millis remainder first so the
    // double division is of an exactly-divisible (hence exact) value
    val ms = unix_millis(ts)
    val hours = ((ms - pmod(ms, lit(3600000L))) / lit(3600000L)).cast("long")
    val h = pmod(hours, fold)
    val z = ZOrder.interleave(u, h, bits)
    concat(lit("zfile="), ZOrder.zFile(z, bits, fileBits).cast("string"))
  }
}
