package graft.sources

import org.apache.spark.sql.types._

/** SCHEMA-COMPATIBILITY CLASSIFICATION — the data-contract check a
  * pipeline runs before accepting a producer's new schema version.
  * Every field-level change between a `from` (old) and `to` (new)
  * schema is classified by which READERS it breaks:
  *
  *  - `backward` compatible: NEW-schema readers can read OLD data
  *    (consumers upgrade first — the usual deployment order);
  *  - `forward` compatible: OLD-schema readers can read NEW data
  *    (producers upgrade first).
  *
  * Change classes (the Avro/Protobuf compatibility matrix, expressed
  * over Spark types):
  *
  * | change                      | backward | forward |
  * |-----------------------------|----------|---------|
  * | add NULLABLE column         | yes      | yes     |
  * | add REQUIRED column         | no       | yes     |
  * | drop column                 | yes      | no      |
  * | widen type (int→long, float→double, …) | yes | no |
  * | narrow type                 | no       | yes     |
  * | required → nullable         | yes      | no      |
  * | nullable → required         | no       | yes     |
  * | incompatible type change    | no       | no      |
  *
  * (Widening is backward-only: a new LONG reader accepts old INT data,
  * but an old INT reader overflows on new LONG data. Dropping is
  * backward-only: the new reader simply doesn't ask for the column,
  * while an old reader still expects it.)
  *
  * Scale stance: this is a METADATA operation — O(|fields|), no data
  * touched — which is the point: the contract gate runs per commit,
  * not per terabyte.
  */
object SchemaCompat {

  final case class Change(field: String, change: String,
      backward: Boolean, forward: Boolean)

  private val widenings: Set[(DataType, DataType)] = Set(
    (ByteType, ShortType), (ByteType, IntegerType), (ByteType, LongType),
    (ShortType, IntegerType), (ShortType, LongType),
    (IntegerType, LongType), (FloatType, DoubleType),
    (IntegerType, DoubleType), (LongType, DoubleType))

  /** Classify every field-level difference between `from` and `to`. */
  def diff(from: StructType, to: StructType): Seq[Change] = {
    val fromByName = from.fields.map(f => f.name -> f).toMap
    val toByName = to.fields.map(f => f.name -> f).toMap
    val added = to.fields.filterNot(f => fromByName.contains(f.name)).map { f =>
      if (f.nullable) Change(f.name, "add_nullable", backward = true, forward = true)
      else Change(f.name, "add_required", backward = false, forward = true)
    }
    val dropped = from.fields.filterNot(f => toByName.contains(f.name))
      .map(f => Change(f.name, "drop", backward = true, forward = false))
    val changed = to.fields.flatMap { nf =>
      fromByName.get(nf.name).toSeq.flatMap { of =>
        val tc: Option[Change] =
          if (of.dataType == nf.dataType) None
          else if (widenings((of.dataType, nf.dataType)))
            Some(Change(nf.name, "widen", backward = true, forward = false))
          else if (widenings((nf.dataType, of.dataType)))
            Some(Change(nf.name, "narrow", backward = false, forward = true))
          else Some(Change(nf.name, "type_incompatible",
            backward = false, forward = false))
        val nc: Option[Change] =
          if (of.nullable == nf.nullable) None
          else if (nf.nullable)
            Some(Change(nf.name, "relax_nullable", backward = true, forward = false))
          else Some(Change(nf.name, "require_nonnull", backward = false, forward = true))
        tc.toSeq ++ nc.toSeq
      }
    }
    (added ++ dropped ++ changed).sortBy(c => (c.field, c.change))
  }

  /** Whole-schema verdicts: compatible iff EVERY change is. */
  def verdict(from: StructType, to: StructType): (Boolean, Boolean) = {
    val d = diff(from, to)
    (d.forall(_.backward), d.forall(_.forward))
  }
}
