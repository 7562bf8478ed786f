package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** R1-style declarative column-mapping ingestion (SURVEY.md §1.2 R1: the
  * reference's `commcare-export` MiniLinq — filter/map/flatmap/emit over
  * paginated JSON → relational columns).
  *
  * A [[MappingSpec]] is the MiniLinq analog re-expressed Spark-first: the
  * whole spec COMPILES to one declarative select/where/explode chain over a
  * JSON string column, so Catalyst sees ordinary `get_json_object` +
  * `cast` expressions — codegen'd, pushdown-eligible, no UDFs, no
  * driver-side JSON handling. At 100 TB ingest this is one scan: filter →
  * (optional) explode → N column extractions, all inside whole-stage
  * codegen.
  *
  * Path language (deliberately tiny, like MiniLinq's):
  *  - `$.a.b`  — JSONPath into the DOCUMENT (standard Spark JSONPath)
  *  - `@.a.b`  — JSONPath into the current ELEMENT of the exploded array
  *               (only valid when `flatMapPath` is set)
  *  - `@`      — the exploded element itself (scalar arrays)
  */
final case class FieldMap(path: String, name: String, dataType: String = "string")

/** @param filter      optional SQL predicate over the SOURCE columns,
  *                    applied before extraction (MiniLinq `filter`)
  * @param flatMapPath optional JSONPath to an array in the document; each
  *                    element becomes one output row (MiniLinq `flatmap`)
  * @param fields      emitted columns (MiniLinq `map`+`emit`)
  */
final case class MappingSpec(
    fields: Seq[FieldMap],
    filter: Option[String] = None,
    flatMapPath: Option[String] = None) {
  require(fields.nonEmpty, "MappingSpec: at least one field required")
  require(flatMapPath.nonEmpty || fields.forall(!_.path.startsWith("@")),
    "MappingSpec: '@' paths require flatMapPath")
}

object Mapping {

  /** Compile `spec` against `df`'s JSON string column `jsonCol`. Extracted
    * columns are APPENDED to the source columns (ids/timestamps survive;
    * callers project afterwards if they want the emitted fields only).
    */
  def compile(df: DataFrame, jsonCol: String, spec: MappingSpec): DataFrame = {
    // Emitted names must not collide with source columns or each other
    // (case-insensitive, matching Spark's default resolution): the output
    // contract is APPEND, and a duplicate name would make every later
    // reference ambiguous (or silently positional) — fail loudly here.
    val emittedLower = spec.fields.map(_.name.toLowerCase)
    require(emittedLower.distinct == emittedLower,
      s"MappingSpec: duplicate emitted field names: " +
        emittedLower.diff(emittedLower.distinct).distinct.mkString(", "))
    val srcLower = df.columns.map(_.toLowerCase).toSet
    val clash = emittedLower.filter(srcLower.contains)
    require(clash.isEmpty,
      s"MappingSpec: emitted field names collide with source columns: " +
        clash.mkString(", "))
    // helper column name guaranteed absent from the input AND from the
    // emitted field names — a collision would silently overwrite a
    // caller's column or drop an emitted one; comparison is
    // case-insensitive to match Spark's default resolution
    val taken = (df.columns ++ spec.fields.map(_.name)).map(_.toLowerCase).toSet
    val elemCol = Iterator.from(0)
      .map(i => if (i == 0) "__elem" else s"__elem$i")
      .find(n => !taken.contains(n.toLowerCase)).get
    val filtered = spec.filter.fold(df)(p => df.where(expr(p)))
    val exploded = spec.flatMapPath.fold(filtered) { p =>
      // Array-of-anything: slice the array out with JSONPath, re-parse as
      // array<string> (objects stay JSON text, scalars their literal), and
      // explode. outer-explode keeps documents whose array is missing.
      filtered.withColumn(elemCol,
        explode_outer(from_json(
          get_json_object(col(jsonCol), p), ArrayType(StringType))))
    }
    val emitted = spec.fields.map { f =>
      extract(col(jsonCol), elemCol, f).cast(f.dataType).as(f.name)
    }
    val out = exploded.select((exploded.columns.map(col).toSeq ++ emitted): _*)
    if (spec.flatMapPath.isEmpty) out else out.drop(elemCol)
  }

  private def extract(doc: Column, elemCol: String, f: FieldMap): Column =
    f.path match {
      case "@"                     => col(elemCol)
      case p if p.startsWith("@.") => get_json_object(col(elemCol), "$" + p.drop(1))
      case p if p.startsWith("$")  => get_json_object(doc, p)
      case p => throw new IllegalArgumentException(s"MappingSpec: bad path '$p'")
    }
}
