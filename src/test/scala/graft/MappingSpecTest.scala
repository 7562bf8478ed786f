package graft

import graft.ingest.{FieldMap, Mapping, MappingSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** R1 declarative mapping DSL: spec-compiled extraction must agree with
  * hand-written get_json_object/explode chains, on synthetic form-shaped
  * JSON and on the real events.props column.
  */
class MappingSpecTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // CommCare-form-shaped documents: metadata + repeat-group array.
  private lazy val forms = Seq(
    (1L, """{"form": {"name": "visit", "age": 34},
            "meta": {"user": "u1"},
            "children": [{"cname": "a", "dob": "2019-01-02"},
                         {"cname": "b", "dob": "2021-07-11"}]}"""),
    (2L, """{"form": {"name": "register", "age": 27},
            "meta": {"user": "u2"},
            "children": [{"cname": "c", "dob": "2020-03-04"}]}"""),
    (3L, """{"form": {"name": "visit", "age": 55},
            "meta": {"user": "u3"}}"""),
    (4L, """{"form": {"name": "close", "age": 61},
            "meta": {"user": "u4"}, "children": []}""")
  ).toDF("form_id", "doc")

  test("map+emit: document-level fields with casts") {
    val spec = MappingSpec(Seq(
      FieldMap("$.form.name", "form_name"),
      FieldMap("$.form.age", "age", "long"),
      FieldMap("$.meta.user", "user")))
    val got = Mapping.compile(forms, "doc", spec)
      .select("form_id", "form_name", "age", "user")
      .as[(Long, String, Long, String)].collect().sortBy(_._1)
    val want = forms.select(
      col("form_id"),
      get_json_object(col("doc"), "$.form.name").as("form_name"),
      get_json_object(col("doc"), "$.form.age").cast("long").as("age"),
      get_json_object(col("doc"), "$.meta.user").as("user"))
      .as[(Long, String, Long, String)].collect().sortBy(_._1)
    assert(got.sameElements(want))
    assert(got.length == 4)
  }

  test("filter+flatmap+emit: repeat group explodes to child rows") {
    val spec = MappingSpec(
      fields = Seq(
        FieldMap("$.meta.user", "user"),
        FieldMap("@.cname", "child_name"),
        FieldMap("@.dob", "dob", "date")),
      filter = Some("form_id < 4"),
      flatMapPath = Some("$.children"))
    val got = Mapping.compile(forms, "doc", spec)
      .select("form_id", "user", "child_name", "dob")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getDate(3)).map(_.toString)))
      .sortBy(x => (x._1, x._3))
    // doc 3 has NO children array → explode_outer keeps one row with null
    // child fields (a missing repeat group must not drop the form).
    val want = Array(
      (1L, "u1", Some("a"), Some("2019-01-02")),
      (1L, "u1", Some("b"), Some("2021-07-11")),
      (2L, "u2", Some("c"), Some("2020-03-04")),
      (3L, "u3", None, None))
    assert(got.sameElements(want))
  }

  test("compiled plan stays declarative: no UDFs, extraction in one select") {
    // Parquet-backed source (a local Seq would constant-fold to a
    // LocalTableScan and hide the expressions).
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val spec = MappingSpec(Seq(FieldMap("$.k", "k_int", "long")),
      filter = Some("event_type = 'signup'"))
    val plan = Mapping.compile(ev, "props", spec)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("get_json_object"))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    // the filter reaches the scan as a pushed filter
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(event_type,signup)"),
      s"filter not pushed:\n$plan")
  }

  test("real events.props: mapping agrees with the fn_json extraction") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val spec = MappingSpec(Seq(FieldMap("$.k", "k_int", "long")))
    val got = Mapping.compile(ev, "props", spec)
      .select(sum(col("k_int")), count(col("k_int"))).as[(Long, Long)].head()
    val want = ev.select(
      sum(get_json_object(col("props"), "$.k").cast("long")),
      count(get_json_object(col("props"), "$.k"))).as[(Long, Long)].head()
    assert(got == want && got._2 > 0)
  }

  test("scalar arrays explode via the bare '@' element path") {
    val df = Seq((1L, """{"tags": ["x", "y"]}"""), (2L, """{"tags": ["z"]}"""))
      .toDF("id", "doc")
    val spec = MappingSpec(
      fields = Seq(FieldMap("@", "tag")), flatMapPath = Some("$.tags"))
    val got = Mapping.compile(df, "doc", spec).select("id", "tag")
      .as[(Long, String)].collect().sorted
    assert(got.sameElements(Array((1L, "x"), (1L, "y"), (2L, "z"))))
  }

  test("invalid specs are rejected at construction") {
    intercept[IllegalArgumentException](MappingSpec(Seq.empty))
    intercept[IllegalArgumentException](
      MappingSpec(Seq(FieldMap("@.x", "x")))) // '@' without flatMapPath
  }

  test("emitted names colliding with source columns or each other fail loudly") {
    val df = Seq((1L, """{"a": 1}""")).toDF("id", "doc")
    // case-insensitive clash with a source column
    val e1 = intercept[IllegalArgumentException](
      Mapping.compile(df, "doc", MappingSpec(Seq(FieldMap("$.a", "ID")))))
    assert(e1.getMessage.contains("collide"))
    // duplicate emitted names
    val e2 = intercept[IllegalArgumentException](
      Mapping.compile(df, "doc",
        MappingSpec(Seq(FieldMap("$.a", "x"), FieldMap("$.a", "X")))))
    assert(e2.getMessage.contains("duplicate"))
  }
}
