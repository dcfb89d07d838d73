package graft

import graft.core.JsonFlatten
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Reference semantics under test: /root/reference/magictables/utils.py:36-80
  * (sibling-list union-of-explodes :49-61, name-collision rule :55-58,
  * scalar list elements :59-61, top-level list recursion :72-74). */
class JsonFlattenSpec extends SparkSpecBase {

  test("scalars only -> single row") {
    assert(JsonFlatten.flattenValue(Map("a" -> 1, "b" -> "x")) ===
      Seq(Map("a" -> 1, "b" -> "x")))
  }

  test("sibling lists produce their own row groups (NOT a cartesian product)") {
    val rows = JsonFlatten.flattenValue(
      Map("id" -> 7, "xs" -> Seq(1, 2), "ys" -> Seq(3)))
    assert(rows.toSet === Set(
      Map("id" -> 7, "xs" -> 1),
      Map("id" -> 7, "xs" -> 2),
      Map("id" -> 7, "ys" -> 3)))
  }

  test("dict list elements: sub-key == parent key keeps the bare name") {
    val rows = JsonFlatten.flattenValue(
      Map("genre" -> Seq(Map("genre" -> "crime", "weight" -> 2))))
    assert(rows === Seq(Map("genre" -> "crime", "genre.weight" -> 2)))
  }

  test("nested dict (non-list) unnests with the same collision rule") {
    val rows = JsonFlatten.flattenValue(Map("a" -> Map("a" -> 2, "b" -> 1)))
    assert(rows === Seq(Map("a" -> 2, "a.b" -> 1)))
  }

  test("top-level list recurses per element") {
    val rows = JsonFlatten.flattenValue(Seq(Map("a" -> 1), Map("a" -> 2)))
    assert(rows === Seq(Map("a" -> 1), Map("a" -> 2)))
  }

  test("distributed flattenOnce: union-of-explodes matches driver semantics") {
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(7L, Seq(1L, 2L), Seq(3L))),
      StructType(Seq(
        StructField("id", LongType),
        StructField("xs", ArrayType(LongType)),
        StructField("ys", ArrayType(LongType)))))
    val out = JsonFlatten.flattenOnce(df)
      .select("id", "xs", "ys").collect()
      .map(r => (r.get(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out === Set(
      (7L, Some(1L), None), (7L, Some(2L), None), (7L, None, Some(3L))))
  }

  test("flattenOnce matches driver semantics on null/empty arrays and mixed nesting") {
    // driver reference: null array = scalar (replicates, no branch); empty
    // array = a branch with zero elements (can kill the whole record);
    // non-null dict = its own single-row branch; all-nested-null = one base row
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("xs", ArrayType(LongType)),
      StructField("d", StructType(Seq(StructField("k", LongType))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Seq(10L, 20L), Row(5L)), // 2 array rows + 1 dict row
        Row(2L, null, null),             // base row only
        Row(3L, Seq.empty[Long], null),  // empty list, null dict -> NO rows
        Row(4L, null, Row(7L))),         // dict row only
      schema)
    val out = JsonFlatten.flattenOnce(df)
      .select("id", "xs", "`d.k`").collect()
      .map(r => (r.get(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out === Set(
      (1L, Some(10L), None), (1L, Some(20L), None), (1L, None, Some(5L)),
      (2L, None, None),
      (4L, None, Some(7L))))
    // cross-check against the driver path on the same logical records
    val driverRows =
      JsonFlatten.flattenValue(Map("id" -> 1L, "xs" -> Seq(10L, 20L), "d" -> Map("k" -> 5L))).size +
      JsonFlatten.flattenValue(Map("id" -> 2L)).size +
      JsonFlatten.flattenValue(Map("id" -> 3L, "xs" -> Seq.empty[Long])).size +
      JsonFlatten.flattenValue(Map("id" -> 4L, "d" -> Map("k" -> 7L))).size
    assert(driverRows === out.size)
  }

  test("distributed struct unnest applies the collision naming rule") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(Row("crime", 2L))),
      StructType(Seq(StructField("genre", StructType(Seq(
        StructField("genre", StringType), StructField("weight", LongType)))))))
    val out = JsonFlatten.unnestStructs(df)
    assert(out.columns.toSeq === Seq("genre", "genre.weight"))
    assert(out.head() === Row("crime", 2L))
  }

  test("flattenAll reaches a fixpoint and is idempotent") {
    val df = spark.read.json(
      spark.createDataset(Seq(
        """{"id":1,"deep":{"l":[{"x":1},{"x":2}]}}"""))(
        org.apache.spark.sql.Encoders.STRING))
    val once = JsonFlatten.flattenAll(df)
    assert(!once.schema.fields.exists(f =>
      f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[StructType]))
    val twice = JsonFlatten.flattenAll(once)
    assert(twice.schema === once.schema)
    assert(twice.collect().toSeq === once.collect().toSeq)
  }
}
