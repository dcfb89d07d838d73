package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON rectangularization (reference: magictables/utils.py:36-80).
  *
  * Semantics being reproduced (single pass over one nesting level):
  *  - top-level scalars are replicated onto every emitted row;
  *  - each top-level list produces its OWN group of rows (union-of-explodes,
  *    NOT a cartesian product across sibling lists — utils.py:49-61);
  *  - a dict element's sub-keys become `key.subKey` columns, except a sub-key
  *    equal to its parent key, which keeps the bare name (utils.py:55-58);
  *  - a scalar list element lands under the bare list name (utils.py:59-61);
  *  - a top-level list input recurses per element (utils.py:72-74);
  *  - values below one level stay as-is (lists/dicts survive as values).
  *
  * Two implementations with identical row semantics:
  *  - [[flattenValue]]: driver-side, over parsed JSON values — used at
  *    ingestion time on small API payloads (a page of JSON, not data-scale).
  *  - [[flattenDf]]: distributed, over a DataFrame's StructType/ArrayType
  *    columns — pure plan rewrite (select/explode), executes on the cluster;
  *    this is the 100 TB path.
  */
object JsonFlatten {

  // ---------------------------------------------------------------- driver side

  /** Flatten a parsed JSON value into flat row maps. */
  def flattenValue(nested: Any, parentKey: String = ""): Seq[Map[String, Any]] =
    nested match {
      case m: scala.collection.Map[_, _] =>
        val entries = m.toSeq.map { case (k, v) => (k.toString, v) }
        val (nestedItems, topLevel) = entries.partition {
          case (_, _: scala.collection.Map[_, _]) => true
          case (_, _: Seq[_]) => true
          case _ => false
        }
        val base = topLevel.toMap
        if (nestedItems.isEmpty) Seq(base)
        else nestedItems.flatMap {
          case (key, list: Seq[_]) =>
            list.map {
              case item: scala.collection.Map[_, _] =>
                base ++ item.toSeq.map {
                  case (sk, sv) if sk.toString == key => key -> sv
                  case (sk, sv) => s"$key.$sk" -> sv
                }
              case item => base + (key -> item)
            }
          case (key, dict: scala.collection.Map[_, _]) =>
            Seq(base ++ dict.toSeq.map {
              case (sk, sv) if sk.toString == key => key -> sv
              case (sk, sv) => s"$key.$sk" -> sv
            })
          case _ => Seq.empty
        }
      case list: Seq[_] => list.flatMap(flattenValue(_, parentKey))
      case null => Seq(Map.empty)
      case scalar =>
        if (parentKey.nonEmpty) Seq(Map(parentKey -> scalar)) else Seq(Map.empty)
    }

  /** Flatten row maps and render each as a JSON line (feed to spark.read.json
    * for permissive-nullable schema inference, matching pl.DataFrame(dicts)).
    */
  def flattenToJsonLines(nested: Any): Seq[String] =
    flattenValue(nested).map(Jsons.render)

  // ---------------------------------------------------------------- distributed

  /** One flatten pass over a DataFrame, mirroring flattenValue's PER-ROW
    * semantics on StructType / ArrayType columns exactly (union of
    * branches, NOT a cartesian product — utils.py:49-61):
    *  - per array column A: explode(A) rows — zero rows when A is null or
    *    empty, matching the driver path where a null value is a scalar
    *    (no branch) and an empty list contributes no elements;
    *  - per struct column S: ONE row when S is non-null (the dict branch);
    *  - a residual branch keeps rows whose nested columns are ALL null
    *    (the driver's "no nested items -> one base row" case);
    *  - in every branch the OTHER nested columns are nulled — the
    *    reference's output simply lacks those keys on that branch's rows;
    *  - then struct columns unnest with the `key.subKey` / collision rule.
    */
  def flattenOnce(df: DataFrame): DataFrame = {
    val schema = df.schema
    val arrayCols = schema.fields.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
    val structCols = schema.fields.filter(_.dataType.isInstanceOf[StructType]).map(_.name)
    if (arrayCols.isEmpty && structCols.isEmpty) return df
    val nestedCols = (arrayCols ++ structCols).toSet

    def branchCols(own: String, explodeOwn: Boolean) = schema.fields.map { f =>
      if (f.name == own && explodeOwn) explode(col(quoted(f.name))).as(f.name)
      else if (f.name == own) col(quoted(f.name))
      else if (nestedCols.contains(f.name))
        lit(null).cast(nullElem(f.dataType)).as(f.name)
      else col(quoted(f.name))
    }.toSeq

    val arrayBranches = arrayCols.toSeq.map(a => df.select(branchCols(a, explodeOwn = true): _*))
    val structBranches = structCols.toSeq.map(s =>
      df.filter(col(quoted(s)).isNotNull).select(branchCols(s, explodeOwn = false): _*))
    val residual = df
      .filter(nestedCols.toSeq.map(c => col(quoted(c)).isNull).reduce(_ && _))
      .select(schema.fields.map { f =>
        if (nestedCols.contains(f.name)) lit(null).cast(nullElem(f.dataType)).as(f.name)
        else col(quoted(f.name))
      }.toSeq: _*)

    val unioned = (arrayBranches ++ structBranches :+ residual).reduce(_.unionByName(_))
    unnestStructs(unioned)
  }

  private def nullElem(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => e
    case other => other
  }

  /** Unnest every StructType column with the reference naming rule. */
  def unnestStructs(df: DataFrame): DataFrame = {
    val structs = df.schema.fields.filter(_.dataType.isInstanceOf[StructType])
    if (structs.isEmpty) df
    else {
      val cols: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
        f.dataType match {
          case st: StructType =>
            st.fields.toSeq.map { sf =>
              val outName = if (sf.name == f.name) f.name else s"${f.name}.${sf.name}"
              col(quoted(f.name)).getField(sf.name).as(outName)
            }
          case _ => Seq(col(quoted(f.name)))
        }
      }
      df.select(cols: _*)
    }
  }

  /** Flatten to fixpoint: repeat [[flattenOnce]] until no nested columns
    * remain (bounded by max schema depth). */
  def flattenAll(df: DataFrame, maxPasses: Int = 16): DataFrame = {
    var cur = df
    var i = 0
    while (i < maxPasses && cur.schema.fields.exists(f =>
        f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[StructType])) {
      cur = flattenOnce(cur)
      i += 1
    }
    cur
  }

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"
}
