package graft.quality

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden-output comparison harness — the reference's pandas diff tool
  * (/root/reference/src/scripts/test_ETL.py) as a distributed Spark
  * utility (SURVEY AR6/J7).
  *
  * Both sides are flattened to (key, path, value) leaf rows — array
  * elements addressed by their domain key field when one is configured
  * (test_ETL.py:140-168 aligns `plazo_duracion` by `plazo`,
  * `principales_inversiones` by `emisor`, etc.), by position otherwise —
  * then full-outer-joined on (key, path). A leaf differs when either
  * side is MISSING, types disagree, strings mismatch, or numbers differ
  * beyond tolerance 1e-10 (test_ETL.py:86). Reliability per key =
  * (1 − diffs/fields)·100 (test_ETL.py:180-184).
  *
  * Scale: flatten is a narrow generator (one explode); the join shuffles
  * on (key, path) — both sides partition identically, no skew beyond
  * document size.
  */
object GoldenDiff {

  /** Array field name → key field used to align elements. */
  val DefaultListKeys: Map[String, String] = Map(
    "plazo_duracion" -> "plazo",
    "principales_inversiones" -> "emisor",
    "rentabilidad_volatilidad" -> "tipo_de_participacion",
    "por_activo" -> "activo",
    "por_tipo_de_renta" -> "tipo",
    "por_sector_economico" -> "sector",
    "por_pais_emisor" -> "pais",
    "por_moneda" -> "moneda",
    "por_calificacion" -> "calificacion")

  private case class Leaf(path: String, str: String, num: java.lang.Double,
      kind: String)

  private def walk(value: Any, dt: DataType, path: String,
      listKeys: Map[String, String], fieldName: String,
      out: collection.mutable.ArrayBuffer[Leaf]): Unit = {
    if (value == null) {
      out += Leaf(path, null, null, "null")
      return
    }
    dt match {
      case st: StructType =>
        val row = value.asInstanceOf[Row]
        st.fields.zipWithIndex.foreach { case (f, i) =>
          walk(row.get(i), f.dataType, s"$path.${f.name}", listKeys, f.name, out)
        }
      case at: ArrayType =>
        val seq = value.asInstanceOf[scala.collection.Seq[Any]]
        val keyField = listKeys.get(fieldName)
        seq.zipWithIndex.foreach { case (el, idx) =>
          val elemId = (keyField, el, at.elementType) match {
            case (Some(k), row: Row, st: StructType) if st.fieldNames.contains(k) =>
              val kv = row.get(st.fieldIndex(k))
              if (kv == null) s"#$idx" else s"$k=$kv"
            case _ => s"#$idx"
          }
          walk(el, at.elementType, s"$path[$elemId]", listKeys, fieldName, out)
        }
      case _: DoubleType | _: FloatType | _: IntegerType | _: LongType | _: DecimalType =>
        out += Leaf(path, value.toString,
          java.lang.Double.valueOf(value.toString), "num")
      case _: BooleanType =>
        out += Leaf(path, value.toString, null, "bool")
      case _ =>
        out += Leaf(path, value.toString, null, "str")
    }
  }

  /** Flatten every row of `df` into (key, path, str, num, kind) leaves.
    * `keyCol` must uniquely identify a document.
    */
  def flatten(df: DataFrame, keyCol: String,
      listKeys: Map[String, String] = DefaultListKeys): DataFrame = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val spark = df.sparkSession
    import spark.implicits._
    // Deliberately drops to the RDD (outside Tungsten/codegen): the
    // recursive any-shape walk over nested structs/arrays doesn't
    // express as Catalyst expressions, and this is a test/QA harness,
    // not a hot production path.
    df.rdd.flatMap { row =>
      val key = String.valueOf(row.get(keyIdx))
      val buf = collection.mutable.ArrayBuffer.empty[Leaf]
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (i != keyIdx)
          walk(row.get(i), f.dataType, f.name, listKeys, f.name, buf)
      }
      buf.map(l => (key, l.path, l.str, l.num, l.kind))
    }.toDF("key", "path", "str", "num", "kind")
  }

  /** Per-leaf diffs between two documents sets; empty ⇒ identical within
    * tolerance.
    */
  def diff(actual: DataFrame, expected: DataFrame, keyCol: String,
      tolerance: Double = 1e-10,
      listKeys: Map[String, String] = DefaultListKeys): DataFrame = {
    val a = flatten(actual, keyCol, listKeys).as("a")
    val e = flatten(expected, keyCol, listKeys).as("e")
    val joined = a.join(e,
      col("a.key") === col("e.key") && col("a.path") === col("e.path"),
      "full_outer")
    val bothNum = col("a.kind") === "num" && col("e.kind") === "num"
    val isDiff =
      when(col("a.key").isNull || col("e.key").isNull, lit(true)) // MISSING
        .when(col("a.kind") === "null" && col("e.kind") === "null", lit(false))
        .when(col("a.kind") =!= col("e.kind"), lit(true))
        .when(bothNum, abs(col("a.num") - col("e.num")) > tolerance)
        .otherwise(col("a.str") =!= col("e.str"))
    joined
      .withColumn("campo", coalesce(col("a.path"), col("e.path")))
      .withColumn("doc", coalesce(col("a.key"), col("e.key")))
      .filter(isDiff)
      .select(col("doc"), col("campo"),
        coalesce(col("a.str"), lit("MISSING")).as("actual"),
        coalesce(col("e.str"), lit("MISSING")).as("expected"))
  }

  /** Reliability report per document: (doc, n_fields, n_diffs,
    * confiabilidad) with the reference's score formula.
    */
  def reliability(actual: DataFrame, expected: DataFrame, keyCol: String,
      tolerance: Double = 1e-10): DataFrame = {
    val fields = flatten(expected, keyCol)
      .groupBy(col("key").as("doc")).agg(count(lit(1)).as("n_fields"))
    val diffs = diff(actual, expected, keyCol, tolerance)
      .groupBy(col("doc")).agg(count(lit(1)).as("n_diffs"))
    fields.join(diffs, Seq("doc"), "left_outer")
      .withColumn("n_diffs", coalesce(col("n_diffs"), lit(0L)))
      .withColumn("confiabilidad",
        greatest(lit(0.0), lit(1.0) - col("n_diffs") / col("n_fields")) * 100)
      .orderBy(col("confiabilidad"), col("doc"))
  }
}
