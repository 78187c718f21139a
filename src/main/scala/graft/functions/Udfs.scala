package graft.functions

import org.apache.spark.sql.SparkSession

/** Scala UDF surface (SURVEY §2-B note): the same cosine kernel as the
  * native CosineSim expression, registered as a plain UDF. Exists to
  * exercise the UDF extension point and as the baseline the native
  * expression is tested against — production code paths use CosineSim
  * (codegen, no serialization).
  */
object Udfs {
  def register(spark: SparkSession): Unit =
    spark.udf.register("cosine_udf", (a: Seq[Float], b: Seq[Float]) => {
      if (a == null || b == null || a.length != b.length) null
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        if (na == 0.0 || nb == 0.0) null
        else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
      }
    })
}
