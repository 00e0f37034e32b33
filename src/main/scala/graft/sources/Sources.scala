package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ml.Ols

/** Source/sink surface beyond parquet (SURVEY §2.1).
  *
  * S7 — warehouse scan: `spark.read.jdbc` with predicate-pushdown-
  * friendly options (partitioned reads for big tables).
  * S8 — model artifact save/load: the reference pickles a coefficient
  * vector + intercept (`train_model.py:39-40`); here it's a tiny JSON
  * text artifact so scoring stays a pure Catalyst expression on load —
  * no runtime deserialization in the hot path.
  */
object Sources {

  /** S7: JDBC table scan. For big tables pass a partition column so the
    * read parallelizes (numPartitions ranged scans instead of 1). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionCol: Option[(String, Long, Long, Int)] = None,
               props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withPart = partitionCol match {
      case Some((c, lo, hi, n)) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
      case None => base
    }
    props.foldLeft(withPart) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** S8: persist a fitted model as a small JSON artifact. */
  def saveModel(model: Ols.Model, path: String): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    val json =
      s"""{"features": [${model.features.map(f => "\"" + esc(f) + "\"").mkString(", ")}],
         | "coef": [${model.coef.mkString(", ")}],
         | "intercept": ${model.intercept}}""".stripMargin
    Files.write(Paths.get(path), json.getBytes(StandardCharsets.UTF_8)): Unit
  }

  /** S8: load a model artifact saved by [[saveModel]]. */
  def loadModel(path: String): Ols.Model = {
    val json = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    def arr(key: String): Seq[String] = {
      val i = json.indexOf("\"" + key + "\"")
      val s = json.indexOf('[', i); val e = json.indexOf(']', s)
      val body = json.substring(s + 1, e).trim
      if (body.isEmpty) Seq.empty
      else body.split(",").map(_.trim).toSeq
    }
    val features = arr("features").map(_.stripPrefix("\"").stripSuffix("\"")
      .replace("\\\"", "\"").replace("\\\\", "\\"))
    val coef = arr("coef").map(_.toDouble).toArray
    val i = json.indexOf("\"intercept\"")
    val intercept = json.substring(json.indexOf(':', i) + 1)
      .takeWhile(c => c != '}' && c != ',').trim.toDouble
    Ols.Model(features, coef, intercept)
  }
}
