package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-divergent CSV normalization + union — the reference's core ETL
  * (`src/etl.py:13-114`) re-expressed as lazy plan builders.
  *
  * Five World-Happiness CSVs with divergent headers are forced into one
  * canonical schema: per-year rename maps (only keys present are
  * renamed, `etl.py:79-80`), literal Year injection for files lacking it
  * (`etl.py:49,61,73`), projection to the canonical subset
  * (`etl.py:83-84`), and coerce-to-null numeric casts (`etl.py:87-92` —
  * Spark 4 ANSI mode means `try_cast`, which turns the 2018 "N/A" cell
  * into the dataset's single null). Frames are unioned BY NAME
  * (`pd.concat`, `etl.py:103-107`).
  *
  * Scale note: each per-year plan is a projection+cast pipeline fully
  * fused by whole-stage codegen; `unionByName` is a zero-shuffle
  * concatenation of partitions, so the whole ETL is one scan per file.
  */
object Normalize {

  val IdCols: Seq[String] = Seq("Country", "Year")
  val Features: Seq[String] = Seq(
    "GDP per capita", "Social support", "Healthy life expectancy",
    "Freedom", "Perceptions of corruption")
  val Target: String = "Happiness Score"
  val Canonical: Seq[String] = IdCols ++ Features :+ Target

  /** Per-year rename maps, verbatim from `src/etl.py:38-76`. */
  val renames: Map[Int, Map[String, String]] = {
    val m2015 = Map(
      "Economy (GDP per Capita)" -> "GDP per capita",
      "Family" -> "Social support",
      "Health (Life Expectancy)" -> "Healthy life expectancy",
      "Trust (Government Corruption)" -> "Perceptions of corruption")
    val m2017 = Map(
      "Happiness.Score" -> "Happiness Score",
      "Economy..GDP.per.Capita." -> "GDP per capita",
      "Family" -> "Social support",
      "Health..Life.Expectancy." -> "Healthy life expectancy",
      "Trust..Government.Corruption." -> "Perceptions of corruption")
    val m2018 = Map(
      "Country or region" -> "Country",
      "Score" -> "Happiness Score",
      "Freedom to make life choices" -> "Freedom")
    Map(2015 -> m2015, 2016 -> m2015, 2017 -> m2017, 2018 -> m2018, 2019 -> m2018)
  }

  /** Normalize one raw per-year frame into the canonical schema.
    * Rename only the columns actually present (`etl.py:79`), inject the
    * year when the file lacks it, keep only available canonical columns,
    * and cast with coerce-to-null semantics. */
  def normalizeYear(raw: DataFrame, yr: Int): DataFrame = {
    val present = raw.columns.toSet
    val renamed = raw.withColumnsRenamed(renames(yr).filter { case (k, _) => present(k) })
    val withYear =
      if (renamed.columns.contains("Year")) renamed
      else renamed.withColumn("Year", lit(yr))
    val keep = Canonical.filter(withYear.columns.contains)
    val projected = withYear.select(keep.map(col): _*)
    val casted = projected.columns.foldLeft(projected) { (df, c) =>
      c match {
        case "Country" => df.withColumn(c, col(c).cast(StringType))
        case "Year" => df.withColumn(c, expr("try_cast(Year AS INT)"))
        case _ => df.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)"))
      }
    }
    casted
  }

  /** Read one raw CSV (header row, everything as string — casts are the
    * normalizer's job, exactly like pandas' post-read coercion). The
    * default quote handles the fully-quoted 2017 file. */
  def readYearCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  /** The reference's `load_unified()` (`etl.py:97-114`): five per-year
    * reads, normalized, unioned by name with missing-column tolerance. */
  def loadUnified(spark: SparkSession, dataDir: String,
                  years: Seq[Int] = 2015 to 2019): DataFrame =
    years
      .map(y => normalizeYear(readYearCsv(spark, s"$dataDir/$y.csv"), y))
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Driver-side schema-intersection metadata op (EDA cell 2): the
    * column sets shared by all years. */
  def sharedColumns(dfs: Seq[DataFrame]): Set[String] =
    dfs.map(_.columns.toSet).reduce(_ intersect _)
}
