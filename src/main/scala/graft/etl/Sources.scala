package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source operators (reference S3–S8, SURVEY §2.1). All of these are
  * thin, declarative wrappers over Spark's readers so Catalyst keeps
  * pushdown/pruning; nothing here materializes driver-side except the
  * (small) directory listing.
  */
object Sources {

  /** S5: CSV scan with explicit schema, header, PERMISSIVE nulls
    * (malformed cell → null — the reference relies on this for TailNum).
    * `.bz2` and other splittable codecs are handled natively by the
    * reader, so the reference's shell-decompress step (S2) is unneeded.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** S4: schema-inferring JSON scan (nested structs/arrays). */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S7: parquet scan. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S8: integer range source (date-dimension backbone). */
  def range(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n).toDF("id")

  /** S3: directory listing with the reference's 4-column shape
    * (path, name, size, modificationTime) — dbutils.fs.ls equivalent
    * via the Hadoop FileSystem API.
    */
  def ls(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = fs.listStatus(p).toSeq.map { st =>
      (st.getPath.toString, st.getPath.getName, st.getLen, st.getModificationTime)
    }
    spark.createDataFrame(rows)
      .toDF("path", "name", "size", "modificationTime")
  }
}
