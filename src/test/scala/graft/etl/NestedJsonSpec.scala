package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S4 with the reference's real shape: the Dataverse metadata document
  * (FIXTURES.md §2) — structs nested ~5 deep, array<struct>, inferred,
  * then navigated with dotted paths and explode.
  */
class NestedJsonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val doc1 =
    """{"authority":"10.7910","identifier":"DVN/EXAMPLE","publisher":"Harvard Dataverse",
      |"datasetVersion":{"files":[
      | {"categories":["Data"],"dataFile":{"checksum":{"type":"MD5","value":"aa11"},
      |  "contentType":"text/csv","filename":"2008.csv.bz2","filesize":39277452}},
      | {"categories":["Data"],"dataFile":{"checksum":{"type":"MD5","value":"bb22"},
      |  "contentType":"text/csv","filename":"2007.csv.bz2","filesize":70285819}}],
      |"metadataBlocks":{"citation":{"fields":[
      | {"multiple":false,"typeClass":"primitive","typeName":"title","value":"Flights"}]}}}}"""
      .stripMargin.replaceAll("\n", "")
  private val doc2 =
    """{"authority":"10.7910","identifier":"DVN/OTHER","publisher":"Harvard Dataverse",
      |"datasetVersion":{"files":[
      | {"categories":["Docs"],"dataFile":{"checksum":{"type":"MD5","value":"cc33"},
      |  "contentType":"application/json","filename":"meta.json","filesize":12345}}],
      |"metadataBlocks":{"citation":{"fields":[
      | {"multiple":false,"typeClass":"primitive","typeName":"title","value":"Other"}]}}}}"""
      .stripMargin.replaceAll("\n", "")

  test("full recorded Dataverse schema golden: every top-level field and nested type infers as recorded") {
    // The COMPLETE recorded shape (.dbc pos=9.0, FIXTURES.md §2): all
    // seven top-level scalars plus the two deep nests, with the
    // recorded types — id/filesize long, multiple boolean, checksum a
    // struct 5 levels down. This pins spark.read.json inference
    // against the reference's golden, not just a representative nest.
    val doc =
      """{"authority":"10.7910","id":3038542,"identifier":"DVN/HG7NV7",
        |"persistentUrl":"https://doi.org/10.7910/DVN/HG7NV7","protocol":"doi",
        |"publicationDate":"2008-10-06","publisher":"Harvard Dataverse",
        |"datasetVersion":{"files":[
        | {"categories":["Data"],"dataFile":{"checksum":{"type":"MD5","value":"ab12"},
        |  "contentType":"text/x-bzip2","creationDate":"2016-06-14","filename":"2008.csv.bz2",
        |  "filesize":113753229,"md5":"ab12","persistentId":""}}],
        |"metadataBlocks":{"citation":{"fields":[
        | {"multiple":false,"typeClass":"primitive","typeName":"title","value":"Data Expo 2009: Airline on time data"}]}}}}"""
        .stripMargin.replaceAll("\n", "")
    val dir = java.nio.file.Files.createTempDirectory("graft_dataverse").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "metadata.jsonl"), doc + "\n")
    val df = Sources.json(spark, dir)
    val top = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(top.keySet == Set("authority", "id", "identifier", "persistentUrl",
      "protocol", "publicationDate", "publisher", "datasetVersion"))
    Seq("authority", "identifier", "persistentUrl", "protocol",
      "publicationDate", "publisher").foreach(c => assert(top(c) == StringType, c))
    assert(top("id") == LongType)
    val fileStruct = top("datasetVersion").asInstanceOf[StructType]("files")
      .dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    val dataFile = fileStruct("dataFile").dataType.asInstanceOf[StructType]
    assert(dataFile.fieldNames.toSet == Set("checksum", "contentType",
      "creationDate", "filename", "filesize", "md5", "persistentId"))
    assert(dataFile("filesize").dataType == LongType)
    assert(dataFile("checksum").dataType.asInstanceOf[StructType]
      .fieldNames.toSet == Set("type", "value"))
    val fields = top("datasetVersion").asInstanceOf[StructType]("metadataBlocks")
      .dataType.asInstanceOf[StructType]("citation")
      .dataType.asInstanceOf[StructType]("fields")
      .dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(fields("multiple").dataType == BooleanType)
    assert(fields("value").dataType == StringType)
    // 5-deep dotted navigation works end-to-end on the recorded path.
    val chk = df.select(
        explode(col("datasetVersion.files")).as("f"))
      .select(col("f.dataFile.checksum.type").as("t"),
        col("f.dataFile.filesize").as("sz")).first()
    assert(chk.getString(0) == "MD5" && chk.getLong(1) == 113753229L)
  }

  test("schema inference discovers the nested struct/array shape and paths navigate it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nested").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "metadata.jsonl"), doc1 + "\n" + doc2 + "\n")
    val df = Sources.json(spark, dir)
    // Inferred: datasetVersion.files is array<struct> with a nested
    // checksum struct — the recorded .dbc pos=9.0 shape.
    val files = df.schema("datasetVersion").dataType.asInstanceOf[StructType]("files")
    val fileStruct = files.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val checksum = fileStruct("dataFile").dataType.asInstanceOf[StructType]("checksum")
    assert(checksum.dataType.isInstanceOf[StructType])
    assert(fileStruct("categories").dataType ==
      ArrayType(StringType, containsNull = true))
    // Dotted-path + explode navigation: per-file sizes across documents.
    val sizes = df
      .select(col("identifier"),
        explode(col("datasetVersion.files")).as("f"))
      .select(col("identifier"),
        col("f.dataFile.filename").as("filename"),
        col("f.dataFile.filesize").as("filesize"))
      .orderBy(col("filename"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(sizes.toSeq == Seq(
      ("2007.csv.bz2", 70285819L), ("2008.csv.bz2", 39277452L),
      ("meta.json", 12345L)))
    // Aggregate over the exploded array: total archive bytes per doc.
    val totals = df.select(col("identifier"),
        aggregate(col("datasetVersion.files"),
          lit(0L), (acc, f) => acc + f.getField("dataFile").getField("filesize"))
          .as("total"))
      .orderBy(col("identifier"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(totals.toSeq == Seq(
      ("DVN/EXAMPLE", 39277452L + 70285819L), ("DVN/OTHER", 12345L)))
  }
}
