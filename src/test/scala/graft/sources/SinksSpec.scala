package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class SinksSpec extends SparkSpec {

  test("sized writer bounds file count and rows per file") {
    val out = Files.createTempDirectory("graft_sized").toString + "/li"
    Sinks.writeParquetSized(Tables.lineitem(spark, sf), out,
      targetFiles = 2, maxRecordsPerFile = 2000)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    // 2 partitions × ceil(rows/partition / 2000) files each
    assert(files.length >= 2, s"got ${files.length} files")
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 2000, s"file ${f.getName} has $n rows")
    }
    assert(spark.read.parquet(out).count() == Tables.lineitem(spark, sf).count())
  }

  test("ORC round-trip preserves schema and values; filters push into the scan") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_orc").toString + "/li"
    val src = Tables.lineitem(spark, sf)
    Sinks.writeOrc(src, out, targetFiles = 2)
    val back = Sinks.readOrc(spark, out)
    assert(back.schema == src.schema, "ORC round-trip keeps the exact schema")
    assert(back.count() == src.count())
    val filtered = back.filter(col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("l_quantity"),
      s"ORC scan must accept the pushed filter:\n$plan")
    assert(!plan.contains("l_extendedprice"), "unused columns pruned from the ORC read")
    assert(filtered.count() == src.filter(col("l_quantity") > 45).count())
  }

  test("clustered writer sorts within files for row-group pruning") {
    val out = Files.createTempDirectory("graft_clustered").toString + "/li"
    Sinks.writeParquetClustered(Tables.lineitem(spark, sf), out, 2, Seq("l_shipdate"))
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    files.foreach { f =>
      // the re-read column is TIMESTAMP_NTZ; ISO strings sort chronologically
      val dates = spark.read.parquet(f.getPath)
        .selectExpr("CAST(l_shipdate AS STRING)").collect().map(_.getString(0))
      assert(dates.sameElements(dates.sorted), s"${f.getName} not sorted")
    }
  }
}
