package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q1 scan-floor attribution (VERDICT r11 task 8): how much of
  * q1_pricing_summary's sf0.1 wall is the single-row-group lineitem file
  * (decode serialized into one task no matter the planned splits), vs the
  * decimal projection + int128 aggregate the gate actually exists to
  * exercise?
  *
  * Three timed shapes, same session, warm reps:
  *   a. q1 as benched (driver testdata: ONE row group);
  *   b. a bare decode of exactly q1's columns off the same file — the
  *      irreducible scan floor of shape (a);
  *   c. q1 off a rewrite of lineitem into many row groups (what any
  *      production writer produces; written once to /tmp) — the same
  *      plan when the scan CAN parallelize.
  * (c) vs (a) is the testdata artifact; (b) vs (a) is how much of (a)
  * even touches the aggregate. Findings recorded in NOTES.md.
  *
  * Usage: runMain graft.tools.Q1Floor [sfDir] [reps]
  */
object Q1Floor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-q1-floor")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.configure(spark)

    def time(label: String)(f: => Unit): Double = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val best = walls.min
      println(f"[q1floor] $label%-28s best=$best%.3f s  (${walls.map(w => f"$w%.3f").mkString(", ")})")
      best
    }

    val q1 = graft.SparkEntry.queries("q1_pricing_summary")
    time("q1 single-row-group")(q1(spark, sfDir).collect())

    // bare decode floor: read exactly q1's columns, fold each row into a
    // cheap aggregate so nothing is optimized away and nothing shuffles
    val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("bare column decode") {
      li.select(cols.map(col): _*)
        .select(sum(xxhash64(cols.map(col): _*)))
        .collect()
    }

    // many-row-group rewrite (a production writer's file): same single
    // file per table semantics, 24 row groups like scale_up.py targets
    val tmp = java.nio.file.Files.createTempDirectory("q1floor").toString
    li.repartition(1).write
      .option("parquet.block.size", (li.inputFiles.length.max(1) *
        java.nio.file.Files.size(java.nio.file.Paths.get(
          s"$sfDir/lineitem.parquet")) / 24).toString)
      .parquet(s"$tmp/liMany")
    // build a dir that q1's Tables.lineitem can read: symlink the rest
    val sf = java.nio.file.Paths.get(sfDir)
    val alt = java.nio.file.Paths.get(tmp, "sf")
    java.nio.file.Files.createDirectory(alt)
    java.nio.file.Files.list(sf).forEach { p =>
      if (p.getFileName.toString != "lineitem.parquet")
        java.nio.file.Files.createSymbolicLink(alt.resolve(p.getFileName), p)
    }
    val manyFile = java.nio.file.Files.list(
        java.nio.file.Paths.get(tmp, "liMany"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(manyFile, alt.resolve("lineitem.parquet"))
    println(s"[q1floor] rewrote lineitem -> ${alt.resolve("lineitem.parquet")}")

    time("q1 many-row-group")(q1(spark, alt.toString).collect())
    time("bare decode many-rg") {
      spark.read.parquet(s"${alt}/lineitem.parquet")
        .select(cols.map(col): _*)
        .select(sum(xxhash64(cols.map(col): _*)))
        .collect()
    }
    // full split: a 10.8 MB file under default maxPartitionBytes/openCost
    // still plans ~3 splits; force row-group-grained splits to see the
    // decode floor at genuine 32-way parallelism
    spark.conf.set("spark.sql.files.maxPartitionBytes", 512L * 1024)
    spark.conf.set("spark.sql.files.openCostInBytes", 64L * 1024)
    time("q1 many-rg full-split")(q1(spark, alt.toString).collect())
    time("bare decode full-split") {
      spark.read.parquet(s"${alt}/lineitem.parquet")
        .select(cols.map(col): _*)
        .select(sum(xxhash64(cols.map(col): _*)))
        .collect()
    }
    spark.stop()
  }
}
