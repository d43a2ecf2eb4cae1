package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Exact row counts without a cluster job when the plan allows it.
  *
  * Operators that SIZE themselves from the corpus row count (SemDeDup's
  * sqrt-n cluster count, IVF's sqrt-n cell count) need `n` before they can
  * build their plan — an eager `df.count()` at plan-construction time.
  * When the input is a bare unfiltered parquet scan (the normal case: a
  * curated corpus read straight from storage), that count is already
  * sitting in the parquet footers; launching a scan job for it costs a
  * full job-launch round trip (~0.2 s locally, a scheduler round trip on
  * a cluster) to learn a number the metadata states outright.
  *
  * [[of]] reads the footers driver-side in that case and falls back to
  * `df.count()` for any plan with filters/joins/aggregates (where footer
  * counts would be WRONG, not just slow). Footer reads are capped at
  * [[maxFooterFiles]] files — beyond that the serial driver-side footer
  * walk loses to one parallel metadata-only scan job, and a table that
  * big should carry catalog statistics anyway.
  */
object RowCounts {

  private val maxFooterFiles = 256

  /** Exact row count of `df`: parquet footer metadata when the optimized
    * plan is a bare (possibly column-pruned) parquet scan, else
    * `df.count()`. Always current — footers are re-read per call (they are
    * a few KB each), so a rewritten table is never served a stale count.
    */
  def of(df: DataFrame): Long =
    bareParquetRelation(df.queryExecution.optimizedPlan)
      .flatMap(footerCount(_, df)).getOrElse(df.count())

  /** UPPER BOUND on `df`'s row count with ZERO jobs, or None when no
    * bound is derivable. Walks the optimized plan through row-count-
    * preserving (Project) and row-count-REDUCING (Filter) operators down
    * to a parquet scan (footer count) or a local relation (in-memory
    * size); anything else — joins, generates, unions, opaque sources —
    * yields None. For sizing decisions of the form "is this input small
    * enough to skip scale machinery", an upper bound is the safe
    * direction: a filtered scan may be far smaller, never bigger.
    */
  def upperBound(df: DataFrame): Option[Long] =
    bound(df.queryExecution.optimizedPlan, df)

  private def bound(plan: LogicalPlan, df: DataFrame): Option[Long] = plan match {
    case p: Project => bound(p.child, df) // projections are 1:1
    case f: Filter => bound(f.child, df) // filters only shrink
    case l: LocalRelation => Some(l.data.length.toLong)
    case lr: LogicalRelation =>
      lr.relation match {
        case rel: HadoopFsRelation if rel.fileFormat.isInstanceOf[ParquetFileFormat] =>
          footerCount(rel, df)
        case _ => None
      }
    case _ => None
  }

  private def footerCount(rel: HadoopFsRelation, df: DataFrame): Option[Long] = {
    val files = rel.location.inputFiles
    if (files.isEmpty || files.length > maxFooterFiles) None
    else {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = df.sparkSession.sessionState.newHadoopConf()
      try Some(files.iterator.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
        try r.getRecordCount finally r.close()
      }.sum)
      catch { case scala.util.control.NonFatal(_) => None } // unreadable footer -> scan job
    }
  }

  /** The HadoopFsRelation when the plan is exactly a parquet scan with no
    * row-changing operator above it. Attribute-only projections are
    * row-count-neutral and stripped; ANYTHING else (Filter, Join, ...)
    * disqualifies — correctness over cleverness.
    */
  private def bareParquetRelation(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        bareParquetRelation(child)
      case lr: LogicalRelation =>
        lr.relation match {
          case rel: HadoopFsRelation if rel.fileFormat.isInstanceOf[ParquetFileFormat] =>
            Some(rel)
          case _ => None
        }
      case _ => None
    }
}
