package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Union across frames whose schemas have DRIFTED — the daily-batch
  * reality of a long-lived ingest: yesterday's writer had no `lang`
  * column, an upstream migration widened `user_id` from int to bigint,
  * and the consolidated read still has to produce one coherent frame.
  *
  * `unionByName(allowMissingColumns = true)` handles absence but refuses
  * type drift; a naive `union` silently matches columns by POSITION. This
  * operator resolves both, with the conservatism a data pipeline wants:
  *
  *  - column set = first-appearance-ordered union of all frames' columns;
  *  - a column missing from a frame becomes typed NULLs;
  *  - numeric types widen along the lossless ladder (byte → short → int →
  *    long; float → double; integral + fractional → double — the one
  *    lossy-for-huge-longs step, same as Spark/DuckDB UNION coercion);
  *    date widens to timestamp; identical types pass through;
  *  - anything else (string vs numeric, struct drift, decimal scale
  *    clashes) is an ERROR naming the column and both types — silent
  *    stringification is how corrupt corpora happen.
  *
  * Scale shape: pure projection on each input (casts + null literals) over
  * a `unionByName` — no shuffle, no driver data movement; schema work is
  * O(#columns) metadata on the driver.
  */
object SchemaEvolution {

  private def integral(t: DataType): Boolean =
    t == ByteType || t == ShortType || t == IntegerType || t == LongType

  /** The widened type for two observed types of the same column name, or
    * None if they cannot merge losslessly(-ish, see above).
    */
  private[graft] def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (x, y) if integral(x) && integral(y) =>
      val ladder = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
      Some(ladder(math.max(ladder.indexOf(x), ladder.indexOf(y))))
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case (x, FloatType | DoubleType) if integral(x) => Some(DoubleType)
    case (FloatType | DoubleType, y) if integral(y) => Some(DoubleType)
    case (DateType, TimestampType) | (TimestampType, DateType) => Some(TimestampType)
    case _ => None
  }

  def unionWithEvolution(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionWithEvolution needs at least one frame")
    // first-appearance column order; widened type per name
    val resolved = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    for (df <- dfs; f <- df.schema.fields) {
      resolved.get(f.name) match {
        case None => resolved += f.name -> f.dataType
        case Some(t) =>
          resolved += f.name -> widen(t, f.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"unionWithEvolution: column '${f.name}' has irreconcilable types " +
                s"${t.simpleString} vs ${f.dataType.simpleString} — cast explicitly " +
                "(silent coercion between these would corrupt data)"))
      }
    }
    val target = resolved.toSeq
    dfs.map { df =>
      val present = df.columns.toSet
      df.select(target.map { case (name, t) =>
        if (present.contains(name)) col(name).cast(t).as(name)
        else lit(null).cast(t).as(name)
      }: _*)
    }.reduce(_ unionByName _)
  }
}
