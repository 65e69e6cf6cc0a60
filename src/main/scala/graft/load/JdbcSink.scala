package graft.load

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Relational (JDBC) sink for the 9-table star schema — the reference's
  * Postgres load stage (/root/reference/src/etl/load.py:76-151,
  * /root/reference/src/config/db.py:250-257) re-shaped for distributed
  * execution:
  *
  *  - DDL bootstrap once from the driver (S12);
  *  - child/parent writes run per PARTITION inside one transaction
  *    (U9): each task opens a connection, deletes the fic_ids it is
  *    about to write (U2 cascade ≡ idempotence), batch-inserts, commits.
  *    Because the delete+insert is keyed by deterministic fic_id
  *    (natural-key hash), Spark's at-least-once task retries are safe —
  *    a retried task simply rewrites the same keys (SURVEY §7.4.5);
  *  - rows are routed so ALL tables of one fic_id land in the same
  *    task's transaction when `repartitionByKey` is used upstream.
  *
  * Tested against embedded Derby; the SQL is deliberately vanilla
  * (VARCHAR/DOUBLE/BIGINT + parameterized inserts) so a Postgres URL
  * drops in unchanged.
  */
object JdbcSink {

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case _ => "VARCHAR(32000)" // full documents ride in raw_json.json_data
  }

  /** S12: CREATE TABLE IF NOT EXISTS from the DataFrame schema. */
  def ensureTable(url: String, table: String, schema: StructType): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val cols = schema.fields
        .map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table ($cols)")
      catch { case _: java.sql.SQLException => /* exists */ }
      finally st.close()
    } finally conn.close()
  }

  /** Transactional, idempotent overwrite-by-key append: per partition,
    * one transaction that deletes the partition's fic_ids then
    * batch-inserts its rows.
    */
  def upsertByFicId(df: DataFrame, url: String, table: String,
      batchSize: Int = 500): Unit = {
    val schema = df.schema
    ensureTable(url, table, schema)
    val names = schema.fieldNames
    val insertSql = s"INSERT INTO $table (${names.mkString(",")}) " +
      s"VALUES (${names.map(_ => "?").mkString(",")})"
    val ficIdx = schema.fieldIndex("fic_id")

    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val buffered = rows.toSeq // one partition's slice, bounded by upstream partitioning
        // Transient-conflict retry: concurrent partition transactions can
        // deadlock / hit serialization failures (Derby table-lock
        // escalation, Postgres 40P01). The transaction is idempotent
        // (delete+insert by key), so retrying whole is safe.
        var attempt = 0
        var done = false
        while (!done) {
          attempt += 1
          try {
            writeTxn(url, table, insertSql, schema, names, ficIdx, buffered, batchSize)
            done = true
          } catch {
            case e: java.sql.SQLException if attempt < 5 =>
              Thread.sleep(50L * attempt * attempt)
          }
        }
      }
    }
  }

  private def writeTxn(url: String, table: String, insertSql: String,
      schema: StructType, names: Array[String], ficIdx: Int,
      buffered: Seq[Row], batchSize: Int): Unit = {
    {
      {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(s"DELETE FROM $table WHERE fic_id = ?")
          try {
            buffered.map(_.getLong(ficIdx)).distinct.foreach { id =>
              del.setLong(1, id); del.addBatch()
            }
            del.executeBatch()
          } finally del.close()

          val ins = conn.prepareStatement(insertSql)
          try {
            var inBatch = 0
            buffered.foreach { row =>
              var i = 0
              while (i < names.length) {
                val v = row.get(i)
                if (v == null) ins.setObject(i + 1, null)
                else schema.fields(i).dataType match {
                  case LongType => ins.setLong(i + 1, row.getLong(i))
                  case IntegerType => ins.setInt(i + 1, row.getInt(i))
                  case DoubleType => ins.setDouble(i + 1, row.getDouble(i))
                  case BooleanType => ins.setBoolean(i + 1, row.getBoolean(i))
                  case _ => ins.setString(i + 1, String.valueOf(v))
                }
                i += 1
              }
              ins.addBatch(); inBatch += 1
              if (inBatch >= batchSize) { ins.executeBatch(); inBatch = 0 }
            }
            if (inBatch > 0) ins.executeBatch()
          } finally ins.close()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  /** Read an existing table as a DataFrame, or None if absent. */
  def readTable(spark: org.apache.spark.sql.SparkSession, url: String,
      table: String): Option[DataFrame] = {
    val conn = DriverManager.getConnection(url)
    val exists =
      try {
        val st = conn.createStatement()
        try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); true }
        catch { case _: java.sql.SQLException => false }
        finally st.close()
      } finally conn.close()
    if (!exists) None
    else Some(spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load())
  }

  /** Driver-side cascade delete of a small id set across one table. */
  def deleteByIds(url: String, table: String, ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(s"DELETE FROM $table WHERE fic_id = ?")
      try ids.foreach { id => st.setLong(1, id); st.addBatch() }
      finally { st.executeBatch(); st.close() }
    } catch {
      case _: java.sql.SQLException => // table may not exist yet
    } finally conn.close()
  }

  /** Load a whole shredded document set: parents and children
    * partitioned on fic_id so each document's rows share a transaction
    * per table.
    */
  def loadShredded(tables: Seq[(String, DataFrame)], url: String,
      partitions: Int = 8): Unit = {
    tables.foreach { case (name, df) =>
      upsertByFicId(df.repartition(partitions, df.col("fic_id")), url, name)
    }
  }
}
