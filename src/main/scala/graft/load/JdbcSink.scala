package graft.load

import java.sql.{DriverManager, SQLException}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.current_timestamp
import org.apache.spark.sql.types._

/** Relational (JDBC) sink for the 9-table star schema — the reference's
  * Postgres load stage (/root/reference/src/etl/load.py:76-151,
  * /root/reference/src/config/db.py:250-257) re-shaped for distributed
  * execution:
  *
  *  - DDL bootstrap once from the driver (S12);
  *  - child/parent writes run per fic_id-aligned CHUNK inside one
  *    transaction (U9): each task streams its partition in chunks that
  *    never split a fic_id, deletes the chunk's fic_ids (U2 cascade ≡
  *    idempotence), batch-inserts, commits. Because the delete+insert
  *    is keyed by deterministic fic_id (natural-key hash), Spark's
  *    at-least-once task retries are safe — a retried task simply
  *    rewrites the same keys (SURVEY §7.4.5). Memory per task is
  *    O(chunk), not O(partition);
  *  - rows are routed so ALL tables of one fic_id land in the same
  *    task's chunk: repartition on fic_id + sortWithinPartitions makes
  *    one document's rows adjacent;
  *  - every table carries a `created_at` audit timestamp, mirroring the
  *    reference's `server_default NOW()` on each model (db.py:59,100).
  *
  * Tested against embedded Derby; the SQL is deliberately vanilla
  * (VARCHAR/DOUBLE/BIGINT/CLOB + parameterized inserts) so a Postgres
  * URL drops in unchanged.
  */
object JdbcSink {

  private def sqlType(f: StructField): String = f.dataType match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    // the full document rides in raw_json.json_data (JSONB in the
    // reference, db.py:204) — unbounded, so LOB storage, not VARCHAR
    case _ if f.name == "json_data" => "CLOB"
    case _ => "VARCHAR(32000)"
  }

  /** S12: CREATE TABLE IF NOT EXISTS from the DataFrame schema. */
  def ensureTable(url: String, table: String, schema: StructType): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val cols = schema.fields
        .map(f => s"${f.name} ${sqlType(f)}").mkString(", ")
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table ($cols)")
      catch { case _: SQLException => /* exists */ }
      finally st.close()
    } finally conn.close()
  }

  /** Group a partition's rows into chunks of ≥ chunkSize rows that never
    * split a fic_id (input must be sorted by fic_id within the
    * partition): a chunk owns every row of its fic_ids, so its
    * delete+insert transaction is independently idempotent — a later
    * chunk's delete can never erase an earlier chunk's inserts.
    */
  private def ficChunks(rows: Iterator[Row], ficIdx: Int,
      chunkSize: Int): Iterator[Seq[Row]] =
    new Iterator[Seq[Row]] {
      private val it = rows.buffered
      def hasNext: Boolean = it.hasNext
      def next(): Seq[Row] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (it.hasNext && buf.size < chunkSize) buf += it.next()
        while (it.hasNext && buf.nonEmpty &&
            it.head.getLong(ficIdx) == buf.last.getLong(ficIdx))
          buf += it.next()
        buf.toSeq
      }
    }

  /** Transactional, idempotent overwrite-by-key append: per fic_id-
    * aligned chunk, one transaction that deletes the chunk's fic_ids
    * then batch-inserts its rows. The partition streams — only the
    * current chunk is materialized.
    */
  def upsertByFicId(df: DataFrame, url: String, table: String,
      batchSize: Int = 500): Unit = {
    val sorted = df.sortWithinPartitions(df.col("fic_id"))
    val schema = sorted.schema
    ensureTable(url, table, schema)
    val names = schema.fieldNames
    val insertSql = s"INSERT INTO $table (${names.mkString(",")}) " +
      s"VALUES (${names.map(_ => "?").mkString(",")})"
    val ficIdx = schema.fieldIndex("fic_id")

    sorted.foreachPartition { (rows: Iterator[Row]) =>
      ficChunks(rows, ficIdx, batchSize).foreach { chunk =>
        // Transient-conflict retry: concurrent chunk transactions can
        // deadlock / hit serialization failures (Derby table-lock
        // escalation, Postgres 40P01). The transaction is idempotent
        // (delete+insert by key), so retrying whole is safe, and at
        // chunk granularity the replay cost is bounded by batchSize.
        var attempt = 0
        var done = false
        while (!done) {
          attempt += 1
          try {
            writeTxn(url, table, insertSql, schema, names, ficIdx, chunk, batchSize)
            done = true
          } catch {
            case _: SQLException if attempt < 5 =>
              Thread.sleep(50L * attempt * attempt)
          }
        }
      }
    }
  }

  private def writeTxn(url: String, table: String, insertSql: String,
      schema: StructType, names: Array[String], ficIdx: Int,
      chunk: Seq[Row], batchSize: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val del = conn.prepareStatement(s"DELETE FROM $table WHERE fic_id = ?")
      try {
        chunk.map(_.getLong(ficIdx)).distinct.foreach { id =>
          del.setLong(1, id); del.addBatch()
        }
        del.executeBatch()
      } finally del.close()

      val ins = conn.prepareStatement(insertSql)
      try {
        var inBatch = 0
        chunk.foreach { row =>
          var i = 0
          while (i < names.length) {
            val v = row.get(i)
            if (v == null) ins.setObject(i + 1, null)
            else schema.fields(i).dataType match {
              case LongType => ins.setLong(i + 1, row.getLong(i))
              case IntegerType => ins.setInt(i + 1, row.getInt(i))
              case DoubleType => ins.setDouble(i + 1, row.getDouble(i))
              case BooleanType => ins.setBoolean(i + 1, row.getBoolean(i))
              case TimestampType => ins.setTimestamp(i + 1, row.getTimestamp(i))
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

  /** Read an existing table as a DataFrame, or None if absent. */
  def readTable(spark: org.apache.spark.sql.SparkSession, url: String,
      table: String): Option[DataFrame] = {
    val conn = DriverManager.getConnection(url)
    val exists =
      try {
        val st = conn.createStatement()
        try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); true }
        catch { case _: SQLException => false }
        finally st.close()
      } finally conn.close()
    if (!exists) None
    else Some(spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load())
  }

  /** Distributed cascade delete (r4, VERDICT #4): per partition of the
    * id frame, one connection batch-deletes its ids — no driver
    * collect, no one-statement-at-a-time replay. The frame is small
    * (replaced docs per batch) but the pattern is the one that still
    * works when it isn't.
    */
  def deleteByIds(url: String, table: String, ids: DataFrame): Unit = {
    val idIdx = ids.schema.fieldIndex("fic_id")
    ids.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          val st = conn.prepareStatement(s"DELETE FROM $table WHERE fic_id = ?")
          try {
            rows.foreach { r => st.setLong(1, r.getLong(idIdx)); st.addBatch() }
            st.executeBatch()
            ()
          } finally st.close()
        } catch {
          case _: SQLException => // table may not exist yet
        } finally conn.close()
      }
    }
  }

  /** Load a whole shredded document set: parents and children
    * partitioned on fic_id so each document's rows share a transaction
    * per table, each stamped with the load-time `created_at` audit
    * column (reference parity: server_default NOW() on every model).
    */
  def loadShredded(tables: Seq[(String, DataFrame)], url: String,
      partitions: Int = 8): Unit = {
    tables.foreach { case (name, df) =>
      val stamped =
        if (df.columns.contains("created_at")) df
        else df.withColumn("created_at", current_timestamp())
      upsertByFicId(stamped.repartition(partitions, df.col("fic_id")), url, name)
    }
  }
}
