package graft.engine

import org.apache.spark.sql.{DataFrame, Row}

/** Key-based JDBC upsert — the reference's MySQL sink semantics: its Flink
  * table declares the feature keys as the PRIMARY KEY
  * (ref: python/feathub/processors/flink/table_builder/mysql_utils.py:58),
  * which puts Flink's JDBC connector in upsert mode (INSERT … ON DUPLICATE
  * KEY UPDATE on the MySQL dialect). Spark's jdbc writer only has
  * append/overwrite, so the upsert runs as a portable per-partition
  * UPDATE-then-INSERT inside one transaction per batch — dialect-neutral
  * SQL92 that works on MySQL, Postgres and Derby alike (the vendor
  * one-statement forms — ON DUPLICATE KEY / ON CONFLICT / MERGE — are a
  * dialect swap inside this one function if round-trips ever dominate).
  *
  * 100 TB shape: the frame should be the LATEST row per key before it gets
  * here (GraftClient's online-materialize path already reduces to
  * latest-per-key); each partition holds one connection and flushes in
  * `batchSize` transactions, so DB round-trips are 2·rows/batch worst
  * case, rows/batch when keys mostly exist. Parallelism = partitions;
  * repartition by key first if the target locks per-row on a hot page.
  */
object JdbcUpsert {

  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      user: String,
      password: String,
      keys: Seq[String],
      batchSize: Int = 500): Unit = {
    require(keys.nonEmpty, "JDBC upsert requires table keys")
    val cols = df.columns.toSeq
    require(keys.forall(cols.contains), s"keys $keys not all present in $cols")
    val valueCols = cols.filterNot(keys.contains)
    require(valueCols.nonEmpty, s"upsert needs at least one non-key column in $cols")
    // identifiers must quote the way Spark's own jdbc writer created the
    // table (backticks on MySQL, double quotes elsewhere) — use the same
    // dialect registry the writer uses. The table name is trickier: Spark's
    // writer emits it UNQUOTED in CREATE TABLE, so the DB case-folds plain
    // names (Derby/Postgres store UP_TBL for "up_tbl") and quoting here
    // would miss them — so plain `word(.word)*` names stay unquoted to
    // match the writer, and only parts with special characters get the
    // dialect quote (which also closes the injection hole).
    val q: String => String =
      org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier
    val qTable = table.split('.')
      .map(p => if (p.matches("[A-Za-z_][A-Za-z0-9_]*")) p else q(p))
      .mkString(".")
    val updateSql =
      s"UPDATE $qTable SET ${valueCols.map(c => s"${q(c)} = ?").mkString(", ")} " +
        s"WHERE ${keys.map(k => s"${q(k)} = ?").mkString(" AND ")}"
    val insertSql =
      s"INSERT INTO $qTable (${cols.map(q).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val colIdx = cols.zipWithIndex.toMap
    // NULLs must bind as typed setNull: Derby rejects setObject(i, null)
    // outright (SQLState XJ021) and other drivers need the type hint —
    // the same reason Spark's own jdbc writer binds from the row schema
    val sqlTypes: Map[String, Int] = {
      import java.sql.Types
      import org.apache.spark.sql.types._
      df.schema.fields.map(f => f.name -> (f.dataType match {
        case LongType => Types.BIGINT
        case IntegerType => Types.INTEGER
        case ShortType => Types.SMALLINT
        case ByteType => Types.TINYINT
        case DoubleType => Types.DOUBLE
        case FloatType => Types.REAL
        case BooleanType => Types.BOOLEAN
        case _: DecimalType => Types.DECIMAL
        case TimestampType | TimestampNTZType => Types.TIMESTAMP
        case DateType => Types.DATE
        case BinaryType => Types.BINARY
        case _ => Types.VARCHAR
      })).toMap
    }
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url, user, password)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          def bind(st: java.sql.PreparedStatement, i: Int, c: String, row: Row): Unit = {
            val v = row.get(colIdx(c))
            if (v == null) st.setNull(i, sqlTypes(c)) else st.setObject(i, v)
          }
          var inTx = 0
          it.foreach { row =>
            // a NULL key never matches `k = ?` (SQL null-rejecting
            // equality), so the row would take the insert branch on EVERY
            // run and silently accumulate duplicates — fail loud instead
            keys.foreach { k =>
              if (row.get(colIdx(k)) == null)
                throw new IllegalArgumentException(
                  s"JDBC upsert key '$k' is NULL in row $row: null keys cannot " +
                    "match an UPDATE predicate and would duplicate on rerun")
            }
            valueCols.zipWithIndex.foreach { case (c, i) => bind(upd, i + 1, c, row) }
            keys.zipWithIndex.foreach { case (k, i) =>
              bind(upd, valueCols.size + i + 1, k, row)
            }
            if (upd.executeUpdate() == 0) {
              cols.zipWithIndex.foreach { case (c, i) => bind(ins, i + 1, c, row) }
              ins.executeUpdate()
            }
            inTx += 1
            if (inTx >= batchSize) { conn.commit(); inTx = 0 }
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
