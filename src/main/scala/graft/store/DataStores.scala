package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.{JdbcConfig, SourceType}

/** Sink layer (SURVEY.md §2.A A14–A16; §7 module 4).
  *
  * The reference's upsert assembled `DELETE FROM tgt USING staging WHERE
  * tgt.id = staging.id; INSERT INTO tgt SELECT * FROM staging` but only ever
  * printed it (`services/data_store.py:29-41`). Those semantics — staging
  * rows replace target rows with matching keys, all other target rows
  * survive — are made real here as a left-anti join + unionByName, which
  * Catalyst executes as one shuffled (or broadcast, when staging is small)
  * join with no driver round-trip. At 100 TB this is the MERGE pattern:
  * anti-join co-partitions on the key, so only the staging keys shuffle.
  */
object Upsert {
  def apply(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame =
    target.join(staging, keys, "left_anti").unionByName(staging)
}

/** CDC changelog application — the upsert generalized with deletes: keys
  * in the changelog are replaced by their LATEST image (by `seqCol`), and
  * keys whose latest op is 'D' are removed. One window pass over the
  * changelog + one anti-join + one union — same shuffle profile as
  * [[Upsert]].
  */
object ApplyChangelog {
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  /** `changelog` carries the target's columns plus `opCol` ∈ {I,U,D} and a
    * monotone `seqCol` ordering multiple entries per key (a CDC stream
    * routinely has several — insert then update then delete). Entries that
    * TIE on seqCol (e.g. one commit LSN shared by a batch) are resolved by
    * an EXPLICIT op priority — a delete wins over an update at the same
    * sequence number (the conservative read of "the key was deleted in
    * that commit") — then deterministically over the remaining columns,
    * never by partition order.
    */
  def apply(
      target: DataFrame,
      changelog: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: String = "op"): DataFrame = {
    val opPriority = when(col(opCol) === "D", 0).otherwise(1)
    val tieBreak = changelog.columns.toIndexedSeq
      .filterNot(c => c == seqCol || c == opCol || keys.contains(c))
      .map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc +: opPriority.asc +: tieBreak: _*)
    val latest = changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val survivors = latest.filter(col(opCol) =!= "D").drop(opCol, seqCol)
    target.join(changelog.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(survivors)
  }
}

/** CHANGE-FEED generation — the inverse of [[ApplyChangelog]]: diff two
  * snapshots of a keyed table into an I/U/D changelog. Keys only in the
  * new snapshot emit I with the new image, keys only in the old snapshot
  * emit D, keys in both whose non-key columns differ (null-safe) emit U —
  * unchanged rows emit nothing. One full-outer join on the key: the same
  * single-shuffle posture as the apply side, so diffing two 100 TB
  * snapshots is one co-partitioned pass. Law (PropertySpec):
  * `ApplyChangelog(old, changeFeed(old, new)) == new`.
  */
object ChangeFeed {
  import org.apache.spark.sql.functions._

  def apply(old: DataFrame, newer: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = old.columns.toSeq
    require(cols == newer.columns.toSeq, "snapshots must share a schema")
    val attrs = cols.filterNot(keys.contains)
    // per-side PRESENCE FLAGS, not key nullness: the join is null-safe
    // (<=>), so a legitimately-NULL key value matches its counterpart —
    // testing `o_key IS NULL` would mislabel that matched row as an
    // insert. A flag column is null-after-full-outer exactly when the
    // SIDE is absent, whatever the key values are.
    val o = old.select(cols.map(c => col(c).as(s"o_$c")) :+
      lit(true).as("o_present"): _*)
    val n = newer.select(cols.map(c => col(c).as(s"n_$c")) :+
      lit(true).as("n_present"): _*)
    val joinCond = keys.map(k => col(s"o_$k") <=> col(s"n_$k")).reduce(_ && _)
    val changed = attrs.map(a => !(col(s"o_$a") <=> col(s"n_$a")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(col("o_present").isNull, "I")
      .when(col("n_present").isNull, "D")
      .when(changed, "U")
    // emit the NEW image whenever the new side exists (coalesce would
    // resurrect the old value for an update that legitimately sets a
    // column to NULL); the old image only for deletes
    o.join(n, joinCond, "full_outer")
      .withColumn("op", op)
      .filter(col("op").isNotNull)
      .select(cols.map(c =>
        when(col("n_present").isNotNull, col(s"n_$c"))
          .otherwise(col(s"o_$c")).as(c)) :+ col("op"): _*)
  }
}

trait DataStore {
  /** ≙ abstract `DataStore.upsert_data` (`services/data_store.py:3-9`). */
  def upsert(staging: DataFrame): Unit
}

/** Parquet-target upsert store — the testdata-native sink. Writes the merged
  * result to a fresh directory then swaps, because overwriting an input path
  * in-place would race the lazy scan of the same path.
  */
final class ParquetStore(targetPath: String, keys: Seq[String]) extends DataStore {
  def upsert(staging: DataFrame): Unit = {
    val spark = staging.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val merged =
      if (fs.exists(target)) Upsert(spark.read.parquet(targetPath), staging, keys)
      else staging
    val tmp = new org.apache.hadoop.fs.Path(targetPath + "__tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap via rename-to-backup: the target is recoverable at every step
    // (a plain delete-then-rename loses the table if the rename fails or
    // the process dies between the two), and a failed rename must THROW —
    // Hadoop FileSystem.rename reports failure as `false`, and ignoring it
    // would leave the old data in place while reporting success
    val backup = new org.apache.hadoop.fs.Path(targetPath + "__bak")
    if (fs.exists(backup)) fs.delete(backup, true)
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, backup))
      throw new java.io.IOException(s"rename $target -> $backup failed")
    if (!fs.rename(tmp, target)) {
      if (hadTarget) fs.rename(backup, target) // best-effort restore
      throw new java.io.IOException(s"rename $tmp -> $target failed")
    }
    if (hadTarget) fs.delete(backup, true)
  }
}

/** JDBC staged upsert ≙ `PostgresDataStore.upsert_data`
  * (`services/data_store.py:14-41`): executors write the staging table in
  * parallel, then ONE driver-side transaction promotes it — delete matched,
  * insert all, drop staging — which the reference only printed. Statements
  * are dialect-portable (IN-subquery delete instead of Postgres
  * `DELETE USING`; transaction control via JDBC autocommit, not SQL text),
  * so the same store runs on Postgres/MySQL/MSSQL/Oracle/Derby.
  */
final class JdbcStore(
    cfg: JdbcConfig,
    table: String,
    key: String,
    // identifier quote — Spark's JDBC writer creates the staging table with
    // QUOTED (case-exact) column names, so the key must be quoted the same
    // way or an unquoted reference in the IN-subquery silently resolves to
    // the OUTER table's column and deletes every row; the INSERT's column
    // list is quoted for the same reason. Consequence: the TARGET table
    // must also be created with case-exact (quoted) column names matching
    // the DataFrame schema — an unquoted DDL on a case-folding database
    // (Derby/Oracle uppercase) will not match.
    // '"' is ANSI (Postgres/Oracle/MSSQL/Derby); MySQL needs "`".
    quote: String = "\"",
    // explicit staging DDL types ("order_id VARCHAR(16), n INT") — needed
    // when the writer's default type mapping is not comparable with the
    // target's (e.g. Derby maps StringType to CLOB, which cannot equal a
    // VARCHAR key in the delete's IN-subquery)
    stagingColumnTypes: Option[String] = None) extends DataStore {
  def upsert(staging: DataFrame): Unit = {
    val writer = staging.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", JdbcStore.stagingTableFor(table))
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
    stagingColumnTypes.foreach(writer.option("createTableColumnTypes", _))
    writer
      .mode(SaveMode.Overwrite)
      .save()
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.executeUpdate(JdbcStore.deleteMatchedSql(table, key, quote))
        st.executeUpdate(JdbcStore.insertAllSql(table, staging.columns.toSeq, quote))
        conn.commit()
        st.executeUpdate(JdbcStore.dropStagingSql(table))
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }

  /** EXACTLY-ONCE batch upsert for streaming foreachBatch sinks: the
    * batch id is recorded in a commit-log table INSIDE the same database
    * transaction that promotes the staging rows, so a batch either lands
    * fully (rows + commit record) or not at all — and a RETRY of an
    * already-committed batch id (Structured Streaming re-runs a batch
    * after a sink failure or a query restart) is detected from the log
    * and skipped before any work. This is the standard idempotent-JDBC
    * streaming sink: at-least-once delivery from the engine + a
    * transactional dedup log in the target = exactly-once effects.
    */
  def upsertBatch(staging: DataFrame, batchId: Long): Unit = {
    val commitTable = JdbcStore.commitTableFor(table)
    val conn0 = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      val md = conn0.getMetaData.getTables(null, null, "%", Array("TABLE"))
      var hasLog = false
      while (md.next()) {
        if (md.getString("TABLE_NAME").equalsIgnoreCase(commitTable)) hasLog = true
      }
      val st0 = conn0.createStatement()
      try {
        if (!hasLog)
          st0.executeUpdate(JdbcStore.createCommitLogSql(table, quote))
        val rs = st0.executeQuery(JdbcStore.commitProbeSql(table, batchId, quote))
        rs.next()
        if (rs.getInt(1) > 0) return // replay of a committed batch — no-op
      } finally st0.close()
    } finally conn0.close()
    // stage the rows (executor-parallel write, its own table)
    val writer = staging.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", JdbcStore.stagingTableFor(table))
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
    stagingColumnTypes.foreach(writer.option("createTableColumnTypes", _))
    writer.mode(SaveMode.Overwrite).save()
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.executeUpdate(JdbcStore.deleteMatchedSql(table, key, quote))
        st.executeUpdate(JdbcStore.insertAllSql(table, staging.columns.toSeq, quote))
        // the commit record rides in the SAME transaction as the promote
        st.executeUpdate(JdbcStore.commitRecordSql(table, batchId))
        conn.commit()
        st.executeUpdate(JdbcStore.dropStagingSql(table))
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }
}

/** Pure SQL-text builders for [[JdbcStore]] — factored out so the per-
  * dialect statement text is unit-testable against golden strings without
  * a live database (DialectSpec): identifier quoting is the one thing the
  * staged-upsert protocol varies by dialect, and a wrong quote fails
  * SILENTLY on a case-folding database (the unquoted key resolves against
  * the outer table and the delete wipes it — see the quote note on the
  * class).
  */
object JdbcStore {
  /** Identifier quote per dialect: MySQL defaults to backticks (ANSI_QUOTES
    * off); Postgres/Oracle/MSSQL/Derby accept the ANSI double quote.
    */
  def quoteFor(tpe: SourceType): String =
    if (tpe == SourceType.MySql) "`" else "\""

  def stagingTableFor(table: String): String = s"${table}_staging"
  def commitTableFor(table: String): String = s"${table}_commits"

  /** Delete target rows whose key appears in staging (dialect-portable
    * IN-subquery — Postgres `DELETE USING` is not).
    */
  def deleteMatchedSql(table: String, key: String, quote: String): String = {
    val qk = s"$quote$key$quote"
    s"DELETE FROM $table WHERE $qk IN (SELECT $qk FROM ${stagingTableFor(table)})"
  }

  /** Insert all staging rows, columns enumerated BY NAME (a positional
    * SELECT * silently swaps same-typed fields when orders differ).
    */
  def insertAllSql(table: String, columns: Seq[String], quote: String): String = {
    val colList = columns.map(c => s"$quote$c$quote").mkString(", ")
    s"INSERT INTO $table ($colList) SELECT $colList FROM ${stagingTableFor(table)}"
  }

  def dropStagingSql(table: String): String =
    s"DROP TABLE ${stagingTableFor(table)}"

  def createCommitLogSql(table: String, quote: String): String =
    s"CREATE TABLE ${commitTableFor(table)} (${quote}batch_id$quote BIGINT PRIMARY KEY)"

  def commitProbeSql(table: String, batchId: Long, quote: String): String =
    s"SELECT COUNT(*) FROM ${commitTableFor(table)} WHERE ${quote}batch_id$quote = $batchId"

  def commitRecordSql(table: String, batchId: Long): String =
    s"INSERT INTO ${commitTableFor(table)} VALUES ($batchId)"
}

/** Debug/display sink ≙ `df.show()` (`lambda_function.py:192`). */
final class ShowStore extends DataStore {
  def upsert(staging: DataFrame): Unit = staging.show()
}
