package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Generational table commits — the minimal ACID protocol for the lake
  * maintenance paths (streaming upsert, compaction) that previously relied
  * on dynamic partition overwrite, where a crash mid-overwrite leaves a
  * partially-rewritten partition with no rollback. The reference declares
  * an S3 data lake consumed by a scheduled ETL job
  * (`Hoth/FHIR/cloudformations/lambda-stack.yml:16-18,42-55`); the modern
  * convention there is an ACID table format. This is that contract's core
  * — atomic visibility via a single manifest swap — without adopting
  * Delta/Iceberg wholesale (no table-format runtime ships in
  * /opt/spark/jars).
  *
  * Layout:
  * {{{
  *   table/_commit                          <- the ONLY mutable object
  *   table/<pcol>=<v>/gen=<n>/part-....parquet  <- immutable once written
  * }}}
  *
  * Protocol (single writer, any number of readers):
  *  1. STAGE: write the new rows of each touched partition under that
  *     partition's NEXT generation directory (append-only paths no
  *     manifest references yet — invisible to every reader).
  *  2. PUBLISH: rewrite the manifest to point the touched partitions at
  *     their new generations, as ONE atomic replace (java.nio
  *     ATOMIC_MOVE here; on S3 the manifest is a single-object PUT,
  *     which replaces atomically; on HDFS a rename). Readers resolve
  *     concrete `pcol=v/gen=n` paths from whichever manifest version
  *     they read — they see the table entirely before or entirely after
  *     a commit, never a torn mix.
  *
  * Crash analysis: a crash during STAGE leaves orphan files in an
  * uncommitted generation directory; the manifest is untouched, readers
  * are unaffected, and the next attempt deletes the orphan directory
  * before re-staging (generation numbers are allocated from the committed
  * manifest, so a retry targets the same directory). A crash between
  * STAGE and PUBLISH is the same case. PUBLISH itself is a single atomic
  * rename — it either happened or it didn't.
  *
  * Scale: staging cost is bounded by the partitions a batch touches
  * (the upsert contract), never table size; the manifest is one small
  * object (one line per partition — fine for the thousands-of-partitions
  * regime; beyond that, real table formats shard the manifest, which is
  * orthogonal to this protocol). Old generations stay on disk until
  * [[vacuum]], giving readers snapshot isolation for the retention
  * window.
  */
object GenTable {

  /** A committed table state: each partition VALUE (its string form, as
    * in the directory name) maps to its committed generation.
    */
  final case class Commit(partitionCol: String, gens: Map[String, Long]) {
    def tableGen: Long = if (gens.isEmpty) 0L else gens.values.max
  }

  private def commitPath(dir: String): Path = localPath(dir).resolve("_commit")

  private def localPath(dir: String): Path = Paths.get(dir.stripPrefix("file:"))

  /** Children of a directory, with the stream closed (Files.list leaks a
    * file descriptor otherwise — this runs inside long-lived sessions).
    */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try {
      val it = s.iterator()
      val buf = Seq.newBuilder[Path]
      while (it.hasNext) buf += it.next()
      buf.result()
    } finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    finally s.close()
  }

  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, StandardCharsets.UTF_8)

  private def dec(v: String): String =
    java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)

  /** Reads the committed state; None for a table that has never published. */
  def readCommit(dir: String): Option[Commit] = {
    val p = commitPath(dir)
    if (!Files.exists(p)) None
    else {
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8)
      require(lines.size >= 1 && lines.get(0).startsWith("pcol="),
        s"malformed manifest $p")
      val pcol = dec(lines.get(0).stripPrefix("pcol="))
      val gens = (1 until lines.size).map { i =>
        val line = lines.get(i)
        val eq = line.lastIndexOf('=')
        require(eq > 0, s"malformed manifest line: $line")
        dec(line.substring(0, eq)) -> line.substring(eq + 1).toLong
      }.toMap
      Some(Commit(pcol, gens))
    }
  }

  /** PUBLISH: atomically replace the manifest (temp write + ATOMIC_MOVE). */
  def publish(dir: String, commit: Commit): Unit = {
    Files.createDirectories(localPath(dir))
    val body = (s"pcol=${enc(commit.partitionCol)}" +:
      commit.gens.toSeq.sortBy(_._1).map { case (v, g) => s"${enc(v)}=$g" })
      .mkString("", "\n", "\n")
    val tmp = localPath(dir).resolve(s"_commit.tmp.${java.util.UUID.randomUUID()}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, commitPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The committed view: concrete `pcol=v/gen=n` leaf paths resolved from
    * the manifest, read with `basePath` so the partition column is
    * recovered; the internal `gen` column is dropped. None when the table
    * has never published (or has no partitions).
    */
  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    readCommit(dir).filter(_.gens.nonEmpty).map { c =>
      val paths = c.gens.toSeq.sortBy(_._1).map { case (v, g) =>
        s"$dir/${c.partitionCol}=$v/gen=$g"
      }
      spark.read.option("basePath", dir).parquet(paths: _*).drop("gen")
    }

  /** STAGE: write `rows` (which must carry `partitionCol`) under the next
    * generation of each touched partition. Deletes orphan directories a
    * crashed previous attempt may have left at the same generation before
    * writing. Returns the Commit that [[publish]] would make current —
    * the caller (or a crash-injection test) decides when to publish.
    *
    * Partition values must be path-safe (their `cast("string")` form must
    * equal Spark's partition directory rendering — true for the intended
    * keys: integer hash buckets, dates, plain tokens). Values needing
    * Spark's path escaping would diverge between the manifest and the
    * directory layout.
    */
  def stage(rows: DataFrame, dir: String, partitionCol: String): Commit = {
    val prev = readCommit(dir).getOrElse(Commit(partitionCol, Map.empty))
    require(prev.partitionCol == partitionCol,
      s"table is partitioned by ${prev.partitionCol}, not $partitionCol")
    val newGen = prev.tableGen + 1
    val touched = rows.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)) // bounded: partitions per batch
    touched.foreach { v =>
      val orphan = localPath(dir).resolve(s"$partitionCol=$v").resolve(s"gen=$newGen")
      if (Files.exists(orphan)) deleteRecursively(orphan)
    }
    rows.withColumn("gen", lit(newGen))
      .write.mode(SaveMode.Append)
      .partitionBy(partitionCol, "gen")
      .parquet(dir)
    Commit(partitionCol, prev.gens ++ touched.map(_ -> newGen))
  }

  /** Atomic upsert of one batch: merge latest-per-key into the touched
    * partitions and commit. This is the transactional replacement for the
    * read-union-dedup-dynamic-overwrite merge in
    * [[graft.streaming.EventStreams.upsertForeachBatchAvailableNow]]:
    * identical semantics (latest row per `keyCol` by `orderCols` desc;
    * `partitionCol` must be stable per key), but a crash anywhere leaves
    * the committed view byte-identical to the pre-batch state.
    */
  def upsertBatch(batch: DataFrame, dir: String, keyCol: String,
      orderCols: Seq[String], partitionCol: String): Unit = {
    val spark = batch.sparkSession
    val prev = readCommit(dir).getOrElse(Commit(partitionCol, Map.empty))
    val touchedVals = batch.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    if (touchedVals.isEmpty) return
    val existingPaths = prev.gens.filter { case (v, _) => touchedVals(v) }
      .toSeq.sortBy(_._1)
      .map { case (v, g) => s"$dir/$partitionCol=$v/gen=$g" }
    val existing =
      if (existingPaths.isEmpty) None
      else Some(spark.read.option("basePath", dir)
        .parquet(existingPaths: _*).drop("gen"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col(_).desc): _*)
    val merged = existing.fold(batch)(_.unionByName(batch))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // materialize before staging: `merged` lazily reads committed files of
    // the SAME table; staging appends new paths, so unlike the dynamic-
    // overwrite sink nothing is overwritten — but freezing the merge keeps
    // the read set independent of writer progress. Release after commit.
    val frozen = merged.localCheckpoint(true)
    try publish(dir, stage(frozen, dir, partitionCol))
    finally frozen.unpersist()
  }

  /** Atomic compaction: rewrite every committed partition's rows into
    * ~`targetRecordsPerFile`-row files at the next generation, then one
    * manifest swap. Readers see the old file set or the new one, never a
    * mix — the transactional replacement for compact-by-overwrite.
    * Returns (filesBefore, filesAfter) over committed generations.
    */
  def compact(spark: SparkSession, dir: String,
      targetRecordsPerFile: Long): (Long, Long) = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    val c = readCommit(dir).getOrElse(
      throw new IllegalStateException(s"no committed generation under $dir"))
    def committedFiles(cm: Commit): Long = cm.gens.map { case (v, g) =>
      val d = localPath(dir).resolve(s"${cm.partitionCol}=$v").resolve(s"gen=$g")
      if (!Files.exists(d)) 0L
      else listDir(d).count(_.toString.endsWith(".parquet")).toLong
    }.sum
    val before = committedFiles(c)
    val df = read(spark, dir).get
    val n = df.count()
    val files = math.max(1L, (n + targetRecordsPerFile - 1) / targetRecordsPerFile)
    val newGen = c.tableGen + 1
    c.gens.keys.foreach { v =>
      val orphan = localPath(dir).resolve(s"${c.partitionCol}=$v").resolve(s"gen=$newGen")
      if (Files.exists(orphan)) deleteRecursively(orphan)
    }
    df.repartition(files.toInt)
      .withColumn("gen", lit(newGen))
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .partitionBy(c.partitionCol, "gen")
      .parquet(dir)
    val next = Commit(c.partitionCol, c.gens.map { case (v, _) => v -> newGen })
    publish(dir, next)
    (before, committedFiles(next))
  }

  /** Deletes every generation directory the current manifest does not
    * reference — superseded generations AND orphans from crashed stages.
    * Single-writer assumption: never run concurrently with a stage, and
    * respect reader retention (a reader that resolved paths from an older
    * manifest must finish before its generations are vacuumed).
    * Returns the number of directories removed.
    */
  def vacuum(dir: String): Long = {
    val c = readCommit(dir).getOrElse(return 0L)
    val root = localPath(dir)
    if (!Files.exists(root)) return 0L
    var removed = 0L
    listDir(root).filter(p => Files.isDirectory(p) &&
      p.getFileName.toString.startsWith(s"${c.partitionCol}=")).foreach { pdir =>
      val v = pdir.getFileName.toString.stripPrefix(s"${c.partitionCol}=")
      val keep = c.gens.get(v)
      listDir(pdir).filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("gen=")).foreach { gdir =>
        val g = gdir.getFileName.toString.stripPrefix("gen=").toLong
        if (!keep.contains(g)) {
          deleteRecursively(gdir)
          removed += 1
        }
      }
    }
    removed
  }
}
