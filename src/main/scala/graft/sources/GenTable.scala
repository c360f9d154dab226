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
  *
  * Design boundary — SINGLE WRITER, deliberately: two concurrent writers
  * from the same head would allocate the same next generation and APPEND
  * into the same `pcol=v/gen=n` directories during STAGE, so the winner's
  * commit could reference the loser's files — a torn state no
  * publish-time compare-and-swap can repair, because the damage lands
  * before either publish runs. Directory-granular manifests cannot close
  * that hole: safe multi-writer needs file-granular commits (the
  * manifest lists files, staged under unique names, as Delta's
  * transaction log does) or an external lease/lock service (the
  * DynamoDB-style coordinator S3 deployments use), both of which replace
  * this protocol rather than extend it. Serialize writers externally
  * (one maintenance scheduler per table — the reference's Step Functions
  * shape); readers need no coordination at any count.
  */
object GenTable {

  /** A committed table state: each partition VALUE (its string form, as
    * in the directory name) maps to its committed generation. `minGen`
    * floors [[tableGen]] so commit ids stay strictly increasing even
    * when a commit removes the highest-generation partitions entirely
    * (a [[deleteWhere]] that empties them) — without it the next commit
    * id could collide with an archived one.
    */
  final case class Commit(partitionCol: String, gens: Map[String, Long],
      minGen: Long = 0L,
      stats: Map[String, Map[String, (Long, Long)]] = Map.empty,
      meta: Map[String, String] = Map.empty) {
    def tableGen: Long =
      if (gens.isEmpty) minGen else math.max(minGen, gens.values.max)
    /** Columns any partition tracks min/max for (the sticky stats set). */
    def trackedStatsCols: Set[String] = stats.values.flatMap(_.keys).toSet
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
    if (!Files.exists(p)) None else Some(parseCommit(p))
  }

  /** PUBLISH: atomically replace the manifest (temp write + ATOMIC_MOVE),
    * and archive the commit under `_commits/ct_<tableGen>` for time
    * travel ([[readAt]]). The archive write happens BEFORE the swap: a
    * crash between them leaves a never-current archive, which is
    * harmless (vacuum retention is keyed off the newest archives, and
    * the next successful publish at that tableGen overwrites it with
    * identical-or-newer state). tableGen strictly increases through
    * [[upsertBatch]]/[[compact]], so it doubles as the commit id.
    */
  def publish(dir: String, commit: Commit): Unit = {
    Files.createDirectories(localPath(dir))
    // `#tgen`/`#stat` cannot collide with a partition line: URL encoding
    // never emits '#' (a literal '#' in a value encodes as %23)
    val statLines = commit.stats.toSeq.sortBy(_._1).flatMap { case (v, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
        s"#stat=${enc(v)}|${enc(c)}|$mn|$mx"
      }
    }
    val metaLines = commit.meta.toSeq.sortBy(_._1).map { case (k, v) =>
      s"#meta=${enc(k)}|${enc(v)}"
    }
    val body = (s"pcol=${enc(commit.partitionCol)}" +:
      s"#tgen=${commit.tableGen}" +:
      (commit.gens.toSeq.sortBy(_._1).map { case (v, g) => s"${enc(v)}=$g" } ++
        statLines ++ metaLines)).mkString("", "\n", "\n")
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    val archiveDir = localPath(dir).resolve("_commits")
    Files.createDirectories(archiveDir)
    Files.write(archiveDir.resolve(f"ct_${commit.tableGen}%020d"), bytes)
    val tmp = localPath(dir).resolve(s"_commit.tmp.${java.util.UUID.randomUUID()}")
    Files.write(tmp, bytes)
    Files.move(tmp, commitPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Archived commit ids (tableGens), oldest first. */
  def commits(dir: String): Seq[Long] = {
    val archiveDir = localPath(dir).resolve("_commits")
    if (!Files.exists(archiveDir)) Seq.empty
    else listDir(archiveDir).map(_.getFileName.toString)
      .filter(_.startsWith("ct_")).map(_.stripPrefix("ct_").toLong).sorted
  }

  private def parseCommit(p: Path): Commit = {
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8)
    require(lines.size >= 1 && lines.get(0).startsWith("pcol="),
      s"malformed manifest $p")
    val pcol = dec(lines.get(0).stripPrefix("pcol="))
    var minGen = 0L
    val statBuf = Seq.newBuilder[(String, String, Long, Long)]
    val metaBuf = Map.newBuilder[String, String]
    val gens = (1 until lines.size).flatMap { i =>
      val line = lines.get(i)
      if (line.startsWith("#tgen=")) {
        minGen = line.stripPrefix("#tgen=").toLong
        None
      } else if (line.startsWith("#stat=")) {
        val parts = line.stripPrefix("#stat=").split('|')
        require(parts.length == 4, s"malformed stat line: $line")
        statBuf += ((dec(parts(0)), dec(parts(1)),
          parts(2).toLong, parts(3).toLong))
        None
      } else if (line.startsWith("#meta=")) {
        // enc() never emits '|' (percent-encoded), so split is unambiguous
        val parts = line.stripPrefix("#meta=").split('|')
        require(parts.length == 2, s"malformed meta line: $line")
        metaBuf += dec(parts(0)) -> dec(parts(1))
        None
      } else {
        val eq = line.lastIndexOf('=')
        require(eq > 0, s"malformed manifest line: $line")
        Some(dec(line.substring(0, eq)) -> line.substring(eq + 1).toLong)
      }
    }.toMap
    val stats = statBuf.result().groupBy(_._1).map { case (v, rows) =>
      v -> rows.map(r => r._2 -> (r._3, r._4)).toMap
    }
    Commit(pcol, gens, minGen, stats, metaBuf.result())
  }

  /** Time travel: the table as of an archived commit id (from
    * [[commits]]). Generations are immutable, so the snapshot is exact —
    * readable until [[vacuum]]'s retention drops it.
    */
  def readAt(spark: SparkSession, dir: String, commitId: Long): Option[DataFrame] = {
    val p = localPath(dir).resolve("_commits").resolve(f"ct_$commitId%020d")
    if (!Files.exists(p)) None
    else {
      val c = parseCommit(p)
      if (c.gens.isEmpty) None
      else {
        val paths = c.gens.toSeq.sortBy(_._1).map { case (v, g) =>
          s"$dir/${c.partitionCol}=$v/gen=$g"
        }
        Some(spark.read.option("basePath", dir).parquet(paths: _*).drop("gen"))
      }
    }
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
  def stage(rows: DataFrame, dir: String, partitionCol: String,
      statsCols: Seq[String] = Nil): Commit = {
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
    // stats are STICKY: once a column is tracked anywhere, every rewrite
    // of a touched partition re-derives it, so skipping keeps working
    // without each writer re-declaring the column set
    val track = (statsCols ++ prev.trackedStatsCols).distinct
      .filter(rows.columns.contains)
    val newStats = computeStats(rows, partitionCol, track)
    Commit(partitionCol, prev.gens ++ touched.map(_ -> newGen),
      stats = (prev.stats -- touched) ++ newStats,
      meta = prev.meta) // metadata persists until a commit changes it
  }

  /** Per-partition min/max of `track` columns over `rows` in one
    * map-side-combined aggregate; bounded by partitions-per-batch ×
    * tracked columns. Values are `cast("long")` (integral semantics —
    * timestamps compare as epoch seconds); all-null partitions get no
    * entry (read conservatively by [[readRange]]).
    */
  private def computeStats(rows: DataFrame, partitionCol: String,
      track: Seq[String]): Map[String, Map[String, (Long, Long)]] = {
    if (track.isEmpty) return Map.empty
    val aggs = track.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"_mn_$c"),
      max(col(c).cast("long")).as(s"_mx_$c")))
    rows.groupBy(col(partitionCol).cast("string").as("_v"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        r.getString(0) -> track.flatMap { c =>
          val mn = r.getAs[Any](s"_mn_$c")
          val mx = r.getAs[Any](s"_mx_$c")
          if (mn == null || mx == null) None
          else Some(c -> (mn.asInstanceOf[Long], mx.asInstanceOf[Long]))
        }.toMap
      }.toMap
  }

  /** Stats-pruned range read: partitions whose tracked `[min, max]` for
    * `statsCol` cannot intersect `[lo, hi]` are never opened (manifest
    * metadata only — the Iceberg-style skip on a NON-partition column);
    * partitions without stats for the column are read conservatively.
    * The residual filter is always applied, so the result equals
    * `read(...).filter(statsCol.cast("long") between lo and hi)` exactly.
    */
  def readRange(spark: SparkSession, dir: String, statsCol: String,
      lo: Long, hi: Long): Option[DataFrame] =
    readRanges(spark, dir, Map(statsCol -> (lo, hi)))

  /** Conjunctive multi-column form of [[readRange]]: a partition is
    * opened only if EVERY given range can intersect its tracked band
    * (columns without stats in a partition are conservative — they never
    * prune it), and the residual is the AND of all the range predicates,
    * so the result equals filtering the full view by the conjunction.
    * Ranges compose multiplicatively when the tracked columns separate
    * partitions along different axes (e.g. ingest order AND event time).
    */
  def readRanges(spark: SparkSession, dir: String,
      ranges: Map[String, (Long, Long)]): Option[DataFrame] = {
    require(ranges.nonEmpty, "need at least one (column, range)")
    readCommit(dir).filter(_.gens.nonEmpty).map { c =>
      val resid = (df: DataFrame) => ranges.foldLeft(df) {
        case (d, (sc, (lo, hi))) => d.filter(col(sc).cast("long").between(lo, hi))
      }
      val keep = c.gens.toSeq.filter { case (v, _) =>
        ranges.forall { case (sc, (lo, hi)) =>
          c.stats.get(v).flatMap(_.get(sc)) match {
            case Some((mn, mx)) => mx >= lo && mn <= hi
            case None => true
          }
        }
      }.sortBy(_._1)
      if (keep.isEmpty) {
        // everything pruned: schema-correct empty frame off the full view
        resid(read(spark, dir).get).limit(0)
      } else {
        val paths = keep.map { case (v, g) => s"$dir/${c.partitionCol}=$v/gen=$g" }
        resid(spark.read.option("basePath", dir).parquet(paths: _*).drop("gen"))
      }
    }
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
      orderCols: Seq[String], partitionCol: String,
      statsCols: Seq[String] = Nil): Unit = {
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
    try publish(dir, stage(frozen, dir, partitionCol, statsCols))
    finally frozen.unpersist()
  }

  /** Atomic whole-table replace: ONE commit after which the content is
    * exactly `rows` — partitions absent from `rows` leave the manifest
    * (deletion by omission), and the commit's `meta` rides the same
    * atomic swap as the data. This is the storage shape incremental
    * materialized views need ([[graft.operators.RollupStore.maintainView]]):
    * the refreshed view and its consumed-source marker become visible
    * together or not at all, which is what makes re-running a crashed
    * refresh safe. `rows` may read this table's own committed files (a
    * refresh does) — it is frozen before staging. Intended for
    * view-sized tables; a replace stages every partition of `rows`.
    */
  def replaceAll(rows: DataFrame, dir: String, partitionCol: String,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Unit = {
    val frozen = rows.localCheckpoint(true)
    try {
      val prevGen = readCommit(dir).map(_.tableGen).getOrElse(0L)
      val touched = frozen.select(col(partitionCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      val staged = stage(frozen, dir, partitionCol, statsCols)
      // an empty replace still commits (meta-only, e.g. an empty view's
      // marker) — minGen forces a fresh commit id in that case
      publish(dir, Commit(partitionCol,
        staged.gens.filter { case (v, _) => touched(v) },
        math.max(staged.tableGen, prevGen + 1),
        staged.stats.filter { case (v, _) => touched(v) },
        meta))
    } finally frozen.unpersist()
  }

  /** Atomic compaction: rewrite every committed partition's rows into
    * ~`targetRecordsPerFile`-row files at the next generation, then one
    * manifest swap. Readers see the old file set or the new one, never a
    * mix — the transactional replacement for compact-by-overwrite.
    * Returns (filesBefore, filesAfter) over committed generations.
    *
    * `clusterBy` (optional) sorts rows by the given columns within each
    * rewritten partition, so consecutive output files — and their parquet
    * row groups — cover disjoint value bands. A later range scan on a
    * clustered column then prunes row groups via the pushed filter's
    * footer min/max check, the file-level complement of the manifest's
    * partition-level [[readRange]] skip (OPTIMIZE-style clustering; for
    * multi-dimensional locality pass one interleaved key, e.g.
    * `functions.ZOrder`, instead of several columns). Clustered rewrites
    * shuffle by the table partition column (not round-robin), so one
    * task writes each partition's sorted run; skewed partitions bound
    * task size by their own row count — same bound as the upsert path.
    */
  def compact(spark: SparkSession, dir: String, targetRecordsPerFile: Long,
      clusterBy: Seq[String] = Nil): (Long, Long) = {
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
    // gen is added BEFORE the cluster sort so the writer's required
    // ordering (partitionCol, gen) is already satisfied and it does not
    // re-sort — a writer-side re-sort would destroy the cluster order
    val base = df.withColumn("gen", lit(newGen))
    val staged =
      if (clusterBy.isEmpty) base.repartition(files.toInt)
      else base.repartition(files.toInt, col(c.partitionCol))
        .sortWithinPartitions(
          (Seq(c.partitionCol, "gen") ++ clusterBy).map(col): _*)
    staged
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .partitionBy(c.partitionCol, "gen")
      .parquet(dir)
    // contents are unchanged by compaction, so stats/meta carry over as-is
    val next = Commit(c.partitionCol,
      c.gens.map { case (v, _) => v -> newGen }, stats = c.stats,
      meta = c.meta)
    publish(dir, next)
    (before, committedFiles(next))
  }

  /** Atomic predicate delete — the takedown / right-to-be-forgotten path
    * a training-data lake needs as a first-class operation. Finding the
    * matches costs one scan of the committed view (arbitrary predicates
    * can't be pruned without column stats, which are orthogonal to this
    * protocol), but the REWRITE is bounded by the partitions that
    * actually contain matches: only those are re-read and re-staged at
    * the next generation; a partition left empty by the delete is
    * dropped from the manifest. One atomic publish — a crash anywhere
    * leaves every deleted row still committed. Rows delete when the
    * predicate is TRUE; NULL predicate rows survive (SQL DELETE
    * semantics). Returns the number of rows deleted (0 = no commit was
    * made).
    */
  def deleteWhere(spark: SparkSession, dir: String, predicate: org.apache.spark.sql.Column): Long = {
    val c = readCommit(dir).getOrElse(return 0L)
    if (c.gens.isEmpty) return 0L
    val full = read(spark, dir).get
    // touched partitions + per-partition match counts in one bounded collect
    val touchedRows = full.filter(predicate)
      .groupBy(col(c.partitionCol).cast("string").as("_v"))
      .agg(count(lit(1)).as("_n")).collect()
    if (touchedRows.isEmpty) return 0L
    val deleted = touchedRows.map(_.getLong(1)).sum
    val touchedVals = touchedRows.map(_.getString(0)).toSet
    val touchedPaths = c.gens.filter { case (v, _) => touchedVals(v) }
      .toSeq.sortBy(_._1)
      .map { case (v, g) => s"$dir/${c.partitionCol}=$v/gen=$g" }
    val survivors = spark.read.option("basePath", dir)
      .parquet(touchedPaths: _*).drop("gen")
      .filter(!coalesce(predicate, lit(false)))
    commitRewrite(spark, dir, c, touchedVals, survivors)
    deleted
  }

  /** Atomic delete by key list — the shape real takedown requests
    * arrive in (a bounded list of user/doc ids). Unlike [[deleteWhere]]
    * there is NO full-table find-scan: the stable key→partition
    * contract (`partitionExpr`, the same mapping the writer used)
    * derives the touched partitions directly from the keys, so both the
    * scan and the rewrite are bounded by the partitions the keys map
    * to — at 100 TB a thousand-user takedown reads a handful of
    * buckets, never the table. `keys` is broadcast into the anti-join
    * (takedown lists are small by nature). Keys mapping to absent
    * partitions, or absent from their partition, delete nothing.
    * Returns rows deleted (0 = no commit).
    */
  def deleteKeys(keys: DataFrame, dir: String, keyCol: String,
      partitionExpr: org.apache.spark.sql.Column): Long = {
    val spark = keys.sparkSession
    val c = readCommit(dir).getOrElse(return 0L)
    if (c.gens.isEmpty) return 0L
    val k = keys.select(col(keyCol)).distinct()
    val touchedVals = k.select(partitionExpr.cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
      .filter(c.gens.contains) // bounded: partitions the key list maps to
    if (touchedVals.isEmpty) return 0L
    val touchedPaths = c.gens.filter { case (v, _) => touchedVals(v) }
      .toSeq.sortBy(_._1)
      .map { case (v, g) => s"$dir/${c.partitionCol}=$v/gen=$g" }
    val part = spark.read.option("basePath", dir)
      .parquet(touchedPaths: _*).drop("gen")
    val deleted = part.join(broadcast(k), Seq(keyCol), "left_semi").count()
    if (deleted == 0L) return 0L
    commitRewrite(spark, dir, c, touchedVals,
      part.join(broadcast(k), Seq(keyCol), "left_anti"))
    deleted
  }

  /** Shared delete tail: stage the survivors of the touched partitions
    * at the next generation, drop partitions the rewrite emptied, and
    * publish once. `minGen` pins the commit id even when the rewrite
    * removes every max-generation partition.
    */
  private def commitRewrite(spark: SparkSession, dir: String, c: Commit,
      touchedVals: Set[String], survivors: DataFrame): Unit = {
    // freeze before staging: the survivor frame lazily reads committed
    // files of the same table (same discipline as upsertBatch)
    val frozen = survivors.localCheckpoint(true)
    try {
      val newGen = c.tableGen + 1
      val survivorVals = frozen.select(col(c.partitionCol).cast("string"))
        .distinct().collect().map(_.getString(0)).toSet
      touchedVals.foreach { v =>
        val orphan = localPath(dir).resolve(s"${c.partitionCol}=$v").resolve(s"gen=$newGen")
        if (Files.exists(orphan)) deleteRecursively(orphan)
      }
      if (survivorVals.nonEmpty) {
        frozen.withColumn("gen", lit(newGen))
          .write.mode(SaveMode.Append)
          .partitionBy(c.partitionCol, "gen")
          .parquet(dir)
      }
      val emptied = touchedVals -- survivorVals
      // rewritten partitions re-derive their tracked stats off the
      // survivors; emptied ones drop theirs with the partition
      val track = c.trackedStatsCols.toSeq.filter(frozen.columns.contains)
      publish(dir, Commit(c.partitionCol,
        (c.gens -- emptied) ++ survivorVals.map(_ -> newGen), newGen,
        (c.stats -- touchedVals) ++ computeStats(frozen, c.partitionCol, track),
        c.meta))
    } finally frozen.unpersist()
  }

  /** Change-data-capture between two archived commits (ids from
    * [[commits]]; `fromId = 0` = the empty table). Immutable generations
    * make the diff both exact and PRUNED: a partition whose committed
    * generation is identical in both commits is never read — IO follows
    * the churn between the snapshots, not table size. Rows are matched
    * on `keyCol` (the upsert key — unique per committed state) and
    * compared null-safely across all other columns; unchanged rows are
    * absent from the output. Returns the table's columns plus `_change`
    * (`insert` / `update` / `delete`), carrying the post-image for
    * insert/update and the pre-image for delete.
    */
  def changesBetween(spark: SparkSession, dir: String, fromId: Long,
      toId: Long, keyCol: String): DataFrame = {
    val diff = changeImages(spark, dir, fromId, toId, keyCol)
    if (diff.columns.isEmpty) return diff
    val dataCols = diff.schema("_post").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    diff.withColumn("_img", coalesce(col("_post"), col("_pre")))
      .select(col(keyCol) +: col("_change") +:
        dataCols.toSeq.map(f => col(s"_img.$f").as(f)): _*)
  }

  /** Incremental CDC consumption: the pre/post-image changes between the
    * consumer's last-seen commit id (0 = never consumed) and the current
    * head, plus the head id to checkpoint for the next poll. `None` when
    * nothing new committed. Feeding each poll's frame to
    * [[graft.operators.RollupStore.applyCdcDeltas]] maintains a
    * downstream view that equals a from-scratch recompute after every
    * poll, whatever the poll-to-commit interleaving — the lake-to-view
    * pipeline loop (spec-pinned). Retention contract: the consumer must
    * poll within `keepCommits` of [[vacuum]], or its `lastSeenId`
    * snapshot is gone and the diff fails fast rather than silently
    * dropping changes.
    */
  def changesSince(spark: SparkSession, dir: String, lastSeenId: Long,
      keyCol: String): Option[(Long, DataFrame)] = {
    val head = commits(dir).lastOption.getOrElse(return None)
    if (head <= lastSeenId) None
    else Some((head, changesWithImages(spark, dir, lastSeenId, head, keyCol)))
  }

  /** [[changesBetween]] with BOTH row images: `_pre` (the `fromId` row,
    * null for inserts) and `_post` (the `toId` row, null for deletes) as
    * structs of the non-key columns. This is the shape incremental view
    * maintenance needs — an update's effect on a downstream aggregate is
    * `-f(pre) + f(post)`, which the single-image form cannot express
    * (see [[graft.operators.RollupStore.applyCdcDeltas]]). Same pruning:
    * only partitions whose generation moved are read.
    */
  def changesWithImages(spark: SparkSession, dir: String, fromId: Long,
      toId: Long, keyCol: String): DataFrame =
    changeImages(spark, dir, fromId, toId, keyCol)

  private def changeImages(spark: SparkSession, dir: String, fromId: Long,
      toId: Long, keyCol: String): DataFrame = {
    def resolve(id: Long): Commit = {
      if (id == 0L) return Commit("", Map.empty)
      val p = localPath(dir).resolve("_commits").resolve(f"ct_$id%020d")
      require(Files.exists(p), s"no archived commit $id under $dir (vacuumed?)")
      parseCommit(p)
    }
    val cFrom = resolve(fromId)
    val cTo = resolve(toId)
    val pcol = if (cTo.gens.nonEmpty || cTo.partitionCol.nonEmpty)
      cTo.partitionCol else cFrom.partitionCol
    // only partitions whose generation moved participate in the diff
    val changed = (cFrom.gens.keySet ++ cTo.gens.keySet)
      .filter(v => cFrom.gens.get(v) != cTo.gens.get(v)).toSeq.sorted
    def side(c: Commit): Option[DataFrame] = {
      val paths = changed.flatMap(v => c.gens.get(v).map(g =>
        s"$dir/$pcol=$v/gen=$g"))
      if (paths.isEmpty) None
      else Some(spark.read.option("basePath", dir).parquet(paths: _*).drop("gen"))
    }
    val template = side(cTo).orElse(side(cFrom)).getOrElse(
      return spark.emptyDataFrame)
    val dataCols = template.columns.filterNot(_ == keyCol)
    def packed(df: Option[DataFrame], as: String): DataFrame = df match {
      case Some(d) => d.select(col(keyCol),
        struct(dataCols.map(col): _*).as(as))
      case None => template.select(col(keyCol),
        struct(dataCols.map(col): _*).as(as)).limit(0)
    }
    packed(side(cFrom), "_pre").join(packed(side(cTo), "_post"),
        Seq(keyCol), "full_outer")
      .filter(!(col("_pre") <=> col("_post")))
      .withColumn("_change",
        when(col("_pre").isNull, lit("insert"))
          .when(col("_post").isNull, lit("delete"))
          .otherwise(lit("update")))
  }

  /** Deletes every generation directory the RETAINED commits do not
    * reference — superseded generations AND orphans from crashed stages —
    * plus commit archives older than the retention window. Retention:
    * the current manifest and the newest `keepCommits` archived commits
    * stay readable ([[readAt]]); everything older goes. Single-writer
    * assumption: never run concurrently with a stage, and a reader that
    * resolved paths from a retained commit must finish before a LATER
    * vacuum drops that commit. Returns the number of generation
    * directories removed.
    */
  def vacuum(dir: String, keepCommits: Int = 1): Long = {
    require(keepCommits >= 1, "keepCommits must be >= 1")
    val c = readCommit(dir).getOrElse(return 0L)
    val root = localPath(dir)
    if (!Files.exists(root)) return 0L
    val retainedIds = commits(dir).takeRight(keepCommits)
    val retained = retainedIds.flatMap { id =>
      val p = root.resolve("_commits").resolve(f"ct_$id%020d")
      if (Files.exists(p)) Some(parseCommit(p)) else None
    } :+ c
    // per partition value, the set of generations any retained commit pins
    val keep: Map[String, Set[Long]] = retained
      .flatMap(_.gens.toSeq).groupBy(_._1)
      .map { case (v, gs) => v -> gs.map(_._2).toSet }
    var removed = 0L
    listDir(root).filter(p => Files.isDirectory(p) &&
      p.getFileName.toString.startsWith(s"${c.partitionCol}=")).foreach { pdir =>
      val v = pdir.getFileName.toString.stripPrefix(s"${c.partitionCol}=")
      val pinned = keep.getOrElse(v, Set.empty)
      listDir(pdir).filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("gen=")).foreach { gdir =>
        val g = gdir.getFileName.toString.stripPrefix("gen=").toLong
        if (!pinned.contains(g)) {
          deleteRecursively(gdir)
          removed += 1
        }
      }
    }
    // drop archives outside the retention window
    val archiveDir = root.resolve("_commits")
    if (Files.exists(archiveDir)) {
      val keepNames = retainedIds.map(id => f"ct_$id%020d").toSet
      listDir(archiveDir).filter(p =>
        p.getFileName.toString.startsWith("ct_") &&
          !keepNames.contains(p.getFileName.toString))
        .foreach(Files.delete)
    }
    removed
  }
}
