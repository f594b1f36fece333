package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** Stable on-disk warehouse for per-corpus build artifacts — the
  * signature table, funnel membership, k-means model, IVF inverted
  * file, merged cube, and near-dup pair table. Layout:
  *
  * {{{ <root>/<table>@<params>@<dataset>@v<Layout>-<version>/  (parquet + _MANIFEST.json) }}}
  *
  * where `params` identifies the build FAMILY (`default` when none —
  * pruning one family's stale versions must never touch a sibling
  * parameterization) and `version` is the SOURCE table's change marker
  * ([[BuildCache.version]]: newest mtime + byte size) — the directory
  * name IS the cache key, so a regenerated dataset gets a fresh name
  * and rebuilds while a FRESH PROCESS finds the completed artifact and
  * reuses it instead of paying the ~19 s of index builds per session
  * the in-JVM memo alone could not avoid.
  * This is the production posture the reference's granule cache
  * approximates (processor.py:342-356 keys `.nc` files by
  * tile+dayofyear and skips re-processing on hit): build artifacts
  * belong in a warehouse path with a manifest, not a temp dir.
  *
  * Completion protocol: builders write into a `.tmp-<nonce>` sibling,
  * `_MANIFEST.json` lands LAST, and the directory atomically renames
  * into its keyed name — a crashed build leaves only tmp litter (never
  * a half-artifact under a valid key), and a lost cross-process race
  * adopts the winner. The manifest doubles as provenance (source,
  * version, build time) and is invisible to parquet readers (underscore
  * prefix).
  *
  * Staleness discipline: the key captures DATA versions, not code.
  * Any change to a build's semantics must bump [[LayoutVersion]] (or
  * the table's `params`) so persisted artifacts from older code orphan
  * rather than serve stale rows — the correctness gate would catch the
  * drift, but only after serving it.
  */
object Warehouse {

  /** Bump when any build algorithm or the on-disk layout changes
    * meaning: every persisted artifact is then orphaned and rebuilt.
    * v2: params moved from the version suffix into the name prefix.
    * v3: cube gained `cube/`+`meta/` subdirs and funnel gained
    * `stages/`+`hashes/` (the incremental-maintenance side tables).
    * v4: cube meta max_date re-keyed to ALL granules (pre-QC), so the
    * append guard rejects partial-granule batches whose date never
    * produced cube rows — v3 metas would admit them.
    * v5: gcache gained `cache/`+`meta/` subdirs (the partitioned tree
    * cannot share a root with a meta table).
    * v6: textdup gained `sizes/`+`pairbk/`+`simhash/` and neardup
    * gained `sizes/`+`pairbk/` (the O(batch) incremental-append side
    * tables); ivf split into `cells/`+`meta/` (frozen-model appends).
    * v7: freq scores re-keyed to integer (isum, len) and the artifact
    * gained `post/`+`corr/` (exact O(affected) class-crossing
    * repricing instead of the rebuild fallback).
    * v8: kmeans/ivf quantizers train on the bounded modular sample
    * (SimOps.trainStride), so a v7 model — trained on the full corpus
    * past the sample target — would serve different (still valid, but
    * not reproducible by this code or its oracle) centroids.
    * v9: textdup gained `nearpairs/` (the genuinely-near pair subset
    * the funnel's stage-2 drop joins against — byte-identical pairs
    * can never drop a stage-1 survivor, see TextOps.nearPairPath); a
    * v8 prior lacks the table, so appends full-rebuild once. */
  val LayoutVersion = 9

  /** Root directory: `graft.warehouse` system property (spec isolation),
    * else `GRAFT_WAREHOUSE` env, else `spark-warehouse/graft` under the
    * working directory (gitignored). */
  def root: Path = Paths.get(
    sys.props.get("graft.warehouse")
      .orElse(sys.env.get("GRAFT_WAREHOUSE"))
      .getOrElse("spark-warehouse/graft"))

  /** Completed builds this JVM actually ran (reuse does not count) —
    * the observability hook the reuse specs assert on. */
  private[graft] val buildsRun = new java.util.concurrent.atomic.AtomicInteger

  private def sanitize(s: String): String =
    s.map(c =>
      if (c.isLetterOrDigit || c == '.' || c == '-' || c == '_' || c == '@') c
      else '-')

  /** Dataset tag: basename plus a short path hash — readable, and two
    * dataset dirs sharing a basename cannot collide. */
  private def dsTag(d: String): String = {
    val base = Paths.get(d).getFileName.toString
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    s"$base-$h"
  }

  /** A build family is identified by (table, params, dataset): the
    * PARAMS belong to the identity, not the version — pruning stale
    * VERSIONS of `kmeans` with params `k8-s100` must never touch the
    * coexisting `k4-s200` family. */
  private def prefix(table: String, params: String, d: String): String =
    sanitize(s"$table@${if (params.isEmpty) "default" else params}@${dsTag(d)}@")

  private def dirFor(table: String, params: String, d: String,
      version: String): Path =
    root.resolve(prefix(table, params, d) + sanitize(s"v$LayoutVersion-$version"))

  private def manifest(dir: Path): Path = dir.resolve("_MANIFEST.json")

  /** Manifest fields are provenance for humans AND parsed back by
    * [[latest]] — dataset paths with quotes/backslashes must not break
    * the JSON, so every interpolated string is escaped. */
  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Resolve-or-build: returns the artifact directory for
    * `(table, dataset, source version [, params])`, running `build`
    * (which must populate the passed tmp dir) only when no completed
    * artifact exists. Callers layer an in-JVM [[BuildCache]] on top so
    * the filesystem probe itself is once-per-session. */
  def getOrBuild(table: String, d: String, srcFile: String,
      params: String = "")(build: Path => Unit): String = {
    val version = BuildCache.version(d, srcFile)
    val dir = dirFor(table, params, d, version)
    if (Files.exists(manifest(dir))) return dir.toString
    Files.createDirectories(root)
    val tmp = root.resolve(dir.getFileName.toString +
      s".tmp-${ProcessHandle.current.pid}-${System.nanoTime()}")
    try build(tmp)
    catch { case e: Throwable => rmTree(tmp); throw e }
    val m = s"""{"table":${jsonStr(table)},"dataset":${jsonStr(d)},""" +
      s""""source":${jsonStr(srcFile)},""" +
      s""""params":${jsonStr(sanitize(params))},""" +
      s""""version":${jsonStr(sanitize(version))},"layout":$LayoutVersion,""" +
      s""""built_ms":${System.currentTimeMillis()}}"""
    Files.write(manifest(tmp), m.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try {
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      buildsRun.incrementAndGet()
    } catch {
      // a lost race surfaces as FileAlreadyExists/DirectoryNotEmpty on
      // some filesystems but as a BARE FileSystemException ("Directory
      // not empty", rename(2) ENOTEMPTY) on Linux — catch the common
      // supertype; the require() below still fails loudly if the move
      // failed for any reason OTHER than a completed winner existing
      case _: java.nio.file.FileSystemException =>
        // lost a cross-process race: adopt the winner, drop our copy
        rmTree(tmp)
        require(Files.exists(manifest(dir)), s"racing build left $dir incomplete")
    }
    prune(table, params, d, keep = dir.getFileName.toString)
    dir.toString
  }

  /** Drop every COMPLETED stale version of `table@params@dataset` other
    * than `keep` — superseded artifacts are dead weight the moment a
    * newer version lands. In-flight `.tmp-` dirs of other processes are
    * left alone (they self-resolve or get swept by [[invalidate]]). */
  private def prune(table: String, params: String, d: String,
      keep: String): Unit = {
    val p = prefix(table, params, d)
    // dirs from a superseded LayoutVersion (e.g. the pre-params naming
    // `table@dsTag@v1-…`) match no current prefix and would leak
    // forever; sweep anything for this table+dataset that is not at the
    // current layout
    val head = sanitize(s"$table@")
    val tag = sanitize(s"@${dsTag(d)}@")
    val layout = sanitize(s"@v$LayoutVersion-")
    listRoot().foreach { f =>
      val n = f.getFileName.toString
      val stale = (n.startsWith(p) && n != keep) ||
        (n.startsWith(head) && n.contains(tag) && !n.contains(layout))
      // a ".tmp-" sibling can ALREADY carry a manifest in the window
      // between its manifest write and its atomic rename — deleting it
      // there makes the victim's move throw and (if it was a different
      // version than `keep`) aborts a valid build; tmp sweeping belongs
      // to invalidate() only
      // ".compact-" siblings (staged copies, work dirs) carry no
      // manifest and would leak when their artifact is pruned; sweep
      // any not belonging to `keep` (an in-flight stager write for a
      // superseded version just fails and counts a miss)
      val compactLitter = n.startsWith(p) && n.contains(".compact-") &&
        !n.startsWith(keep + ".compact-")
      if ((stale && !n.contains(".tmp-") && Files.exists(manifest(f))) ||
        compactLitter) rmTree(f)
    }
  }

  /** The most recently completed artifact of `table@params@dataset`,
    * any version — the incremental-maintenance hook: an updater
    * carries the prior version's data files into the next version's
    * build instead of recomputing them (see TextOps.appendToSigIndex). */
  def latest(table: String, d: String, params: String = ""): Option[String] = {
    val p = prefix(table, params, d)
    // a prior from a superseded LayoutVersion encodes pre-bump build
    // semantics (e.g. a v3 cube meta keyed post-QC) — adopting it as the
    // incremental carry would launder stale-algorithm state into a
    // fresh-layout artifact, so only same-layout dirs qualify; the
    // appendTo* callers fall back to a full rebuild when none exists
    val layout = sanitize(s"@v$LayoutVersion-")
    listRoot()
      .filter(f => f.getFileName.toString.startsWith(p) &&
        f.getFileName.toString.contains(layout) &&
        !f.getFileName.toString.contains(".tmp-") &&
        Files.exists(manifest(f)))
      // order by the RECORDED source state (the version marker's mtime
      // component, then size), not filesystem mtime: a restored backup
      // or clock skew must not promote an older corpus state to "prior"
      // for the incremental carry. built_ms and manifest mtime are only
      // tiebreaks within one source version.
      .sortBy { f =>
        val m = readManifest(f)
        (m._1, m._2, m._3, Files.getLastModifiedTime(manifest(f)).toMillis)
      }
      .lastOption.map(_.toString)
  }

  /** (source mtime, source size, built_ms) parsed from a manifest;
    * zeros when unreadable (sorts first, so a corrupt manifest never
    * shadows a healthy prior). */
  private def readManifest(dir: Path): (Long, Long, Long) = {
    try {
      val txt = new String(Files.readAllBytes(manifest(dir)),
        java.nio.charset.StandardCharsets.UTF_8)
      val ver = """"version":"(\d+)-(\d+)"""".r.findFirstMatchIn(txt)
      val built = """"built_ms":(\d+)""".r.findFirstMatchIn(txt)
      (ver.map(_.group(1).toLong).getOrElse(0L),
        ver.map(_.group(2).toLong).getOrElse(0L),
        built.map(_.group(1).toLong).getOrElse(0L))
    } catch { case scala.util.control.NonFatal(_) => (0L, 0L, 0L) }
  }

  /** Hard-link `f` as `dst`, falling back to a byte copy when the
    * filesystem refuses (cross-device target, no hard-link support).
    * Artifact data files are IMMUTABLE once written — a new version's
    * Spark writes only ADD part files, never modify carried ones, and
    * pruning deletes a version's NAMES, leaving inodes shared with a
    * newer version intact — so the carry of a prior version into an
    * append is O(files), not O(bytes). Measured at 10× sf0.1 this is
    * the difference between a flat append and one that re-copies a
    * corpus-sized inverted file per batch. If a concurrent prune wins
    * the race and the source vanishes mid-carry, the link throws like
    * the copy did and the append path falls back to a full rebuild
    * (the racecheck-locked contract). */
  private def linkOrCopy(f: Path, dst: Path): Unit = {
    Files.deleteIfExists(dst)
    try Files.createLink(dst, f)
    catch {
      case _: UnsupportedOperationException =>
        Files.copy(f, dst, StandardCopyOption.REPLACE_EXISTING)
      case e: java.nio.file.FileSystemException
          if !(e.isInstanceOf[java.nio.file.NoSuchFileException]) =>
        Files.copy(f, dst, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Carry a completed artifact's DATA files (not its manifest) into a
    * build-in-progress dir — the O(carried-files) half of an incremental
    * update ([[linkOrCopy]]); the new version's manifest still lands
    * last. */
  def copyData(from: String, into: Path): Unit = {
    Files.createDirectories(into)
    val s = Files.list(Paths.get(from))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString != "_MANIFEST.json")
        .foreach(f => linkOrCopy(f, into.resolve(f.getFileName.toString)))
    } finally s.close()
  }

  /** Recursive [[copyData]] for artifacts whose data is a PARTITIONED
    * parquet tree (the granule cache's `tile_id=X` dirs, the IVF
    * `cell=X` inverted file): carries the whole tree below `from` into
    * `into` via [[linkOrCopy]], manifest excluded. */
  def copyTree(from: String, into: Path): Unit = {
    val src = Paths.get(from)
    def walk(s: Path, t: Path): Unit = {
      Files.createDirectories(t)
      val st = Files.list(s)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.foreach { f =>
          val dst = t.resolve(f.getFileName.toString)
          if (Files.isDirectory(f)) walk(f, dst)
          else if (f.getFileName.toString != "_MANIFEST.json")
            linkOrCopy(f, dst)
        }
      } finally st.close()
    }
    walk(src, into)
  }

  /** Delete every artifact (and tmp) of `table@dataset`, ALL param
    * families — the forced-rebuild hook ([[graft.Bench]] measures real
    * builds, specs exercise the build path). */
  def invalidate(table: String, d: String): Unit = {
    val head = sanitize(s"$table@")
    val tag = sanitize(s"@${dsTag(d)}@")
    listRoot().foreach { f =>
      val n = f.getFileName.toString
      if (n.startsWith(head) && n.contains(tag)) rmTree(f)
    }
  }

  /** Delete every NON-DEFAULT param family of `table@dataset` — the
    * explicit-k index variants (the v15 auto-geometry family) without
    * touching the default family a sibling query serves from; the
    * bench's cold-reset for `ivfauto_build` must not force the next
    * v05 serve through a rebuild. */
  def invalidateNonDefault(table: String, d: String): Unit = {
    val head = sanitize(s"$table@")
    val tag = sanitize(s"@${dsTag(d)}@")
    val default = prefix(table, "", d)
    listRoot().foreach { f =>
      val n = f.getFileName.toString
      if (n.startsWith(head) && n.contains(tag) && !n.startsWith(default))
        rmTree(f)
    }
  }

  /** Delete every artifact of every table for `dataset`. */
  def invalidateDataset(d: String): Unit = {
    val tag = sanitize(s"@${dsTag(d)}@")
    listRoot().foreach { f =>
      if (f.getFileName.toString.contains(tag)) rmTree(f)
    }
  }

  private def listRoot(): Seq[Path] = {
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
    finally s.close()
  }

  private def rmTree(p: Path): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete()
      ()
    }
    rm(p.toFile)
  }

  /** Per-table part-file budget for append-maintained artifact tables
    * (override: `graft.compact.maxFiles`). The incremental updaters
    * deliberately add O(1) files per micro-batch (hard-link carry +
    * batch append — the O(batch) append contract), so after thousands
    * of batches a table's file count, not its byte count, becomes the
    * scan-planning cost, and the file-level min/max pruning the freq
    * crossing probe and the funnel epoch delta rely on decays (every
    * tiny batch file is a candidate). Crossing the budget triggers an
    * in-place rewrite at append time; between compactions the count
    * stays under budget + the O(1) files one batch adds. */
  def maxFilesPerTable: Int =
    sys.props.get("graft.compact.maxFiles").flatMap(_.toIntOption).getOrElse(48)

  /** Compacted-file size target — at 100 TB the rewrite should land
    * HDFS-block-sized files, not one giant row group. */
  private[graft] val TargetFileBytes = 128L << 20

  /** Count of data part files directly under `dir` (manifest/_SUCCESS
    * excluded) — the quantity the compaction budget bounds. */
  def partFileCount(dir: Path): Int = {
    if (!Files.isDirectory(dir)) return 0
    val s = Files.list(dir)
    try { import scala.jdk.CollectionConverters._
      s.iterator().asScala.count(f =>
        Files.isRegularFile(f) && f.getFileName.toString.startsWith("part-")) }
    finally s.close()
  }

  /** Bytes of data part files directly under `dir`. */
  private def dataBytes(dir: Path): Long = {
    val l = Files.list(dir)
    try { import scala.jdk.CollectionConverters._
      l.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.startsWith("part-"))
        .map(Files.size).sum }
    finally l.close()
  }

  /** Size-implied file-count floor: the count a compaction rewrite
    * lands on — ceil(bytes / 128 MB), min 1. A table this large can
    * never sit below this many target-sized files, so the compaction
    * TRIGGER must sit a full budget above it: triggering at the bare
    * [[maxFilesPerTable]] would, once the table outgrows
    * budget × 128 MB, land every rewrite exactly at the trigger and
    * re-fire a full-table rewrite on the very next append — O(data)
    * per append in steady state, defeating the O(batch) contract at
    * precisely the scale the budget exists for. */
  private[graft] def sizeFloor(bytes: Long): Int =
    math.max(1L, math.min(Int.MaxValue.toLong,
      (bytes + TargetFileBytes - 1) / TargetFileBytes)).toInt

  /** The pure arithmetic behind [[needsCompaction]]/[[compactIfNeeded]],
    * extracted so the steady-state contract is spec-pinned on synthetic
    * sizes (WarehouseSpec exercises floors ≫ 1 without writing GBs):
    * trigger only when the part count exceeds the size-implied floor by
    * more than slack × budget, so a rewrite (which lands AT the floor)
    * buys ~budget appends of headroom at ANY table size — triggering at
    * the bare budget would re-fire a full-table rewrite on every append
    * once the table outgrows budget × 128 MB. */
  private[graft] def needsCompactionAt(nParts: Long, bytes: Long,
      slack: Int = 1): Boolean =
    nParts > slack.toLong * maxFilesPerTable &&
      nParts > sizeFloor(bytes).toLong + slack.toLong * maxFilesPerTable

  /** True when `dir`'s part-file count exceeds its size-implied floor
    * by more than [[maxFilesPerTable]] — the condition under which a
    * rewrite buys ~budget appends of headroom. */
  def needsCompaction(dir: Path): Boolean =
    needsCompactionAt(partFileCount(dir), dataBytes(dir))

  /** In-place compaction of one append-maintained parquet table when
    * its part-file count crosses its size floor + [[maxFilesPerTable]]:
    * rewrite into ceil(bytes / 128 MB) files (floor 1, UNCAPPED — a
    * multi-GB table compacts to however many 128 MB files it needs),
    * range-partitioned and sorted on `sortCols` so every file carries
    * tight min/max stats on the table's pruning key — the freq `post/`
    * probe (token isin) and the funnel's doc_b high-water delta PRUNE
    * BETTER after compaction than against the carried batch files.
    * Rows are untouched, so append == rebuild equality is unaffected
    * (soak-spec-asserted). `slack` widens the trigger (floor +
    * slack × budget) — the synchronous backstop behind the staged
    * off-path compaction passes 2 so it fires only when staging has
    * fallen pathologically behind.
    *
    * MUST run inside a build-in-progress `.tmp-` dir (enforced): the
    * rewrite is rmTree-then-move, and a crash between the two loses
    * the table — inside tmp that is absorbed by the artifact protocol
    * (a failure litters tmp, never a completed key); against a
    * completed artifact it would be data loss. The rewrite breaks
    * hard-link sharing with the prior version on purpose — that is the
    * amortized O(data/budget) per-append cost that buys back bounded
    * file counts. Returns true when a rewrite happened. */
  def compactIfNeeded(s: SparkSession, dir: Path,
      sortCols: Seq[String] = Nil, slack: Int = 1,
      codec: Option[String] = None): Boolean = {
    val nParts = partFileCount(dir)
    if (nParts <= slack * maxFilesPerTable) return false
    val bytes = dataBytes(dir)
    if (!needsCompactionAt(nParts, bytes, slack)) return false
    val floor = sizeFloor(bytes)
    require(dir.toAbsolutePath.toString.contains(".tmp-"),
      s"compactIfNeeded must target a table inside a .tmp- build dir " +
        s"(got $dir): the rmTree+move rewrite is only crash-safe under " +
        "the artifact completion protocol")
    // the staging name keeps ".tmp-"-style invisibility: prune/latest
    // skip anything containing ".compact-", and invalidate's
    // table@dataset match sweeps a crash's litter
    val staging = dir.resolveSibling(
      dir.getFileName.toString + s".compact-${System.nanoTime()}")
    try writeParquet(compacted(s, dir, floor, sortCols), staging.toString, codec)
    catch { case e: Throwable => rmTree(staging); throw e }
    rmTree(dir)
    Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
    true
  }

  /** The size-floor rewrite plan of a table — shared by the in-place
    * and the staged compaction paths so both land identical layouts. */
  private def compacted(s: SparkSession, dir: Path, target: Int,
      sortCols: Seq[String]): DataFrame = {
    val df = s.read.parquet(dir.toString)
    if (sortCols.nonEmpty)
      df.repartitionByRange(target, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    else df.repartition(target)
  }

  /** [[compactIfNeeded]] over a PARTITIONED parquet tree (the IVF
    * `cells/cell=N` inverted file): each leaf partition dir compacts
    * independently against the same budget (appends land one file per
    * touched cell per batch, so the per-cell count is the one that
    * grows). No sort key — a cell's rows are served whole. Returns the
    * number of leaf dirs rewritten. */
  def compactTreeIfNeeded(s: SparkSession, root: Path,
      sortCols: Seq[String] = Nil, codec: Option[String] = None): Int = {
    if (!Files.isDirectory(root)) return 0
    val l = Files.list(root)
    val leaves =
      try { import scala.jdk.CollectionConverters._
        l.iterator().asScala.filter(Files.isDirectory(_)).toList }
      finally l.close()
    leaves.count(compactIfNeeded(s, _, sortCols, 1, codec))
  }

  // ---------------------------------------------------- staged compaction
  /** Single background stager: staged compactions are an optimization,
    * not a throughput path — one daemon thread bounds their resource
    * draw and serializes the (rare) rewrites. */
  private lazy val stagePool = java.util.concurrent.Executors
    .newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-compact-stager")
      t.setDaemon(true)
      t
    })
  private val stageInflight =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.Future[_]]()
  /** Staging attempts that failed (source pruned mid-read, etc.) —
    * lost OPTIMIZATION, never lost data; observable so a soak that
    * somehow never adopts a staged copy is diagnosable. */
  private[graft] val stageMisses = new java.util.concurrent.atomic.AtomicInteger

  private def stagedRoot(artifactDir: Path): Path =
    artifactDir.resolveSibling(
      artifactDir.getFileName.toString + ".compact-staged")

  /** The completed staged-compaction copy of `table` under a COMPLETED
    * artifact, if the background stager has finished one. The staged
    * dir appears atomically (work-dir rename), its source is immutable
    * (completed artifacts never mutate), and its name contains
    * ".compact-" so [[latest]]/[[prune]] never adopt it as an artifact. */
  def stagedTable(artifactDir: String, table: String): Option[Path] = {
    val t = stagedRoot(Paths.get(artifactDir)).resolve(table)
    if (Files.isDirectory(t)) Some(t) else None
  }

  /** Carry one prior table into a build-in-progress dir, adopting the
    * staged compacted copy when one is ready — the off-critical-path
    * half of the compaction contract: the append that detected the
    * over-budget count completed WITHOUT rewriting (it scheduled the
    * stager instead), and the NEXT append pays only this O(files)
    * hard-link adoption. Row sets are identical either way. */
  def carryTable(prior: String, table: String, into: Path): Unit =
    copyData(stagedTable(prior, table).map(_.toString)
      .getOrElse(s"$prior/$table"), into)

  /** Schedule a background compaction of `artifactDir/table` into the
    * artifact's `.compact-staged` sibling. Idempotent per (artifact,
    * table); a failure (e.g. the artifact was pruned mid-read because
    * a newer version landed first) only counts a miss — the next
    * append's synchronous backstop still bounds file counts. Crash
    * litter (work dirs, staged dirs of pruned artifacts) is swept by
    * [[prune]]/[[invalidate]]'s name match. */
  def scheduleStagedCompaction(s: SparkSession, artifactDir: String,
      table: String, sortCols: Seq[String]): Unit = {
    if (stagedTable(artifactDir, table).isDefined) return
    val key = s"$artifactDir#$table"
    stageInflight.computeIfAbsent(key, _ => stagePool.submit(new Runnable {
      def run(): Unit = {
        try {
          val src = Paths.get(artifactDir, table)
          if (Files.isDirectory(src) && needsCompaction(src)) {
            val work = Paths.get(
              artifactDir + s".compact-work-${System.nanoTime()}")
            val workTable = work.resolve(table)
            try {
              writeParquet(
                compacted(s, src, sizeFloor(dataBytes(src)), sortCols),
                workTable.toString)
              val dst = stagedRoot(Paths.get(artifactDir)).resolve(table)
              Files.createDirectories(dst.getParent)
              Files.move(workTable, dst, StandardCopyOption.ATOMIC_MOVE)
            } finally rmTree(work)
          }
        } catch { case scala.util.control.NonFatal(_) =>
          stageMisses.incrementAndGet(); ()
        } finally stageInflight.remove(key)
        ()
      }
    }))
    ()
  }

  /** Block until every scheduled staged compaction has settled — the
    * determinism hook the soak specs (and a clean shutdown) use. */
  private[graft] def awaitStagedCompactions(): Unit = {
    import scala.jdk.CollectionConverters._
    stageInflight.values.asScala.toList.foreach { f =>
      try { f.get(); () } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Parquet write that stays READABLE when the relation is empty: a
    * zero-task write leaves no footer-bearing part file and a later
    * `read.parquet` dies on schema inference — exactly the shape of the
    * near-dup AUDIT table, empty by design until a bucket overflows. An
    * empty result rewrites as one empty task so the schema lands in a
    * footer. */
  def writeParquet(df: DataFrame, dir: String,
      codec: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    codec.foreach(c => w.option("compression", c))
    w.parquet(dir)
    val s = Files.list(Paths.get(dir))
    val hasPart =
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.exists(_.getFileName.toString.startsWith("part-")) }
      finally s.close()
    if (!hasPart) {
      val sp = df.sparkSession
      sp.createDataFrame(sp.sparkContext.parallelize(Seq.empty[Row], 1), df.schema)
        .write.mode("overwrite").parquet(dir)
    }
  }
}
