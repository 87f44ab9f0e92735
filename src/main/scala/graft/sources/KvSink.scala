package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** File-backed key-value SINK — the write half of the DataSource V2
  * surface ([[SeqSourceProvider]] is the read half), and the Spark analog
  * of the reference's Store layer (/root/reference/src/Core/Store.hs:
  * workers persist partition files; the server treats a task as done only
  * once its output is registered).
  *
  * The interesting part is the COMMIT PROTOCOL, which is what turns
  * Spark's at-least-once task execution (see TaskRetrySpec) into
  * exactly-once output:
  *
  *   1. every task attempt writes to a private staged file
  *      `_staging/part-<partition>-<taskId>` — attempts never collide;
  *   2. a successful attempt's [[DataWriter.commit]] returns a message
  *      naming its staged file; a failed attempt's abort() deletes it;
  *   3. the driver's [[BatchWrite.commit]] — called once, with exactly
  *      one message per partition — MOVEs the named files into the
  *      target directory. Orphaned stragglers stay in `_staging`, which
  *      readers ignore (underscore-prefixed paths are hidden).
  *
  * Rows are written as CSV (long/int/double/string fields). String
  * fields PERCENT-ESCAPE the three characters that would break line/field
  * framing (`%` → %25, `,` → %2C, newline → %0A, CR → %0D) —
  * [[KvSourceProvider]] reverses the escape, and a committed directory
  * holding delimiter-free strings stays directly readable by
  * `spark.read.csv` / DuckDB too.
  *
  * PRECONDITION: `path` must be on a filesystem shared by executors and
  * driver — the staging directory lives UNDER the target path and the
  * driver publishes by filesystem move, the same assumption every
  * staged-file committer makes about its output filesystem. That holds
  * for local mode (this harness) and for a cluster writing to a mounted
  * shared FS; a production port to an object store would swap the
  * java.nio calls for the Hadoop FileSystem API, keeping the protocol
  * (per-attempt staged file → commit message → driver publish) as is.
  */
class KvSinkProvider extends TableProvider {
  // write-only: schema comes from the dataframe being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"), schema)
}

class KvTable(path: String, writeSchema: StructType) extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "graft kv sink requires option 'path'")
  override def name(): String = s"graft_kv_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KvBatchWrite(path, info.schema())
      }
    }
}

class KvBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    KvWriterFactory(path, schema)

  /** Driver-side atomic publish: exactly one staged file per partition
    * (Spark's OutputCommitCoordinator guarantees one committed attempt),
    * moved into the readable directory. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val published = messages.map { case KvCommit(staged) =>
      val src = Paths.get(staged)
      Files.move(src, dir.resolve(src.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
      src.getFileName.toString
    }
    KvCommitLog.append(dir, published.toSeq)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KvCommit(staged) => Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

case class KvCommit(stagedFile: String) extends WriterCommitMessage

/** The Store's COMMIT LOG — a Delta/Iceberg-style transaction log in
  * miniature: every successful [[KvBatchWrite.commit]] appends a hidden
  * manifest `_commit-N` naming exactly the files it published, so the
  * directory carries its own write history. Readers that pass
  * `asOfCommit=N` to [[KvSourceProvider]] plan splits from the manifests
  * with version ≤ N — SNAPSHOT TIME TRAVEL over the same committed
  * files, no copies. Manifests are underscore-hidden, so every existing
  * listing-based consumer (the source's default latest view, the net
  * daemon, compaction) is unaffected.
  *
  * Manifest writes are atomic AND no-clobber (a fully-written dot-hidden
  * temp published via hard link, which FAILS on an existing target
  * instead of replacing it), and versions are dense from 1. That makes
  * the log safe under CONCURRENT WRITERS — the Delta/Iceberg optimistic-
  * concurrency discipline: a lost race is an explicit conflict the
  * committer handles (bump-and-retry for this sink's union-semantics
  * delta manifests, content rebase or abort for the artifact stores'
  * snapshot manifests via [[commitMember]]), never a silently
  * overwritten commit. At 100 TB this is metadata-sized state: one
  * small file per commit, read only at plan time. */
object KvCommitLog {
  private val ManifestName = "_commit-(\\d+)".r

  /** (version, manifestPath) pairs present in `dir`, ascending. */
  def versions(dir: java.nio.file.Path): Seq[(Int, java.nio.file.Path)] = {
    val d = dir.toFile
    Option(d.listFiles()).getOrElse(Array.empty[File]).toSeq
      .flatMap(f => f.getName match {
        case ManifestName(v) => Some((v.toInt, f.toPath))
        case _ => None
      })
      .sortBy(_._1)
  }

  /** Latest committed version, 0 when the log is empty. */
  def latestVersion(dir: java.nio.file.Path): Int =
    versions(dir).lastOption.map(_._1).getOrElse(0)

  /** Attempt to publish `published` as EXACTLY `version`. The manifest
    * body is fully written to a dot-hidden temp (invisible to
    * [[versions]]) and published with `Files.createLink` — an atomic
    * create-if-absent, so when two writers race the same version
    * exactly one wins and the loser gets `false`, never a replaced
    * manifest. The temp name carries a writer nonce so racing writers
    * cannot clobber each other's staging either. */
  def tryAppendAt(dir: java.nio.file.Path, version: Int,
      published: Seq[String]): Boolean = {
    val tmp = dir.resolve(
      s"._commit-$version-${System.nanoTime}-${Thread.currentThread.getId}.tmp")
    Files.write(tmp, published.sorted.mkString("\n").getBytes("UTF-8"))
    try {
      Files.createLink(dir.resolve(s"_commit-$version"), tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        false
    }
  }

  /** Record one commit's published file names as the next free version
    * and return it. Lost races bump and retry, which is EXACT for this
    * log's delta semantics — [[filesAsOf]] unions all manifests ≤ asOf,
    * so each manifest names only its own files and commit order commutes.
    * Snapshot-style manifests (full member lists) must NOT use this
    * blind retry: they rebase or abort through [[commitMember]]. */
  def append(dir: java.nio.file.Path, published: Seq[String]): Int = {
    var v = latestVersion(dir) + 1
    while (!tryAppendAt(dir, v, published))
      v = math.max(v + 1, latestVersion(dir) + 1)
    v
  }

  /** OCC commit for the artifact stores' SNAPSHOT manifests: the member
    * was fully staged under `stagedName` (a dot-hidden name no reader or
    * vacuum can see); this claims a committed member name with an atomic
    * no-clobber rename, then publishes `manifestOf(v, name)` with the
    * atomic no-clobber [[tryAppendAt]] — so every interleaving with a
    * concurrent committer is an explicit outcome, never a silently
    * overwritten commit or a shared staging directory.
    *
    * `expectedBase` selects the conflict policy:
    *
    *   - `None` (REBASE — delta appends, full rebuilds): a lost manifest
    *     race re-invokes `manifestOf` at the next free version, and the
    *     function re-reads the winner's committed state — that is how a
    *     delta append folds a concurrent delta's members into its own
    *     manifest instead of dropping them. A taken member name (an
    *     in-flight or crashed claimant) just bumps the name counter: the
    *     manifest is the authority on membership, the versioned names
    *     are a convention, so name and version may drift past an orphan.
    *   - `Some(base)` (CAS — compaction, whose staged member is DERIVED
    *     from the snapshot at `base`): publish exactly at `base + 1`;
    *     any conflict (member name taken, or the manifest slot won by
    *     someone else) throws — the staged member stays on disk as an
    *     orphan no manifest names, the same crash-window shape every
    *     store already tolerates, and the caller re-runs against the
    *     new snapshot.
    *
    * Returns the committed version. */
  def commitMember(dir: java.nio.file.Path, stagedName: String,
      nameOf: Int => String, manifestOf: (Int, String) => Seq[String],
      expectedBase: Option[Int] = None): Int = {
    def conflict(what: String): Nothing =
      throw new IllegalStateException(
        s"concurrent commit at $dir superseded the version-" +
          s"${expectedBase.getOrElse(-1)} snapshot this member was " +
          s"derived from ($what); staged member left unpublished — " +
          "re-run the operation against the new head")
    // claim a committed member name (atomic no-clobber rename)
    var n = expectedBase.map(_ + 1).getOrElse(latestVersion(dir) + 1)
    var name = stagedName
    while (name == stagedName) {
      try {
        Files.move(dir.resolve(stagedName), dir.resolve(nameOf(n)))
        name = nameOf(n)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          if (expectedBase.isDefined)
            conflict(s"member name ${nameOf(n)} already claimed")
          n += 1
      }
    }
    // publish the manifest at the next free version (exactly base+1
    // under CAS), recomputing the content after every lost race
    var v = expectedBase.map(_ + 1).getOrElse(latestVersion(dir) + 1)
    while (true) {
      if (tryAppendAt(dir, v, manifestOf(v, name))) return v
      if (expectedBase.isDefined) conflict(s"version $v already committed")
      v = math.max(v + 1, latestVersion(dir) + 1)
    }
    throw new IllegalStateException("unreachable")
  }

  /** File names published by all commits with version ≤ asOf. */
  def filesAsOf(dir: java.nio.file.Path, asOf: Int): Set[String] =
    versions(dir).takeWhile(_._1 <= asOf).flatMap { case (_, p) =>
      Files.readAllLines(p).asScala.filter(_.nonEmpty)
    }.toSet

  /** VACUUM the log: drop every manifest below `keepFrom` and delete the
    * store entries (member directories or files) that only those dropped
    * manifests referenced. Retention is reference-based, not name-based:
    * an entry named by ANY retained manifest survives, so time travel
    * within [keepFrom, latest] is untouched and only genuinely
    * unreachable history is reclaimed. Deliberately touches nothing it
    * cannot account for — entries never named by a dropped manifest
    * (checkpoints, metas, staging dirs) are left alone. Returns the
    * deleted entry names. */
  def vacuum(dir: java.nio.file.Path, keepFrom: Int): Seq[String] = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"no commit log at $dir — nothing to vacuum")
    val latest = vs.last._1
    require(keepFrom >= 1 && keepFrom <= latest,
      s"vacuum keepFrom $keepFrom out of committed range [1, $latest] at $dir")
    val (dropped, kept) = vs.partition(_._1 < keepFrom)
    def names(ms: Seq[(Int, java.nio.file.Path)]): Set[String] =
      ms.flatMap { case (_, p) =>
        Files.readAllLines(p).asScala.filter(_.nonEmpty)
      }.toSet
    val doomed = (names(dropped) -- names(kept)).toSeq.sorted
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
      Files.deleteIfExists(f.toPath): Unit
    }
    doomed.foreach(n => rm(dir.resolve(n).toFile))
    dropped.foreach { case (_, p) => Files.deleteIfExists(p): Unit }
    doomed
  }
}

/** Field framing escape shared by sink (write) and source (read): a
  * string containing the field/record delimiters must round-trip, not
  * corrupt the file. Escape order matters — '%' first on write, last on
  * read. */
object KvEscape {
  def escape(s: String): String =
    s.replace("%", "%25").replace(",", "%2C")
      .replace("\n", "%0A").replace("\r", "%0D")
  def unescape(s: String): String =
    s.replace("%0D", "\r").replace("%0A", "\n")
      .replace("%2C", ",").replace("%25", "%")
}

case class KvWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, schema, partitionId, taskId)
}

class KvDataWriter(path: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val staged = {
    val d = new File(path, "_staging")
    d.mkdirs()
    new File(d, s"part-$partitionId-$taskId.csv")
  }
  private val out = new BufferedWriter(new FileWriter(staged))

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case StringType => KvEscape.escape(row.getUTF8String(i).toString)
        case dt => throw new IllegalArgumentException(
          s"graft kv sink: unsupported field type ${dt.catalogString}")
      }
    }.mkString(",")
    out.write(line)
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    KvCommit(staged.getAbsolutePath)
  }

  override def abort(): Unit = {
    out.close()
    staged.delete()
  }

  override def close(): Unit = ()
}
