package graft.chem

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The LIVE chemistry bridge (docs/CHEM_BRIDGE.md, VERDICT r12 item 2):
  * a process-boundary `ChemToolkit` that scores pairs the bridge TABLES
  * don't contain — the capability gap a reference user would hit with a
  * novel ligand (the reference computes parity live inside Python
  * workers, get_pdb_parity.py:88-107, with rdFMCS's own 40 s timeout,
  * nextflow.config:81).
  *
  * Shape: one worker subprocess PER PARTITION (spawned inside
  * `mapPartitions`, destroyed on task completion), a pipelined TSV
  * request/response protocol over stdio (`tools/chem_bridge_serve.py` —
  * swap the command for an RDKit-backed script in production; protocol,
  * batching, budget and failure envelope are the contract). Chemistry
  * applies only to the ligand DIMENSION, so the worker traffic is
  * dim-sized: distinct descriptors / distinct candidate pairs go through
  * the process, and the results broadcast-join back onto the caller's
  * rows — the fact path never crosses the process boundary.
  *
  * `columnPure = false` by construction (the score comes from external
  * state), so a registry built over this toolkit routes domainCognate
  * through the definitional path, exactly like [[TableChemToolkit]].
  *
  * Failure contract (the reference's): a pair whose computation FAILS
  * scores 0.0 (get_pdb_parity.py scores errored pairs 0); a pair that
  * exhausts its budget keeps the worker's best-so-far score (rdFMCS
  * `canceled`). A descriptor that fails canonicalisation comes back
  * null — the C11 cache-probe convention for "no canonical form".
  */
final case class ProcessChemToolkit(command: Seq[String],
                                    budgetMillis: Long = 40000L,
                                    inputIsDistinctPairs: Boolean = false)
    extends ChemToolkit {

  override val columnPure: Boolean = false

  override def canonicalize(df: DataFrame, inCol: String,
      outCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val cmd = command
    val canon = df.select(col(inCol).cast("string")).na.drop()
      .distinct().as[String]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else BridgeWorker.withWorker(cmd) { w =>
          w.batched(it, (r: String) => s"CANON\t${BridgeWorker.sanitize(r)}") {
            case (in, BridgeWorker.Ok(fields)) => (in, fields.headOption)
            case (in, BridgeWorker.Err(_))     => (in, None)
          }
        }
      }
      .toDF("__pc_in", outCol)
    df.join(broadcast(canon),
        df(inCol).cast("string") === canon("__pc_in"), "left")
      .drop("__pc_in")
  }

  override def scoreCandidates(df: DataFrame, aCol: String, bCol: String,
      boundSizeCol: String, cognateSizeCol: String,
      outCol: String): DataFrame =
    if (inputIsDistinctPairs)
      scoreCandidatesDirect(df, aCol, bCol, boundSizeCol, cognateSizeCol,
        outCol)
    else
      scoreCandidatesDeduped(df, aCol, bCol, boundSizeCol, cognateSizeCol,
        outCol)

  /** Single-pass form for callers whose rows ARE the distinct candidate
    * pairs (the registry's blocked candidate set is — one row per
    * (ligand, cognate) by construction): appends the score in ONE narrow
    * mapPartitions, no dedup shuffle and no join-back sort. The general
    * form below pays both to keep worker traffic distinct-grained when
    * the input carries repeats; the constructor flag
    * `inputIsDistinctPairs` states the caller's guarantee (the two
    * forms are spec-pinned value-equal in ProcessChemSpec). A row with a
    * null pair component scores null, matching the deduped form's
    * left-join semantics.
    */
  private def scoreCandidatesDirect(df: DataFrame, aCol: String,
      bCol: String, boundSizeCol: String, cognateSizeCol: String,
      outCol: String): DataFrame = {
    val cmd = command
    val budget = budgetMillis
    val schema = df.schema.add(outCol,
      org.apache.spark.sql.types.DoubleType, nullable = true)
    val (ai, bi, bsi, csi) = (df.schema.fieldIndex(aCol),
      df.schema.fieldIndex(bCol), df.schema.fieldIndex(boundSizeCol),
      df.schema.fieldIndex(cognateSizeCol))
    def longAt(r: org.apache.spark.sql.Row, i: Int): java.lang.Long =
      r.get(i) match {
        case null       => null
        case l: Long    => l
        case n: Number  => n.longValue()
        case other      => other.toString.toLong
      }
    // Worker parallelism = input partitions. A dim-derived candidate set
    // often arrives on a handful of scan splits (the deduped form got its
    // parallelism from the distinct's shuffle as a side effect) — ONE
    // round-robin spread keeps all worker slots busy and still skips the
    // dedup aggregation and the join-back sorts. At fact-scale inputs the
    // partition count is already ≥ the session's shuffle parallelism and
    // no shuffle is added.
    val shuffleParts =
      df.sparkSession.sessionState.conf.numShufflePartitions
    val spread =
      if (df.rdd.getNumPartitions < shuffleParts) df.repartition(shuffleParts)
      else df
    spread.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else BridgeWorker.withWorker(cmd, budget) { w =>
        w.batchedOpt(it, { r: org.apache.spark.sql.Row =>
          val (a, b) = (r.get(ai), r.get(bi))
          val (bs, cs) = (longAt(r, bsi), longAt(r, csi))
          if (a == null || b == null || bs == null || cs == null) None
          else Some(s"PSIZE\t${BridgeWorker.sanitize(a.toString)}\t" +
            s"${BridgeWorker.sanitize(b.toString)}\t$bs\t$cs\t$budget")
        }) {
          case (r, Some(BridgeWorker.Ok(fields))) =>
            org.apache.spark.sql.Row.fromSeq(
              r.toSeq :+ (fields.head.toDouble: java.lang.Double))
          case (r, Some(BridgeWorker.Err(_))) =>
            org.apache.spark.sql.Row.fromSeq(
              r.toSeq :+ (0.0: java.lang.Double)) // computed failure = 0
          case (r, None) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private def scoreCandidatesDeduped(df: DataFrame, aCol: String,
      bCol: String, boundSizeCol: String, cognateSizeCol: String,
      outCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val cmd = command
    val budget = budgetMillis
    val scored = df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"),
        col(boundSizeCol).cast("long").as("bs"),
        col(cognateSizeCol).cast("long").as("cs"))
      .na.drop().distinct().as[(String, String, Long, Long)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else BridgeWorker.withWorker(cmd, budget) { w =>
          w.batched(it, (r: (String, String, Long, Long)) =>
            s"PSIZE\t${BridgeWorker.sanitize(r._1)}\t" +
              s"${BridgeWorker.sanitize(r._2)}\t${r._3}\t${r._4}\t$budget") {
            case (r, BridgeWorker.Ok(fields)) =>
              (r._1, r._2, r._3, r._4, fields.head.toDouble)
            case (r, BridgeWorker.Err(_)) =>
              (r._1, r._2, r._3, r._4, 0.0) // computed failure = 0, never null
          }
        }
      }
      .toDF("__pa", "__pb", "__pbs", "__pcs", outCol)
    // NO broadcast hint here (unlike canonicalize's genuinely dim-sized
    // distinct-descriptor table): the scored side is the full blocked
    // candidate-pair set — same cardinality class as `df` itself — and a
    // forced broadcast of it stops fitting any heap the moment blocks
    // grow. AQE picks broadcast when it IS small and sort-merge when not.
    df.join(scored,
        df(aCol).cast("string") === scored("__pa") &&
          df(bCol).cast("string") === scored("__pb") &&
          df(boundSizeCol).cast("long") === scored("__pbs") &&
          df(cognateSizeCol).cast("long") === scored("__pcs"), "left")
      .drop("__pa", "__pb", "__pbs", "__pcs")
  }

  /** Live STRUCTURE scoring — the novel-ligand path the table backend
    * cannot serve: PARITY from the two descriptors themselves (the
    * reference's compare_molecules consumes molecules, not sizes). Adds
    * `outCol` (double score; 0.0 on computed failure) and
    * `<outCol>_status` (ok | timeout | failure — rdFMCS's canceled flag
    * surfaces as `timeout` with the best-so-far score kept).
    */
  def scoreStructures(df: DataFrame, aCol: String, bCol: String,
      outCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val cmd = command
    val budget = budgetMillis
    val scored = df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b")).na.drop()
      .distinct().as[(String, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else BridgeWorker.withWorker(cmd, budget) { w =>
          w.batched(it, (r: (String, String)) =>
            s"PMOL\t${BridgeWorker.sanitize(r._1)}\t" +
              s"${BridgeWorker.sanitize(r._2)}\t$budget") {
            case (r, BridgeWorker.Ok(fields)) =>
              (r._1, r._2, fields.head.toDouble, fields(1))
            case (r, BridgeWorker.Err(_)) =>
              (r._1, r._2, 0.0, "failure")
          }
        }
      }
      .toDF("__pa", "__pb", outCol, s"${outCol}_status")
    // same no-hint reasoning as scoreCandidates: the distinct pair set
    // scales with the caller's candidate generation, not with a dim
    df.join(scored,
        df(aCol).cast("string") === scored("__pa") &&
          df(bCol).cast("string") === scored("__pb"), "left")
      .drop("__pa", "__pb")
  }
}

/** The CHEM_BRIDGE.md "fallback" seam realized over the same worker
  * protocol: a [[ParityKernel]] for `ParityScorer`'s mapPartitions tier
  * that forwards each pair (with its budget) to the process boundary.
  * One worker per TASK (the kernel deserializes per task; the lazy
  * worker registers its own completion-listener cleanup), synchronous
  * per-pair request/response — the shape an inline RDKit MCS scorer
  * takes when the precomputed tables can't serve a pair. The atom
  * mapping mirrors FixtureKernel's stand-in (first min(sizes) indices);
  * a real MCS kernel returns the match from the search itself.
  */
final case class ProcessParityKernel(command: Seq[String])
    extends ParityKernel {

  @transient private lazy val worker: BridgeWorker = {
    val w = new BridgeWorker(command)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => w.close())
    w
  }

  override def compare(p: CandidatePair,
                       budgetMillis: Long): (Double, Seq[Int], Boolean) =
    worker.one(s"PSIZE\t${p.ligandUniqueID}\t${p.cogId}\t" +
        s"${p.boundSize}\t${p.cognateSize}\t$budgetMillis") match {
      case BridgeWorker.Ok(fields) =>
        ((fields.head.toDouble,
          (1 to math.min(p.boundSize, p.cognateSize)).toSeq,
          fields(1) == "timeout"))
      case BridgeWorker.Err(m) =>
        // ParityScorer's catch maps this to the reference's errored-pair
        // convention: score 0, status failure
        throw new java.io.IOException(s"bridge worker error: $m")
    }
}

object ProcessChemToolkit {
  /** The committed stand-in worker (see its module docstring): replace
    * with an RDKit-environment script in production; same protocol.
    */
  def default(budgetMillis: Long = 40000L): ProcessChemToolkit =
    ProcessChemToolkit(Seq("python3",
      new java.io.File("tools/chem_bridge_serve.py").getAbsolutePath),
      budgetMillis)

  /** Whether the default worker can run here (used by specs to skip
    * rather than fail on a python-less host).
    */
  def available: Boolean =
    try {
      val p = new ProcessBuilder("python3", "--version").start()
      p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS) &&
        p.exitValue() == 0
    } catch { case scala.util.control.NonFatal(_) => false }
}

/** One worker subprocess + the pipelined line protocol. Constructed on
  * the EXECUTOR inside mapPartitions (never serialized); destroyed in a
  * finally. Batches of [[BatchSize]] requests are written then their
  * responses read — small enough that response bytes can never fill the
  * 64 KiB pipe buffer while requests are still being written (the
  * classic two-pipe deadlock), large enough to amortize the syscall per
  * flush.
  */
private[chem] final class BridgeWorker(command: Seq[String],
                                       budgetMillis: Long = 40000L) {
  import BridgeWorker._

  // hang-guard for ONE response: a worker honoring its per-pair budget
  // answers within it (the stand-in and rdFMCS both self-limit), so the
  // guard is the budget plus scheduling grace — NOT a fixed constant
  // that would kill a legitimate long-budget pair (a 120 s MCS budget
  // must not be preempted at 60 s; the caller chose that budget)
  private val responseDeadlineMillis: Long =
    math.max(60000L, budgetMillis + 20000L)

  private val proc = new ProcessBuilder(command: _*)
    .redirectError(ProcessBuilder.Redirect.INHERIT)
    .start()
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(proc.getOutputStream,
      StandardCharsets.UTF_8))
  // OWNED response buffer (r14, completing the r13 fix): the r13
  // BufferedInputStream removed the per-byte read() syscall but NOT the
  // per-byte available() one — java.io.BufferedInputStream.available()
  // always adds the UNDERLYING stream's available(), i.e. still one pipe
  // ioctl per response byte (~14M syscalls for i8's ~700k × ~20-byte
  // responses; the run ≫ cpu residual in the i8 exec profile). Owning
  // the buffer makes the per-byte path a pure array read; the pipe is
  // polled (available + chunked read) only when the buffer drains, so
  // the deadline guard below is unchanged.
  private val in = proc.getInputStream
  private val rdBuf = new Array[Byte](1 << 16)
  private var rdPos = 0
  private var rdEnd = 0
  private val lineBuf = new java.io.ByteArrayOutputStream(256)

  /** One synchronous request/response (the per-pair kernel path). */
  def one(line: String): Response = {
    out.write(line); out.write('\n')
    out.write("FLUSH"); out.write('\n')
    out.flush()
    readResponse()
  }

  /** Map `rows` through the worker: render each request with `req`,
    * decode each response with `resp`. Lazily batched — the returned
    * iterator drives the protocol as it is consumed.
    */
  def batched[A, B](rows: Iterator[A], req: A => String)
                   (resp: (A, Response) => B): Iterator[B] =
    batchedOpt[A, B](rows, r => Some(req(r))) {
      case (r, Some(response)) => resp(r, response)
      case (r, None) => // unreachable: every req is Some
        throw new IllegalStateException("batched: missing response")
    }

  /** [[batched]] with per-row opt-out: rows whose `req` is None never
    * cross the process boundary and decode with a None response (the
    * null-component passthrough of the direct scoring path).
    */
  def batchedOpt[A, B](rows: Iterator[A], req: A => Option[String])
                      (resp: (A, Option[Response]) => B): Iterator[B] =
    rows.grouped(BatchSize).flatMap { group =>
      val rendered = group.map(r => (r, req(r)))
      rendered.foreach {
        case (_, Some(line)) => out.write(line); out.write('\n')
        case _ => ()
      }
      // batch boundary marker: the worker buffers its responses and
      // flushes ONCE here instead of per line (per-line flush = one
      // write syscall per response, measured as the worker's floor)
      out.write("FLUSH"); out.write('\n')
      out.flush()
      rendered.map {
        case (r, Some(_)) => resp(r, Some(readResponse()))
        case (r, None)    => resp(r, None)
      }
    }

  /** One response line, deadline-guarded by [[responseDeadlineMillis]]:
    * a HUNG worker (past budget + grace) is a broken deployment and
    * fails the task loudly rather than stalling an executor slot
    * forever.
    */
  private def readResponse(): Response = {
    val deadline =
      System.nanoTime() + responseDeadlineMillis * 1000000L
    lineBuf.reset()
    while (true) {
      if (rdPos < rdEnd) {
        val b = rdBuf(rdPos); rdPos += 1
        if (b == '\n') {
          val line = new String(lineBuf.toByteArray, StandardCharsets.UTF_8)
          val fields = line.split("\t", -1).toSeq
          return fields.headOption match {
            case Some("OK") => Ok(fields.tail)
            case _          => Err(fields.drop(1).mkString(" "))
          }
        }
        lineBuf.write(b)
      } else {
        // buffer drained — one availability poll + one chunked read
        val avail = in.available()
        if (avail > 0) {
          val n = in.read(rdBuf, 0, math.min(avail, rdBuf.length))
          if (n < 0)
            throw new java.io.IOException(
              s"chem bridge worker closed its pipe mid-response: $command")
          rdPos = 0; rdEnd = n
        } else {
          if (!proc.isAlive && in.available() == 0)
            throw new java.io.IOException(
              s"chem bridge worker died (exit ${proc.exitValue()}): $command")
          if (System.nanoTime() > deadline)
            throw new java.io.IOException(
              s"chem bridge worker hung past ${responseDeadlineMillis} ms: " +
              s"$command")
          Thread.sleep(1L)
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def close(): Unit = {
    try out.close()
    catch { case scala.util.control.NonFatal(_) => () }
    proc.destroyForcibly()
    ()
  }
}

private[chem] object BridgeWorker {
  val BatchSize = 256

  sealed trait Response
  final case class Ok(fields: Seq[String]) extends Response
  final case class Err(message: String) extends Response

  /** Tabs/newlines would corrupt the framing — they cannot occur in a
    * descriptor (SMILES alphabet), but a data error must not desync the
    * protocol.
    */
  def sanitize(s: String): String =
    if (s == null) "" else s.replace('\t', ' ').replace('\n', ' ')

  /** Run `body` with a worker bound to THIS task: closed on task
    * completion (covers both full consumption and early termination of
    * the returned iterator — Spark's limit/take stop consuming without
    * draining).
    */
  def withWorker[T](command: Seq[String], budgetMillis: Long = 40000L)
                   (body: BridgeWorker => Iterator[T]): Iterator[T] = {
    val w = new BridgeWorker(command, budgetMillis)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => w.close())
    body(w)
  }
}
