package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Pipeline
import graft.model.GraftConfig

/** Incremental near-dup detection over a stream of pages (Structured
  * Streaming, `foreachBatch`): each micro-batch runs the batch stages on the
  * NEW urls only, against durable state tables —
  *
  *   signatures(node_id, n_bytes, minhash, simhash, band_hashes)   [state]
  *   members(url, node_id, n_bytes, warc_ts, batch_id)              [state]
  *   edges(id_a, id_b)                                              [state]
  *   clusters(url, node_id, cluster_id, n_bytes, warc_ts, batch_id) [state+output:
  *     the resolved latest binding per url with its component label]
  *
  * Per batch: extract -> new distinct contents (anti-join on stored
  * signatures) -> signatures for new contents only -> LSH candidates of
  * (new x (new + stored)) via band-key join -> verify (new texts join the
  * batch; stored side keeps no text, so verification uses signature-level
  * gates: MinHash-estimated Jaccard and SimHash Hamming) -> append edges ->
  * connected components over the AFFECTED components only -> swap in the
  * updated clusters table (untouched clusters carried forward verbatim).
  *
  * This is the reference's checkpoint-resume design (nullable-checksum
  * columns as "already computed" state, file_db.rs:375-388) turned into
  * streaming state: presence in the signatures table == stage done for that
  * content, forever. That contract is only sound because the signatures
  * append runs LAST in every batch (see the append block in processBatch):
  * foreachBatch is at-least-once, and a replay after a crash must recompute
  * a content's candidates/edges unless ALL of them are already durable.
  * The bounded-channel pipeline of the reference (main.rs:145-166) maps to
  * micro-batch backpressure.
  *
  * Scale notes: per-batch work is O(batch) signatures + an equi-join of the
  * batch's band keys against the state band table (pushdown-friendly
  * parquet; Iceberg at real scale); hot stored bands are salted into
  * bounded cells (same policy as batch ST2), so boilerplate bands that
  * accumulate members over months cannot make per-batch work grow with
  * stored-band size; reclustering is bounded to the components TOUCHED by
  * the batch (new bindings, superseded bindings, new edges) — untouched
  * clusters are carried forward verbatim, so per-batch CC cost is
  * O(affected dup-graph), not O(all accumulated edges). State dirs are
  * periodically compacted (dup edges merged, member history reduced to
  * latest-per-url, dead nodes GC'd), so a years-long stream holds state
  * proportional to the LIVE corpus, not to its history.
  */
object IncrementalDedup {

  final case class StateDirs(root: String) {
    val signatures = s"$root/signatures"
    val bandIndex = s"$root/band_index"
    val members = s"$root/members"
    /** Optional (cfg.incRetainTexts): (node_id, text) per distinct content,
      * enabling full ST3 verify on cross-batch pairs. node_id is the
      * content hash, so rows can be missing/orphaned but never stale. */
    val texts = s"$root/texts"
    val edges = s"$root/edges"
    val clusters = s"$root/clusters"
    val metrics = s"$root/metrics"
    val checkpoint = s"$root/_checkpoint"
    val versionFile = s"$root/_state_version.json"
  }

  /** Current state-schema version. History:
    *  1 — round-1 layout: members(url, node_id, n_bytes), no re-crawl
    *      invalidation possible;
    *  2 — members carry (warc_ts, batch_id) so the latest binding per url
    *      wins deterministically;
    *  3 — clusters carry the resolved (warc_ts, batch_id) binding per url,
    *      enabling the bounded affected-component recluster (migration =
    *      one full rebuild from members+edges).
    * Mirrors the reference's schema_version gate + v<=2 -> v3 migration
    * (/root/reference/src/file_db.rs:66-77, 457-511): older versions are
    * migrated in place, NEWER versions are refused (never silently
    * reinterpreted by old code). */
  final val StateVersion = 3

  private def exists(p: String): Boolean = Files.exists(Paths.get(p))

  private val VersionField = """"version"\s*:\s*(\d+)""".r

  private def readVersion(dirs: StateDirs): Option[Int] =
    if (!exists(dirs.versionFile)) None
    else VersionField.findFirstMatchIn(
      new String(Files.readAllBytes(Paths.get(dirs.versionFile)),
        java.nio.charset.StandardCharsets.UTF_8)).map(_.group(1).toInt)

  private def writeVersion(dirs: StateDirs, bandChunks: Int, sigConfig: String): Unit = {
    Files.createDirectories(Paths.get(dirs.root))
    val tmp = Paths.get(dirs.root, s".ver-tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp,
      (s"""{"version": $StateVersion, "simhash_tier": ${if (bandChunks > 0) 1 else 0}, """ +
        s""""band_chunks": $bandChunks, "sig_config": "$sigConfig"}""").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dirs.versionFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def tierEnabled(cfg: GraftConfig): Boolean =
    cfg.simhashTier && cfg.maxHamming >= 0

  /** How many SimHash pigeonhole chunk-key families this config's band
    * index carries (0 = MinHash-only). The chunk count is maxHamming + 1
    * (Pipeline.simhashChunkKeys), so a maxHamming change with the tier on
    * changes every stored chunk key — same rebuild obligation as the
    * on/off toggle. */
  private def wantBandChunks(cfg: GraftConfig): Int =
    if (tierEnabled(cfg)) cfg.maxHamming + 1 else 0

  /** The durable-state signature fingerprint: every knob that changes the
    * MEANING of stored minhash/band_hashes/simhash rows. A restart with a
    * different value cannot be reconciled with existing signature state —
    * new band keys would never match stored ones (silent, permanent
    * cross-batch recall loss) and estimate-tier comparisons would mix
    * incompatible permutation families — so `ensureStateVersion` refuses
    * it loudly. Thresholds (minJaccard, maxHamming-as-verify-gate, LCS)
    * are deliberately NOT in the fingerprint: they gate future decisions,
    * not the validity of stored rows. */
  private[streaming] def sigConfigOf(cfg: GraftConfig): String =
    s"k${cfg.shingleK}|p${cfg.numPerm}|b${cfg.bands}|s${cfg.seed}"

  private val TierField = """"simhash_tier"\s*:\s*(\d)""".r
  private val BandChunksField = """"band_chunks"\s*:\s*(-?\d+)""".r
  private val SigConfigField = """"sig_config"\s*:\s*"([^"]*)"""".r

  private def readVersionFile(dirs: StateDirs): Option[String] =
    if (!exists(dirs.versionFile)) None
    else Some(new String(Files.readAllBytes(Paths.get(dirs.versionFile)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Which chunk-key families the durable band index holds, as recorded in
    * the version file. Legacy files (pre-field) recorded only the boolean
    * tier: true maps to -1 ("chunk keys of an UNKNOWN maxHamming" — never
    * equal to any want, forcing one rebuild that stamps the real count),
    * false to 0. Absent file (pre-knob state) means MinHash-only. */
  private def readBandChunks(dirs: StateDirs): Option[Int] =
    readVersionFile(dirs).flatMap { txt =>
      BandChunksField.findFirstMatchIn(txt).map(_.group(1).toInt)
        .orElse(TierField.findFirstMatchIn(txt).map(m => if (m.group(1) == "1") -1 else 0))
    }

  private def readSigConfig(dirs: StateDirs): Option[String] =
    readVersionFile(dirs).flatMap(SigConfigField.findFirstMatchIn(_).map(_.group(1)))

  /** The durable band index holds the key families of whichever tiers were
    * enabled when its rows were appended, so a `simhashTier` toggle — or a
    * `maxHamming` change while the tier is on, which redraws every chunk
    * boundary — on existing state must REBUILD it: otherwise pre-change
    * docs silently lack (or carry stale) chunk keys and the cross-batch
    * Hamming recall the knob promises never materializes (and a toggle OFF
    * would strand chunk keys forever). The rebuild is a deterministic
    * projection of the signature state (band_hashes and simhash are both
    * retained per node) — no text is recomputed — via the same crash-safe
    * swap as every state rewrite. */
  private def ensureBandIndex(spark: SparkSession, cfg: GraftConfig, dirs: StateDirs): Unit = {
    val want = wantBandChunks(cfg)
    val have = readBandChunks(dirs).getOrElse(0)
    if (have != want) {
      if (exists(dirs.signatures)) {
        val tmp = s"${dirs.bandIndex}.tmp-${java.util.UUID.randomUUID()}"
        Pipeline.bandKeys(spark.read.parquet(dirs.signatures), cfg).write.parquet(tmp)
        swapDir(tmp, dirs.bandIndex)
      }
      writeVersion(dirs, want, sigConfigOf(cfg))
    } else if (readBandChunks(dirs).isEmpty || readSigConfig(dirs).isEmpty)
      writeVersion(dirs, want, sigConfigOf(cfg)) // stamp missing fields
  }

  /** Version gate + in-place migration, run once per batch (cheap: a file
    * read once current). v1 members gain warc_ts = epoch, batch_id = -1 —
    * strictly older than any live batch, so any future re-crawl of a v1 url
    * supersedes its binding; v<=2 clusters are rebuilt from ground truth
    * (members + edges) into the v3 resolved-binding shape. A version from
    * the future is refused. */
  private[streaming] def ensureStateVersion(spark: SparkSession, cfg: GraftConfig, dirs: StateDirs): Unit = {
    // Heal interrupted swaps first: every swapped table must be present (or
    // restored from its aside copy) before any state is read this batch.
    // Every dir that swapDir ever targets (cluster writes, migration,
    // compaction) is covered.
    Seq(dirs.clusters, dirs.members, dirs.signatures, dirs.bandIndex, dirs.edges,
      dirs.metrics, dirs.texts)
      .foreach(recoverSwap)
    // An interrupted remap leaves tables keyed inconsistently: processing
    // batches against that state would bind new content to stale ids.
    // Refuse until the remap is re-run to completion.
    if (Files.exists(Paths.get(dirs.root, "_remap_journal.json")))
      throw new IllegalStateException(
        s"incremental state at ${dirs.root} has an in-progress node-id remap " +
          "(_remap_journal.json) - re-run remapNodeIds with the same mapping to completion first")
    // Signature-config gate: stored signatures/band keys are only
    // meaningful under the (shingleK, numPerm, bands, seed) that computed
    // them. A silent mismatch is the worst failure mode this state has —
    // new band keys never match stored ones, so every cross-batch
    // near-duplicate goes undetected with no error. A stamp from an older
    // library version is absent: trust-on-first-use (stamped below), same
    // as the pre-knob tier field.
    readSigConfig(dirs).foreach { stored =>
      val cur = sigConfigOf(cfg)
      if (stored != cur)
        throw new IllegalStateException(
          s"incremental state at ${dirs.root} was built with signature config " +
            s"[$stored] but this run uses [$cur] (shingleK|numPerm|bands|seed) - " +
            "stored signatures and band keys are incompatible with the new config. " +
            "Revert the config, point at a fresh state root, or rebuild state from " +
            "the original pages")
    }
    readVersion(dirs) match {
      case Some(StateVersion) => // current; key-family toggle still possible
        ensureBandIndex(spark, cfg, dirs)
      case Some(v) if v > StateVersion =>
        throw new IllegalStateException(
          s"incremental state at ${dirs.root} has schema version $v, newer than " +
          s"supported $StateVersion — refusing to reinterpret (upgrade the library)")
      case _ => // absent or older: migrate what exists, then stamp
        if (exists(dirs.members)) {
          val m = spark.read.parquet(dirs.members)
          if (!m.columns.contains("batch_id")) {
            // Migrate via temp-dir + crash-safe swap: an in-place overwrite
            // would delete the only copy of member state before rewriting
            // it, and a crash mid-write (before the version stamp) would be
            // unrecoverable. The swap keeps old-or-new present throughout;
            // re-running the migration after any crash is idempotent (the
            // batch_id column guard above).
            val tmp = s"${dirs.members}.tmp-${java.util.UUID.randomUUID()}"
            m.withColumn("warc_ts", lit(new java.sql.Timestamp(0L)))
              .withColumn("batch_id", lit(-1L))
              .select("url", "node_id", "n_bytes", "warc_ts", "batch_id")
              .write.parquet(tmp)
            swapDir(tmp, dirs.members)
          }
          rebuildClusters(spark, cfg, dirs) // v<=2 clusters -> v3 shape
          // pre-knob states hold a MinHash-only band index: stamp that,
          // then let the toggle path rebuild if this config wants more
          writeVersion(dirs, 0, sigConfigOf(cfg))
          ensureBandIndex(spark, cfg, dirs)
        } else writeVersion(dirs, wantBandChunks(cfg), sigConfigOf(cfg)) // fresh state
    }
  }

  private def readOrEmpty(spark: SparkSession, path: String, schemaOf: DataFrame): DataFrame =
    if (exists(path)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf.schema)

  /** Process one micro-batch of pages against the state under `dirs`.
    * Exposed for testing; `start` wires it into foreachBatch.
    *
    * Re-crawl semantics (the reference's changed-file invalidation,
    * /root/reference/src/file_db.rs:311-343): member rows carry
    * (batch_id, warc_ts), the cluster rewrite keeps only each url's LATEST
    * content binding, and edges whose endpoints no longer back any live url
    * are retired from clustering (signature/edge state is kept — if the
    * content reappears under another url it needs no recompute). A batch
    * that introduces no new (url, node_id) binding is a no-op: state and
    * clusters are left untouched. */
  def processBatch(batch: DataFrame, cfg: GraftConfig, dirs: StateDirs, batchId: Long = 0L,
      crashAfterAppends: Int = Int.MaxValue): Unit = {
    val spark = batch.sparkSession
    ensureStateVersion(spark, cfg, dirs)
    if (batch.isEmpty) return
    // Test hook mirroring remapNodeIds' crashAfterTables: die before the
    // (crashAfterAppends+1)-th state append, so the replay-resume contract
    // (see the append block below) is exercisable at every crash point.
    var appendsDone = 0
    def appendState(df: DataFrame, path: String): Unit = {
      if (appendsDone >= crashAfterAppends)
        throw new RuntimeException(s"injected crash before state append #${appendsDone + 1}")
      appendsDone += 1
      appendParquet(df, path)
    }

    val extracted = Pipeline.extract(batch, cfg).localCheckpoint(false)
    val newContents = Pipeline.distinctContents(extracted)

    // ---- skip unchanged batches: a batch row matters only if it would
    // change its url's CURRENT binding (new url, changed content, or a
    // REVERT to previously-seen content — comparing against full member
    // history would wrongly swallow the revert case). No changed bindings
    // means no state row and no cluster assignment can change.
    //
    // Reduce to each url's LATEST observation WITHIN the batch first
    // (deterministic (warc_ts, node_id, n_bytes) struct max — the same
    // tiebreak shape the cross-batch winner resolution uses). The filter
    // below compares rows against the CURRENT binding, and an unreduced
    // row set would drop a same-batch row that MATCHES the binding while
    // keeping an OLDER same-batch row for the same url — wrongly rebinding
    // the url to stale content (the within-batch warc_ts tiebreak must run
    // before, not after, the skip filter).
    val memberRows = extracted
      .select("url", "node_id", "n_bytes", "warc_ts")
      .groupBy("url")
      .agg(max(struct(col("warc_ts"), col("node_id"), col("n_bytes"))).as("m"))
      .select(col("url"), col("m.node_id").as("node_id"),
        col("m.n_bytes").as("n_bytes"), col("m.warc_ts").as("warc_ts"))
      .withColumn("batch_id", lit(batchId))
    val prevC: DataFrame =
      if (exists(dirs.clusters)) spark.read.parquet(dirs.clusters).localCheckpoint(false)
      else null
    val currentBindings =
      if (prevC != null) prevC.select("url", "node_id")
      else readOrEmpty(spark, dirs.members, memberRows).select("url", "node_id").limit(0)
    val newMemberRows = memberRows
      .join(currentBindings, Seq("url", "node_id"), "left_anti")
      .localCheckpoint(false)
    if (newMemberRows.isEmpty) return

    // ---- new contents = not yet in the signature state
    val contents =
      if (!exists(dirs.signatures)) newContents.localCheckpoint(false)
      else newContents.join(
        spark.read.parquet(dirs.signatures).select("node_id"),
        Seq("node_id"), "left_anti").localCheckpoint(false)

    val sigs = Pipeline.signatures(contents, cfg)
      .localCheckpoint(false)

    // ---- candidates: new-vs-new within the batch bands, plus new-vs-stored
    // through the durable band index (salted hot-band treatment, see
    // crossBatchCandidates). bandKeys includes the SimHash chunk keys when
    // cfg.simhashTier is on, so the stored index probes every enabled tier.
    val newBands = Pipeline.bandKeys(sigs, cfg)
    val storedBands = readOrEmpty(spark, dirs.bandIndex, newBands)
    val crossPairs = crossBatchCandidates(newBands, storedBands, cfg)
      .distinct().localCheckpoint(false)
    val newPairs = Pipeline.candidatePairs(sigs, cfg).pairs.localCheckpoint(false)

    // ---- verify. Two tiers, matching what each side can know:
    //  - new-vs-new pairs have BOTH texts in this batch, so they get the
    //    full batch ST3 pass rule (exact shingle Jaccard, SimHash Hamming,
    //    suffix-automaton LCS) — identical semantics to Pipeline.run;
    //  - cross-batch pairs: any pair whose BOTH texts are on hand gets the
    //    same full ST3 pass rule — batch-parity semantics. "On hand" always
    //    includes this batch's own extracted contents (so a RE-PUBLISHED
    //    known content — the common re-crawl case — verifies exactly, never
    //    by estimate), and with cfg.incRetainTexts ON additionally the
    //    stored texts state. Pairs with a text not on hand (knob off and
    //    the stored endpoint absent from this batch; or state predating
    //    the toggle / GC'd content) fall back to the estimate tier:
    //    MinHash-estimated Jaccard over the 128-perm signatures OR SimHash
    //    Hamming. Threshold on the estimate is cfg.minJaccard minus 2
    //    sigma (sigma = sqrt(J(1-J)/numPerm)) so planted true pairs still
    //    pass. The estimate tier is strictly MORE permissive than batch
    //    ST3 (no exact-J, no LCS gate, OR of the gates); every edge it
    //    accepts is counted as est_only in the batch metrics row so the
    //    divergence is measurable, and IncrementalDedupSpec's parity tests
    //    gate cluster agreement with the batch pipeline on a planted
    //    corpus (exact agreement + zero est-only with the knob on).
    val newVerified = Pipeline.verifyPairs(newPairs, contents.select("node_id", "text"), cfg)
      .where(col("passed")).select("id_a", "id_b")
      .localCheckpoint(false)
    val retain = cfg.incRetainTexts
    // Texts ON HAND this batch: every distinct content the batch itself
    // extracted — INCLUDING re-published contents already in signature
    // state (a re-crawl puts a known text literally in hand, so a cross
    // pair touching it deserves the full exact verify, not the permissive
    // estimate; without this, an avoidable est-only edge diverges from
    // batch semantics even though both texts are in this very batch) —
    // plus, with incRetainTexts on, the stored texts table.
    // Scale contract: the stored texts table is the one state dir whose
    // BYTES grow with the live corpus, so it must never be scanned whole
    // per batch — prune it to this batch's cross-pair ENDPOINTS (a
    // node_id-column semi-join; parquet reads only matching text rows)
    // before any shuffle. Per-batch text I/O is O(batch + cross
    // candidates), not O(live corpus), preserving the
    // O(batch + affected dup-graph) bound.
    val textsOnHand =
      if (!retain) newContents.select("node_id", "text").localCheckpoint(false)
      else {
        val crossIds = crossPairs.select(col("id_a").as("node_id"))
          .union(crossPairs.select(col("id_b").as("node_id"))).distinct()
        readOrEmpty(spark, dirs.texts, newContents.select("node_id", "text"))
          .select("node_id", "text")
          .join(crossIds, Seq("node_id"), "left_semi")
          .unionByName(newContents.select("node_id", "text"))
          .dropDuplicates("node_id").localCheckpoint(false)
      }
    val exactCrossPairs = {
      val have = textsOnHand.select("node_id")
      crossPairs
        .join(have.withColumnRenamed("node_id", "id_a"), Seq("id_a"), "left_semi")
        .join(have.withColumnRenamed("node_id", "id_b"), Seq("id_b"), "left_semi")
        .localCheckpoint(false)
    }
    val estCrossPairs = crossPairs.join(exactCrossPairs, Seq("id_a", "id_b"), "left_anti")
      .localCheckpoint(false)
    val crossExactVerified = Pipeline.verifyPairs(exactCrossPairs, textsOnHand, cfg)
      .where(col("passed")).select("id_a", "id_b").localCheckpoint(false)
    // Scale contract (same as dirs.texts above): the stored signature table
    // grows with the live corpus (~1 KB of minhash per row), so prune it to
    // this batch's est-pair ENDPOINTS before the wide joins — per-batch
    // signature traffic is O(est candidates), not O(live corpus).
    val estIds = estCrossPairs.select(col("id_a").as("node_id"))
      .union(estCrossPairs.select(col("id_b").as("node_id"))).distinct()
    val allSigs = (if (exists(dirs.signatures))
      spark.read.parquet(dirs.signatures).unionByName(sigs) else sigs)
      .select("node_id", "minhash", "simhash")
      .join(estIds, Seq("node_id"), "left_semi")
    val estMin = cfg.minJaccard - 2.0 * math.sqrt(cfg.minJaccard * (1 - cfg.minJaccard) / cfg.numPerm)
    val maxHam = cfg.maxHamming
    import spark.implicits._
    val a = allSigs.select(col("node_id").as("id_a"),
      col("minhash").as("mh_a"), col("simhash").as("sh_a"))
    val b = allSigs.select(col("node_id").as("id_b"),
      col("minhash").as("mh_b"), col("simhash").as("sh_b"))
    val crossEstVerified = estCrossPairs.join(a, "id_a").join(b, "id_b")
      // each using-join moves its key column FIRST, so the column order here
      // is (id_b, id_a, ...) — select explicitly before the POSITIONAL tuple
      // decode or every cross-batch edge is stored orientation-reversed,
      // breaking the edges table's id_a < id_b invariant (regression-gated
      // by the parity test's orientation assertion)
      .select(col("id_a"), col("id_b"), col("mh_a"), col("sh_a"), col("mh_b"), col("sh_b"))
      .as[(Long, Long, Seq[Long], Long, Seq[Long], Long)]
      .flatMap { case (idA, idB, mhA, shA, mhB, shB) =>
        val est = graft.signatures.MinHasher.estimateJaccard(mhA.toArray, mhB.toArray)
        val ham = java.lang.Long.bitCount(shA ^ shB)
        if (est >= estMin || ham <= maxHam) Some((idA, idB)) else None
      }.toDF("id_a", "id_b")
      .localCheckpoint(false)
    val verified = newVerified.union(crossExactVerified).union(crossEstVerified)

    // ---- append state. ORDER IS THE REPLAY-RESUME CONTRACT: foreachBatch
    // is at-least-once, the appends are not atomic as a group, and replay
    // derives "contents still to process" from presence in the SIGNATURES
    // table alone — so signatures must land LAST. A crash anywhere earlier
    // leaves the content absent from signatures and the replay recomputes
    // everything (duplicate band/edge/text/member rows from the partial
    // attempt are harmless: every consumer dedups — CC ignores repeated
    // edges, the census distincts pairs, texts/members resolve per key —
    // and compaction merges them durably). Signatures-first would invert
    // that: a crash between it and the edges append would make the replay
    // see "already processed" and the batch's candidate edges would be
    // lost FOREVER (silent recall loss).
    appendState(newBands, dirs.bandIndex)
    appendState(verified, dirs.edges)
    if (retain) appendState(contents.select("node_id", "text"), dirs.texts)
    appendState(newMemberRows, dirs.members)
    appendState(sigs, dirs.signatures) // LAST: gates replay recompute
    // The per-batch metrics row (the durable counter that makes the
    // est-only divergence auditable over a stream's life) is computed here
    // but appended AFTER the clusters swap: appended earlier, a crash
    // before the swap would make the replayed batch append a SECOND row
    // for the same batch_id. After the swap, the replay exits at the
    // unchanged-bindings check — at most one row per batch (a crash in the
    // one instant between swap and append loses the audit row for that
    // batch; an at-most-once audit beats contradictory duplicates).
    val metricsRow =
      Seq((batchId, newPairs.count(), crossPairs.count(),
        newVerified.count() + crossExactVerified.count(), crossEstVerified.count(),
        System.currentTimeMillis()))
        .toDF("batch_id", "candidates_new", "candidates_cross",
          "edges_exact_verified", "edges_est_only", "committed_ms")

    // ---- recluster, bounded to AFFECTED components.
    // Closure argument: an old component's labels can change only through
    // (a) a new edge — whose endpoints are batch-touched nodes — or (b) a
    // node death — which only happens when one of its urls re-binds, so the
    // node is batch-touched too. Components not intersecting the touched
    // set A0 are therefore carried forward verbatim; per-batch CC work is
    // O(affected dup-graph), not O(all accumulated edges).
    if (prevC == null) {
      rebuildClusters(spark, cfg, dirs) // first batch ever / state recovery
      appendParquet(metricsRow, dirs.metrics) // after the swap, see above
      compactStateIfNeeded(spark, cfg, dirs)
      return
    }
    val batchUrls = newMemberRows.select("url").distinct()

    // winner binding per batch url: its previous binding vs the batch rows,
    // deterministic (batch_id, warc_ts, node_id) struct max
    val prevOfBatch = prevC.join(batchUrls, Seq("url"), "left_semi")
      .select("url", "node_id", "n_bytes", "warc_ts", "batch_id")
      .localCheckpoint(false)
    val winners = newMemberRows.select("url", "node_id", "n_bytes", "warc_ts", "batch_id")
      .unionByName(prevOfBatch)
      .groupBy("url")
      .agg(max(struct(col("batch_id"), col("warc_ts"), col("node_id"), col("n_bytes"))).as("m"))
      .select(col("url"), col("m.node_id").as("node_id"), col("m.n_bytes").as("n_bytes"),
        col("m.warc_ts").as("warc_ts"), col("m.batch_id").as("batch_id"))
      .localCheckpoint(false)

    // Resurrected nodes — live now but not live before (a url reverting to
    // earlier content) — carry PRE-EXISTING edges into components the batch
    // never touched directly; their edge-state neighbors must join the
    // affected set or a revert would miss its re-merge. (Brand-new content
    // has only this batch's edges, which are covered by E_new below.)
    // No distinct: that was a full shuffle of the accumulated edge HISTORY
    // every batch (O(state), violating the per-batch bound). Every consumer
    // is duplicate-insensitive — the semi-joins below, and CC (union-find
    // ignores repeats; the distributed loop distincts its symmetrized set)
    // — and compaction dedups the table durably.
    val edgesState = spark.read.parquet(dirs.edges).localCheckpoint(false)
    val newlyLive = winners.select("node_id")
      .join(prevC.select("node_id"), Seq("node_id"), "left_anti")
    val resurrectNeighbors = edgesState
      .join(newlyLive.withColumnRenamed("node_id", "id_a"), Seq("id_a"), "left_semi")
      .select(col("id_b").as("node_id"))
      .union(edgesState
        .join(newlyLive.withColumnRenamed("node_id", "id_b"), Seq("id_b"), "left_semi")
        .select(col("id_a").as("node_id")))

    // A0 = batch-touched nodes: new winners, superseded old bindings,
    // endpoints of this batch's new edges, and resurrection neighbors
    val a0 = winners.select("node_id")
      .union(prevOfBatch.select("node_id"))
      .union(verified.select(col("id_a").as("node_id")))
      .union(verified.select(col("id_b").as("node_id")))
      .union(resurrectNeighbors)
      .distinct()
      .localCheckpoint(false)

    val affClusters = prevC.join(a0, Seq("node_id"), "left_semi")
      .select("cluster_id").distinct().localCheckpoint(false)

    // resolved members of the affected region: carried bindings of affected
    // clusters (non-batch urls, unchanged) + the batch winners
    val carriedAff = prevC.join(affClusters, Seq("cluster_id"), "left_semi")
      .join(batchUrls, Seq("url"), "left_anti")
      .select("url", "node_id", "n_bytes", "warc_ts", "batch_id")
    val affResolved = carriedAff.unionByName(winners).localCheckpoint(false)

    // edges among LIVE affected nodes (dead-node edges retired here — the
    // reference's changed-file invalidation at cluster time)
    val liveAffA = affResolved.select(col("node_id").as("id_a")).distinct()
    val affEdges = edgesState
      .join(liveAffA, Seq("id_a"), "left_semi")
      .join(liveAffA.select(col("id_a").as("id_b")), Seq("id_b"), "left_semi")

    val cc = graft.cluster.ConnectedComponents.run(spark, affEdges, cfg.maxCcIterations,
      localThreshold = cfg.ccLocalThreshold)
    val newAff = affResolved
      .join(cc, affResolved("node_id") === cc("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("node_id")))
      .select("url", "node_id", "cluster_id", "n_bytes", "warc_ts", "batch_id")

    val untouched = prevC.join(affClusters, Seq("cluster_id"), "left_anti")
      .select("url", "node_id", "cluster_id", "n_bytes", "warc_ts", "batch_id")
    writeClustersAtomic(untouched.unionByName(newAff), dirs)
    appendParquet(metricsRow, dirs.metrics) // after the swap, see above
    compactStateIfNeeded(spark, cfg, dirs)
  }

  /** Cross-batch candidate pairs: each NEW band row probes the stored band
    * index on its key. COMBINED census first: per band key, stored members
    * (restricted by a semi-join to the batch's keys — the stored index can
    * hold billions of keys, the batch thousands) PLUS the batch's own
    * contribution. Counting both sides matters: a stored group just under
    * `maxBandGroup` would otherwise pair cold against an arbitrarily large
    * batch contribution on the same key, exceeding the intended per-cell
    * bound — the combined count keeps every join cell at ~maxBandGroup
    * regardless of which side the mass sits on, exactly matching the batch
    * path (where one table holds all members). Groups over the threshold
    * are SALTED into ceil(count/maxBandGroup) cells with the same
    * xxh64(node_id, band_key) bucketing the batch path uses, and each new
    * member probes exactly ONE cell — per-new-member work stays
    * O(maxBandGroup) instead of growing with accumulated boilerplate-band
    * size, at the cost of partial in-band recall (a true pair still
    * surfaces through its other bands). Only groups beyond
    * hardMaxBandGroup are dropped, mirroring Pipeline.candidatePairs. Both
    * census tables are bounded by the batch's distinct band keys, so the
    * hot side is broadcast explicitly. The stored view excludes this
    * batch's own nodes and the census counts distinct members — replay
    * duplicates (see the append-order contract) must not shift a band
    * across the salt/drop thresholds. */
  private[graft] def crossBatchCandidates(newBands: DataFrame, storedBands: DataFrame,
      cfg: GraftConfig): DataFrame = {
    val hotCap = if (cfg.saltHotBands) cfg.hardMaxBandGroup.toLong else cfg.maxBandGroup.toLong
    val maxGroup = cfg.maxBandGroup.toLong
    // Replay hygiene: foreachBatch is at-least-once and band rows land
    // BEFORE the signature gate, so a crashed prior attempt of THIS batch
    // may have already appended this batch's own band rows — probing them
    // would pair nodes against themselves (the batch path's job) and
    // double-count the census. Drop the batch's own nodes from the stored
    // view (broadcast anti-join: a map-side filter, the stored scan never
    // shuffles). Earlier crashed batches can likewise leave historical
    // duplicate rows in the index until compaction dedups it, so the
    // census counts DISTINCT stored members — a raw row count would
    // inflate a band across maxBandGroup (spurious salting, partial
    // recall) or hardMaxBandGroup (the band silently dropped, and its
    // cross pairs are never re-probed once both sides hold signatures).
    val stored = storedBands
      .join(broadcast(newBands.select("node_id").distinct()), Seq("node_id"), "left_anti")
    // inner join: a cross pair needs >=1 member on EACH side of the key
    val storedCounts = stored
      .join(broadcast(newBands.select("band_key").distinct()), Seq("band_key"), "left_semi")
      .groupBy("band_key").agg(countDistinct(col("node_id")).as("stored_n"))
    val batchCounts = newBands.groupBy("band_key").agg(count(lit(1)).as("batch_n"))
    val hot = storedCounts.join(batchCounts, Seq("band_key"))
      .select(col("band_key"), (col("stored_n") + col("batch_n")).as("count"))
      .where(col("count") > cfg.maxBandGroup)
    def crossJoinPairs(n: DataFrame, s: DataFrame, keys: Seq[String]): DataFrame =
      n.as("n").join(s.as("s"), keys)
        .select(
          least(col("n.node_id"), col("s.node_id")).as("id_a"),
          greatest(col("n.node_id"), col("s.node_id")).as("id_b"))
        .where(col("id_a") =!= col("id_b"))
    val coldCross = crossJoinPairs(
      newBands,
      stored.join(broadcast(hot.select("band_key")), Seq("band_key"), "left_anti"),
      Seq("band_key"))
    val saltExpr = pmod(xxhash64(col("node_id"), col("band_key")),
      floor((col("count") + lit(maxGroup - 1)) / lit(maxGroup)).cast("long"))
    val survivingHot = hot.where(col("count") <= hotCap)
    val hotCross = crossJoinPairs(
      newBands.join(broadcast(survivingHot), Seq("band_key")).withColumn("salt", saltExpr),
      stored.join(broadcast(survivingHot), Seq("band_key")).withColumn("salt", saltExpr),
      Seq("band_key", "salt"))
    coldCross.union(hotCross)
  }

  /** Full recluster from ground-truth state (members + edges): latest
    * binding per url, live-edge CC, every url labeled. Used for the first
    * batch, v<3 migration, and cluster-state recovery; per-batch processing
    * uses the bounded affected-component path instead. */
  private[streaming] def rebuildClusters(spark: SparkSession, cfg: GraftConfig, dirs: StateDirs): Unit = {
    if (!exists(dirs.members)) return
    val resolved = spark.read.parquet(dirs.members)
      .groupBy("url")
      .agg(max(struct(col("batch_id"), col("warc_ts"), col("node_id"), col("n_bytes"))).as("m"))
      .select(col("url"), col("m.node_id").as("node_id"), col("m.n_bytes").as("n_bytes"),
        col("m.warc_ts").as("warc_ts"), col("m.batch_id").as("batch_id"))
      .localCheckpoint(false)
    val liveA = resolved.select(col("node_id").as("id_a")).distinct()
    val liveEdges =
      (if (exists(dirs.edges)) spark.read.parquet(dirs.edges).distinct()
       else spark.emptyDataFrame.select(lit(0L).as("id_a"), lit(0L).as("id_b")).limit(0))
        .join(liveA, Seq("id_a"), "left_semi")
        .join(liveA.select(col("id_a").as("id_b")), Seq("id_b"), "left_semi")
    val cc = graft.cluster.ConnectedComponents.run(spark, liveEdges, cfg.maxCcIterations,
      localThreshold = cfg.ccLocalThreshold)
    val clusters = resolved
      .join(cc, resolved("node_id") === cc("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("node_id")))
      .select("url", "node_id", "cluster_id", "n_bytes", "warc_ts", "batch_id")
    writeClustersAtomic(clusters, dirs)
  }

  /** Identity-key remap of stored state — the graft analog of the
    * reference's device-number remap maintenance op
    * (/root/reference/src/file_db.rs:656-794): when the node-id derivation
    * changes (e.g. a hash-config migration), stored state is RE-KEYED under
    * an (old_id, new_id) mapping instead of recomputed — signatures, band
    * index, member bindings, edges, and cluster labels all carry over.
    * The mapping's provenance is the caller's (e.g. joining old and new
    * ST0 outputs on url or exact_hash); ids absent from the mapping pass
    * through unchanged.
    *
    * Refusals mirror the reference's consistency gate: a mapping that is
    * not 1-to-1, or whose new ids collide with unmapped stored ids, would
    * silently merge or split content identities and is rejected before any
    * write. Each table rewrite is crash-safe (temp dir + rename-aside
    * swap, healed by `recoverSwap` on the next batch).
    *
    * Cluster labels are component-min node ids, so they are recomputed per
    * (unchanged) membership group after the remap — a pure groupBy-min,
    * no connected-components rerun. */
  def remapNodeIds(spark: SparkSession, dirs: StateDirs, mapping: DataFrame,
      crashAfterTables: Int = Int.MaxValue): Unit = {
    Seq(dirs.clusters, dirs.members, dirs.signatures, dirs.bandIndex, dirs.edges,
      dirs.texts)
      .foreach(recoverSwap)
    // Version gate BEFORE any journal write: the clusters rewrite below
    // selects v3 columns (warc_ts, batch_id), so a remap over pre-v3 state
    // would fail AFTER journaling and rewriting five tables — and the
    // leftover journal blocks ensureStateVersion (hence the migration that
    // would fix it) from ever running: a wedged state. Refuse up front.
    val stateExists = Seq(dirs.clusters, dirs.members, dirs.signatures,
      dirs.bandIndex, dirs.edges, dirs.texts).exists(exists)
    if (stateExists) {
      val v = readVersion(dirs)
      require(v.contains(StateVersion),
        s"incremental state at ${dirs.root} is schema v${v.getOrElse(1)}, not v$StateVersion " +
          "- run any processBatch (ensureStateVersion) to migrate BEFORE remapping node ids")
    }
    val m = mapping.select(col("old_id").cast("long").as("old_id"),
      col("new_id").cast("long").as("new_id")).distinct().localCheckpoint(true)
    val dupOld = m.groupBy("old_id").count().where(col("count") > 1).count()
    val dupNew = m.groupBy("new_id").count().where(col("count") > 1).count()
    require(dupOld == 0 && dupNew == 0,
      s"remap mapping is not 1-to-1 ($dupOld duplicated old ids, $dupNew duplicated new ids) " +
        "- refusing: applying it would merge or split content identities")

    // Multi-table journal: the remap rewrites six tables and a crash in
    // between leaves them keyed inconsistently. The journal (mapping hash +
    // completed-table list, atomically renamed after each table) makes the
    // op RESUMABLE: re-running the same mapping skips completed tables and
    // validates only the rest. A journal from a DIFFERENT mapping means an
    // earlier remap died midway — that one must be re-run to completion
    // first, so it is refused, never silently mixed.
    val mapHashRow = m.agg(bit_xor(xxhash64(col("old_id"), col("new_id"))), count(lit(1))).head()
    val mapHash = f"${mapHashRow.getLong(0)}%016x-${mapHashRow.getLong(1)}"
    val journalPath = Paths.get(dirs.root, "_remap_journal.json")
    val JField = """"(\w+)"\s*:\s*"([^"]*)"""".r
    val done: Set[String] =
      if (!Files.exists(journalPath)) Set.empty
      else {
        val kv = JField.findAllMatchIn(new String(Files.readAllBytes(journalPath),
          java.nio.charset.StandardCharsets.UTF_8)).map(x => x.group(1) -> x.group(2)).toMap
        require(kv.get("mapping_hash").contains(mapHash),
          s"an interrupted remap under a different mapping (${kv.getOrElse("mapping_hash", "?")}) " +
            "left partial state - re-run THAT remap to completion before starting a new one")
        kv.get("done").map(_.split(",").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
      }
    def writeJournal(doneNow: Set[String]): Unit = {
      val tmp = Paths.get(dirs.root, s".remap-tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, s"""{"mapping_hash": "$mapHash", "done": "${doneNow.mkString(",")}"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, journalPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    // a new id colliding with a stored id the mapping does NOT touch would
    // merge two distinct contents under one key (checked over the tables
    // not yet rewritten — completed ones legitimately hold the new ids).
    // edges/band_index ids are normally subsets of the node-id tables, but
    // the scan includes them anyway: if that invariant is ever broken (e.g.
    // partial manual state surgery), a collision there must refuse too,
    // not silently merge — the extra scan is cheap next to the rewrite.
    val nodeIdTables =
      Seq("signatures" -> dirs.signatures, "members" -> dirs.members, "clusters" -> dirs.clusters,
        "band_index" -> dirs.bandIndex, "texts" -> dirs.texts)
        .filter { case (name, p) => !done.contains(name) && exists(p) }
        .map { case (_, p) => spark.read.parquet(p).select(col("node_id").as("id")) }
    val edgeIdTables =
      if (done.contains("edges") || !exists(dirs.edges)) Nil
      else {
        val e = spark.read.parquet(dirs.edges)
        Seq(e.select(col("id_a").as("id")), e.select(col("id_b").as("id")))
      }
    val storedIds = (nodeIdTables ++ edgeIdTables)
      .reduceOption(_ union _)
      .map(_.distinct())
    storedIds.foreach { ids =>
      // mapping rows whose new_id equals a stored id, where that stored id
      // is NOT itself remapped away by the same mapping
      val collisions = m.join(ids, m("new_id") === ids("id"), "left_semi")
        .join(m.select(col("old_id").as("probe")), col("new_id") === col("probe"), "left_anti")
        .count()
      require(collisions == 0,
        s"remap collides $collisions new ids with unmapped stored ids - refusing")
    }
    writeJournal(done) // validation passed: the remap is now in progress

    def remapCol(df: DataFrame, c: String): DataFrame =
      df.join(m.withColumnRenamed("old_id", c), Seq(c), "left")
        .withColumn(c, coalesce(col("new_id"), col(c))).drop("new_id")
    var doneNow = done
    var rewrites = 0
    def rewrite(name: String, path: String)(f: DataFrame => DataFrame): Unit = {
      if (!doneNow.contains(name)) {
        if (rewrites >= crashAfterTables) // test hook: simulate dying midway
          throw new RuntimeException(s"injected crash before rewriting $name")
        rewrites += 1
        if (exists(path)) {
          val tmp = s"$path.tmp-${java.util.UUID.randomUUID()}"
          f(spark.read.parquet(path)).write.parquet(tmp)
          swapDir(tmp, path)
        }
        doneNow += name
        writeJournal(doneNow)
      }
    }
    rewrite("signatures", dirs.signatures)(remapCol(_, "node_id"))
    rewrite("texts", dirs.texts)(remapCol(_, "node_id"))
    rewrite("band_index", dirs.bandIndex)(remapCol(_, "node_id"))
    rewrite("members", dirs.members)(remapCol(_, "node_id"))
    rewrite("edges", dirs.edges) { e =>
      val r = remapCol(remapCol(e.withColumnRenamed("id_a", "a").withColumnRenamed("id_b", "b"),
        "a"), "b")
      r.select(least(col("a"), col("b")).as("id_a"), greatest(col("a"), col("b")).as("id_b"))
        .where(col("id_a") =!= col("id_b")) // id_a < id_b invariant survives the remap
    }
    rewrite("clusters", dirs.clusters) { c0 =>
      val r = remapCol(c0, "node_id")
      val relabel = r.groupBy("cluster_id").agg(min(col("node_id")).as("new_label"))
      r.join(relabel, "cluster_id")
        .select(col("url"), col("node_id"), col("new_label").as("cluster_id"),
          col("n_bytes"), col("warc_ts"), col("batch_id"))
    }
    Files.deleteIfExists(journalPath) // all tables consistent again
  }

  /** Rewrite accumulated state compacted when any dir's file count exceeds
    * cfg.incCompactFileThreshold. Without this, `appendParquet` adds files
    * per batch forever and the per-batch `edges.distinct()` scan creeps
    * with total history. Compaction:
    *  - members -> latest binding per url (exactly the reduction every
    *    resolution path computes; superseded history carries no signal);
    *  - edges -> distinct, endpoints restricted to LIVE nodes (an edge on a
    *    node no url binds cannot affect clustering; cluster time retires
    *    them anyway — compaction just stops paying to rescan them);
    *  - band_index / signatures -> live nodes only. This trades the
    *    "resurrected content needs no recompute" property for bounded
    *    state: a url reverting to GC'd content re-enters as new content
    *    (the batch carries its text, so the signature is recomputed and
    *    re-indexed — same clusters, one extra signature's compute).
    * Returns true when a compaction ran (test hook). */
  private[streaming] def compactStateIfNeeded(spark: SparkSession, cfg: GraftConfig,
      dirs: StateDirs): Boolean = {
    val threshold = cfg.incCompactFileThreshold
    if (threshold <= 0 || !exists(dirs.clusters)) return false
    def fileCount(p: String): Int =
      if (!exists(p)) 0
      else {
        import scala.jdk.CollectionConverters._
        val s = Files.list(Paths.get(p))
        try s.iterator().asScala.count(Files.isRegularFile(_))
        finally s.close()
      }
    val dirsToWatch = Seq(dirs.members, dirs.edges, dirs.bandIndex, dirs.signatures,
      dirs.metrics, dirs.texts)
    if (!dirsToWatch.exists(fileCount(_) > threshold)) return false

    val live = spark.read.parquet(dirs.clusters)
      .select("node_id").distinct().localCheckpoint(true)
    def rewrite(path: String)(f: DataFrame => DataFrame): Unit = if (exists(path)) {
      val tmp = s"$path.tmp-${java.util.UUID.randomUUID()}"
      f(spark.read.parquet(path)).write.parquet(tmp) // reads source, writes tmp
      swapDir(tmp, path) // crash-safe: old-or-new present at every instant
    }
    rewrite(dirs.members) { m =>
      m.groupBy("url")
        .agg(max(struct(col("batch_id"), col("warc_ts"), col("node_id"), col("n_bytes"))).as("m"))
        .select(col("url"), col("m.node_id").as("node_id"), col("m.n_bytes").as("n_bytes"),
          col("m.warc_ts").as("warc_ts"), col("m.batch_id").as("batch_id"))
    }
    rewrite(dirs.signatures)(_.join(live, Seq("node_id"), "left_semi"))
    // retained texts (incRetainTexts): live nodes only, one row per node —
    // same GC-then-resurrect trade as signatures (the batch re-carries the
    // text, so a resurrected content is re-retained on re-entry)
    rewrite(dirs.texts)(_.dropDuplicates("node_id").join(live, Seq("node_id"), "left_semi"))
    rewrite(dirs.bandIndex)(_.distinct().join(live, Seq("node_id"), "left_semi"))
    rewrite(dirs.edges) { e =>
      e.distinct()
        .join(live.withColumnRenamed("node_id", "id_a"), Seq("id_a"), "left_semi")
        .join(live.withColumnRenamed("node_id", "id_b"), Seq("id_b"), "left_semi")
    }
    // the per-batch metrics log keeps every row (it is the audit trail) but
    // one tiny file is appended per batch — coalesce so a years-long stream
    // does not accumulate unbounded file counts in the one dir the other
    // rewrites don't touch
    rewrite(dirs.metrics)(_.coalesce(1))
    true
  }

  /** The clusters output derives from (and replaces) the previous clusters
    * table, so the write goes to a fresh temp dir and swaps in after it
    * completes — never an in-place overwrite of its own input. (Iceberg
    * snapshot commit is the real-cluster equivalent.) */
  private def writeClustersAtomic(df: DataFrame, dirs: StateDirs): Unit = {
    val tmp = s"${dirs.clusters}.tmp-${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(tmp)
    swapDir(tmp, dirs.clusters)
  }

  // NIO streams are CLOSED (try/finally) everywhere below: these helpers
  // run many times per micro-batch on a driver that lives for the stream's
  // lifetime, and an unclosed DirectoryStream holds a file descriptor until
  // GC — a mostly-idle stream (low GC pressure) would creep toward the fd
  // ulimit. (sorted() drains walk() before iteration, so deleting entries
  // during the loop is safe — the traversal is already buffered.)
  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally s.close()
    }

  /** Crash-safe directory replacement: the current table is renamed ASIDE
    * (one rename), the new one moved in (one rename), and only then is the
    * aside copy deleted — at every instant either the old or the new table
    * is recoverable, unlike delete-tree-then-move which leaves a window
    * with no table at all. `recoverSwap` heals the one bad window (crash
    * between the two renames) by restoring the aside copy. */
  private[streaming] def swapDir(tmp: String, target: String): Unit = {
    val t = Paths.get(target)
    val aside = Paths.get(target + ".old")
    deleteTree(aside) // stale aside from a crash after a completed swap
    if (Files.exists(t)) Files.move(t, aside)
    try Files.move(Paths.get(tmp), t)
    catch { case e: Throwable => // restore the old table before propagating
      if (!Files.exists(t) && Files.exists(aside)) Files.move(aside, t)
      throw e
    }
    deleteTree(aside)
  }

  /** Heal an interrupted `swapDir`: if the target vanished mid-swap the
    * aside copy is moved back; a surviving aside next to an intact target
    * (crash after the second rename) is dropped. Also clears abandoned
    * `.tmp-*` write dirs so crashes don't leak space. Run once per batch. */
  private[streaming] def recoverSwap(target: String): Unit = {
    val t = Paths.get(target)
    val aside = Paths.get(target + ".old")
    if (!Files.exists(t) && Files.exists(aside)) Files.move(aside, t)
    else if (Files.exists(aside)) deleteTree(aside)
    val parent = t.getParent
    if (parent != null && Files.exists(parent)) {
      import scala.jdk.CollectionConverters._
      val s = Files.list(parent)
      val stale =
        try s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(s"${t.getFileName}.tmp-"))
          .toList
        finally s.close()
      stale.foreach(deleteTree)
    }
  }

  private def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Start the incremental query on a streaming pages DataFrame. */
  def start(pagesStream: DataFrame, cfg: GraftConfig, stateRoot: String): StreamingQuery = {
    val dirs = StateDirs(stateRoot)
    pagesStream.writeStream
      .outputMode("update")
      .option("checkpointLocation", dirs.checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => processBatch(batch, cfg, dirs, id) }
      .start()
  }
}
