package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity / dedup primitives: shingling, MinHash, banded LSH, SimHash,
  * vector math, random-hyperplane LSH (north-star tier B15/B16).
  *
  * Everything is expressed through codegen'd higher-order array functions —
  * the signatures/buckets are ordinary columns, so the candidate-pair joins
  * are plain equi-joins that shuffle only (band, key) pairs. That is the
  * scale story: no O(n²) stage anywhere; all-pairs work happens only within
  * an LSH bucket.
  *
  * Determinism: every hash is xxhash64 (fixed seed 42 inside Spark) or a
  * fixed odd-multiplier remix of it; the hyperplane projections come from a
  * fixed-seed RNG materialized as literals. Repeated runs — and runs on
  * different partitionings — produce identical results (SURVEY.md §7 "LSH
  * determinism").
  */
object Similarity {

  /** k-word shingles of a token array; a document shorter than k tokens
    * contributes its whole text as one shingle.
    */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** Distinct k-shingle set of a text column. */
  def shingleSet(text: Column, k: Int): Column =
    array_distinct(wordShingles(TextFunctions.tokens(text), k))

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b))

  /** Base hashes of the shingle set, reduced into [0, 2^31-1) so the
    * universal-hash remixes below stay overflow-free under ANSI mode
    * (a·h < 2^62 for a, h < 2^31).
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, sh => pmod(xxhash64(sh), lit(2147483647L)))

  private val MersenneP = 2147483647L // 2^31 - 1

  /** md5-derived base hashes in [0, 2^31-1) — the PORTABLE twin of
    * [[shingleHashes]] for operators whose DuckDB oracle must replay
    * candidate generation itself (q210 LSH audit, q211 streaming screen):
    * md5 is bit-identical in both engines where xxhash64 is Spark-only.
    * One definition backs every consumer (the BpeSegment lesson — shared
    * helpers, not parallel copies).
    */
  def md5ShingleHashes(shingles: Column): Column =
    transform(shingles, s => pmod(md5Hash64(s), lit(MersenneP)))

  /** MinHash signature of length `numHashes` via Carter-Wegman remixes
    * h_s(x) = (a_s·h(x) + b_s) mod (2^31-1), with a_s, b_s derived from the
    * slot index. One xxhash64 per shingle, then cheap bounded multiply-adds
    * per slot: O(|shingles|·numHashes) integer ops, no string re-hashing,
    * no overflow.
    */
  def minhashSignature(baseHashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), s => {
      val a = pmod(s.cast(LongType) * 2654435761L + 1L, lit(MersenneP))
      val b = pmod(s.cast(LongType) * 40503L + 7L, lit(MersenneP))
      array_min(transform(baseHashes, h => pmod(a * h + b, lit(MersenneP))))
    })

  /** Banded LSH keys: one (band, hash-of-rows) struct per band (band count
    * is a plan-time constant, so the bands unroll into a literal array).
    * Two docs collide on a band iff their signature rows in that band are
    * identical.
    */
  def minhashBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        hash(slice(sig, b * rowsPerBand + 1, rowsPerBand), lit(b)).as("bkey"))
    }: _*)

  /** 64-bit SimHash over (multiset) token hashes: bit i of the fingerprint
    * is the majority vote of bit i across token hashes. Bits 62..0 pack
    * MSB-first as acc*2+bit (max 2^63-1, no overflow); the sign bit is
    * folded in as +Long.MinValue, which is exact for acc ≥ 0 — keeps the
    * whole fold ANSI-safe.
    */
  def simhash(tokenHashes: Column): Column = {
    def bit(i: Column): Column = when(
      size(filter(tokenHashes, h => getbit(h, i) === 1)) * 2 > size(tokenHashes),
      lit(1L)).otherwise(lit(0L))
    val low63 = aggregate(sequence(lit(62), lit(0), lit(-1)), lit(0L),
      (acc, i) => acc * 2L + bit(i))
    low63 + when(bit(lit(63)) === 1L, lit(Long.MinValue)).otherwise(lit(0L))
  }

  /** SimHash band keys: `bands` spans of `bitsPerBand` bits each. */
  def simhashBandKeys(sh: Column, bands: Int, bitsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        shiftrightunsigned(sh, b * bitsPerBand)
          .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("bkey"))
    }: _*)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Portable 64-bit string hash from the first 8 md5 bytes: md5 is
    * bit-identical in Spark and DuckDB (the q61/q63/q79 recipe), so a
    * pipeline built on THIS hash — unlike Spark's seed-42 `xxhash64` —
    * can be replayed exactly by a SQL oracle. Two 32-bit hex halves are
    * parsed separately and recombined ((hi << 32) | lo; Spark's shiftleft
    * wraps into the sign bit exactly like the oracle's explicit mod-2^64
    * arithmetic), because a single 16-hex-digit parse would overflow
    * BIGINT in the oracle engine.
    */
  def md5Hash64(s: Column): Column = {
    val h = md5(s)
    shiftleft(conv(substring(h, 1, 8), 16, 10).cast(LongType), 32)
      .bitwiseOR(conv(substring(h, 9, 8), 16, 10).cast(LongType))
  }

  // ---- vector math (Array[Float] embeddings) ----

  /** Cast a float vector to double for drift-free arithmetic. */
  def toDouble(vec: Column): Column = transform(vec, x => x.cast(DoubleType))

  /** Sequential-fold dot product — same order as DuckDB's
    * list_cosine_similarity internals, verified bit-identical.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity = dot/(√na·√nb) — the exact operation order DuckDB
    * uses (900/900 bit-equal on testdata pairs). Dispatches to the native
    * codegen'd [[graft.expressions.VecCosine]] (same additions, same
    * order, ~100× cheaper than the interpreted folds).
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.vecCosine(a, b)

  /** The declarative fold formulation — kept as the reference semantics the
    * native expression is tested against.
    */
  def cosineDeclarative(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic Gaussian hyperplanes for sign-LSH. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH signature: bit b = [v · r_b > 0], packed into an int. Two
    * vectors with small angle share most bits (SRP-LSH). Native codegen'd
    * expression; [[lshSignatureDeclarative]] is the tested-equal reference.
    */
  def lshSignature(vec: Column, proj: Array[Array[Double]]): Column =
    graft.expressions.VectorExpressions.signLshSignature(vec, proj)

  def lshSignatureDeclarative(vec: Column, proj: Array[Array[Double]]): Column =
    proj.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p.toSeq)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Band keys over an LSH signature (bands × bitsPerBand = total bits). */
  def lshBandKeys(sig: Column, bands: Int, bitsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        shiftrightunsigned(sig.cast(LongType), b * bitsPerBand)
          .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("bkey"))
    }: _*)

  /** Squared L2 distance (for IVF centroid assignment). */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Lloyd's k-means over an embedding column — the real IVF training path.
    * Per iteration: the current centroids (k·dim doubles — tiny at any
    * corpus size) are collected and baked into a codegen'd projection
    * ([[graft.expressions.NearestCentroids]]), so assignment is ONE
    * shuffle-free pass over the corpus; the mean update is a single
    * per-cid hash aggregate with the whole-vector [[Aggregators.VecAvg]]
    * (partial/merge/final, map-side combined) — no posexplode, no dim×
    * row amplification. The corpus never shuffles by itself and each round
    * is linear. Deterministic under a fixed input partitioning: first-k
    * init by id, ties to the lower cid, empty clusters keep their previous
    * centroid.
    *
    * With `gridRound` the updated means are snapped back to the integer
    * grid (⌊m + 0.5⌋) each round — INTEGER-GRID k-means: over integer-
    * valued inputs every distance and sum is then exact in double
    * arithmetic (order-independent, tie-exact), which is what makes the
    * trained index SQL-replayable (q85) — and it is the arithmetic an int8
    * IVF index does anyway (q82's quantization story, applied to the
    * centroids).
    *
    * @param vecs (vec_id, v: array&lt;double&gt;)
    * @return (cid: int, cv: array&lt;double&gt;)
    */
  def kmeansCentroids(
      vecs: org.apache.spark.sql.DataFrame,
      k: Int,
      iters: Int,
      gridRound: Boolean = false): org.apache.spark.sql.DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val vecAvg = udaf(Aggregators.VecAvg)
    // centroid STATE is k·dim doubles — it lives on the driver, so each
    // Lloyd's round is exactly ONE distributed job (assignment projection +
    // per-cid VecAvg hash aggregate, map-side combined) and the k-row merge
    // is plain driver arithmetic: no per-round join, no lineage growth, no
    // checkpoint. (connectedComponents below keeps DISTRIBUTED state and
    // therefore does need the checkpoint treatment — the contrast is the
    // point: state size dictates the home.)
    var cents: Array[(Int, Array[Double])] =
      vecs.orderBy(col("vec_id")).limit(k) // TakeOrdered: no full sort
        .select(col("v")).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toArray) }
    var i = 0
    while (i < iters) {
      val means = vecs
        .withColumn("cid", element_at(
          graft.expressions.VectorExpressions.nearestCentroids(col("v"), cents, 1), 1))
        // a null/dimension-mismatched vector gets a null cid from
        // NearestCentroids (by design) — excluded from training rather
        // than crashing the driver-side merge or polluting a centroid
        .filter(col("cid").isNotNull)
        .groupBy(col("cid")).agg(vecAvg(col("v")).as("cv"))
        .collect()
        .map(r => r.getInt(0) -> {
          val m = r.getSeq[Double](1).toArray
          if (gridRound) m.map(x => math.floor(x + 0.5)) else m
        }).toMap
      // empty clusters keep their previous centroid
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      i += 1
    }
    cents.toSeq.map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cid", "cv")
  }

  /** Materialize a pair frame that the component iterations consume more
    * than once (both CC variants reference their input from at least two
    * subtrees — the doubled edge list, and the star variant's self-node
    * pass). When the input is already a cheap re-read — a checkpointed RDD
    * or a (projected/filtered) file scan — it passes through untouched, so
    * a staged-parquet composed run keeps its pinned scan in the final plan
    * and an already-shared frame is not checkpointed twice. Anything else
    * (the MinHash confirm cascade, filtered splits of a derived frame
    * whose parent was not shared) is localCheckpoint'd ONCE so the
    * derivation never replays per consumer (round-15 optimization; at
    * cluster scale this is the persisted fingerprint/pair table posture).
    */
  private def materializedPairs(
      pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def cheap(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project => cheap(pr.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => cheap(f.child)
      case _ => false
    }
    if (cheap(pairs.queryExecution.logical)) pairs
    else pairs.localCheckpoint(true)
  }

  /** Connected components over an undirected pair list (id_a, id_b) by
    * min-label propagation: every node's label converges to the smallest id
    * in its component. Iterations bound the component DIAMETER —
    * near-duplicate clusters are dense and shallow, so a handful of rounds
    * suffices; each round is two shuffles (join + min-aggregate), all
    * DataFrame-native (the classic large-graph CC-over-joins shape).
    */
  def connectedComponents(
      pairs0: org.apache.spark.sql.DataFrame,
      maxIter: Int = 6): org.apache.spark.sql.DataFrame = {
    val pairs = materializedPairs(pairs0)
    // Iterative loops MUST truncate lineage each round. persist() alone is
    // not enough: the logical plan still nests every prior round (plus the
    // full upstream pipeline) inside each InMemoryRelation, so PLANNING
    // cost grows round over round — measured 14s/round on a 2k-node graph.
    // localCheckpoint(eager) replaces the plan with the materialized RDD
    // (at cluster scale: reliable checkpoint to durable storage instead).
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"))
      // carry the previous label THROUGH the min-aggregate (each id has
      // exactly one prev row, so min(when(is_prev)) recovers it): the
      // convergence probe then reads the already-checkpointed frame with
      // no labels⋈labels join — one shuffle fewer per round
      val next = labels.select(col("id"), col("label"), lit(true).as("is_prev"))
        .unionByName(neighborLabels.withColumn("is_prev", lit(false)))
        .groupBy("id").agg(
          min(col("label")).as("label"),
          min(when(col("is_prev"), col("label"))).as("prev_label"))
        .localCheckpoint(true)
      // converged when no node changed label this round — without this, a
      // component with diameter > maxIter would silently split
      val changed = next.filter(col("label") =!= col("prev_label"))
        .limit(1).count()
      converged = changed == 0
      labels = next.select(col("id"), col("label"))
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (component diameter exceeds it)")
    labels
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (the two-phase
    * large-star/small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — the
    * diameter-INDEPENDENT complement to [[connectedComponents]]: label
    * propagation needs one round per hop of the deepest component, so a
    * length-10⁶ chain (link graphs, citation chains, transitively-linked
    * near-dup runs) needs 10⁶ shuffles; star contraction halves component
    * height every alternation and converges in O(log n) rounds on ANY
    * topology.
    *
    * Each round rewrites the edge set with two groupBy+join passes over
    * edges keyed by one endpoint (per-key MIN — map-side combined, no
    * neighbor lists are ever collected, so a 10⁸-degree hub node costs no
    * more than a leaf):
    *  - large-star: every node links its strictly-LARGER neighbors to the
    *    minimum of its closed neighborhood;
    *  - small-star: every node links its smaller-or-equal neighbors (and
    *    itself) to that minimum.
    * Both preserve connectivity exactly (no approximation); the fixpoint
    * is a forest of stars — every edge (root, v) with root = component
    * minimum. Convergence is an exact set comparison (count + anti-join),
    * not a checksum. Lineage is truncated per round with
    * localCheckpoint(eager) — same rationale as [[connectedComponents]]
    * (reliable checkpoint to durable storage at cluster scale).
    *
    * @return one row per non-null node appearing in `pairs`: (id, label)
    *         with label = smallest id in the node's component. Matches
    *         [[connectedComponents]] output exactly on null-free input;
    *         a pair with exactly one null endpoint keeps its non-null id
    *         as an isolated node (as label propagation does), and null
    *         ids themselves are never emitted as nodes.
    */
  def connectedComponentsStar(
      pairs0: org.apache.spark.sql.DataFrame,
      maxIter: Int = 25): org.apache.spark.sql.DataFrame = {
    // the input feeds BOTH the edge canonicalization and the self-node
    // pass below — materialize it once (see materializedPairs) so a
    // derived pair cascade is not replayed per consumer
    val pairs = materializedPairs(pairs0)
    // canonical undirected edge set: (u, v) with u < v, deduped
    var edges = pairs
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
      .localCheckpoint(true)
    // isolated self-pairs (id_a == id_b) still name a node: keep them so
    // the output space matches connectedComponents (node ∪ both sides).
    // A ONE-SIDED-null pair also names its non-null endpoint: least/
    // greatest above skip nulls, so (5, null) canonicalizes to u = v = 5
    // and is dropped as a self-loop — without this row the node would
    // vanish, where the label-propagation operator keeps it. Null ids
    // themselves are never nodes (coalesce + isNotNull).
    val selfNodes = pairs
      .filter(col("id_a") === col("id_b") ||
        col("id_a").isNull || col("id_b").isNull)
      .select(coalesce(col("id_a"), col("id_b")).as("id"))
      .filter(col("id").isNotNull)
      .distinct()

    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      // ---- large-star: for each node a, m = min(Γ(a) ∪ {a}); emit
      // (m, b) for every neighbor b > a. groupBy and join share the key,
      // so the aggregate's exchange is reused by the join (one shuffle).
      val nbrs = edges.select(col("u").as("a"), col("v").as("b"))
        .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
      val minsL = nbrs.groupBy("a")
        .agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("mn"), col("a")).as("m"))
      val afterLarge = nbrs.join(minsL, "a")
        .filter(col("b") > col("a"))
        .select(col("m").as("u"), col("b").as("v"))
        .distinct()
        .localCheckpoint(true)
      // ---- small-star: edges are (u, v) with u < v; for each v,
      // m = min of its smaller neighbors; emit (m, lo) for every smaller
      // neighbor lo ≠ m, plus (m, v) itself.
      val minsS = afterLarge.groupBy("v").agg(min(col("u")).as("m"))
      val loEdges = afterLarge.join(minsS, "v")
        .filter(col("u") =!= col("m"))
        .select(col("m").as("u"), col("u").as("v"))
      val next = loEdges
        .unionByName(minsS.select(col("m").as("u"), col("v")))
        .distinct()
        .localCheckpoint(true)
      // exact convergence in ONE action: both frames are distinct and
      // checkpointed, so unioning them and counting per (u, v) yields 2
      // exactly when the edge sits on both sides — set equality iff no
      // group counts 1. Replaces the former count+count+except triple
      // (three jobs, two of them shuffling both frames) with one shuffle.
      converged = next.unionByName(edges)
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") =!= 2).isEmpty
      edges = next
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds — " +
          "O(log n) bound exceeded, which indicates a bug, not deep data")
    // fixpoint is a star forest: every edge is (root, leaf). A self-pair
    // node that ALSO carries real edges is labeled by them — only
    // genuinely isolated self-pair nodes label themselves (anti-join, or
    // the node would surface twice under two labels)
    val fromEdges = edges.select(col("v").as("id"), col("u").as("label"))
      .unionByName(edges.select(col("u").as("id"), col("u").as("label")))
      .distinct()
    fromEdges.unionByName(
      selfNodes.join(fromEdges.select(col("id")), Seq("id"), "left_anti")
        .withColumn("label", col("id")))
  }
}
