"""Graph analytics over a pair/edge relation: connected components
(near-duplicate PAIRS -> duplicate CLUSTERS with a canonical keeper),
PageRank (float + exact-bigint quantized twin), degree-orientation
triangle counting, and k-core decomposition (rounds-synchronous peel).
The headline use is dedup execution:

Algorithm: iterative min-label propagation.  Every node starts labeled
with its own id; each round, every node adopts the minimum label among
itself and its neighbors; at fixpoint each component is labeled by its
minimum member id.  Rounds needed = the graph diameter, which for
near-dup clusters (dense blobs of mutually-similar docs, diameter 2-3)
means 2-4 rounds — the regime where this simple scheme beats the
alternating large-star/small-star construction (Kiveris et al., "CC in
MapReduce and Beyond", SoCC'14) that wins on pathological long chains.

Scale mechanics, per round:

- one shuffle: edges join labels on src, then min-aggregate per dst,
  merged with the current label (all partial-combinable);
- a LAZY ``localCheckpoint`` after every round — without checkpointing
  the plan DOUBLES per iteration and the job dies of lineage, the
  classic Spark iterative-algorithm failure mode;
- early termination via a changed-label count, which doubles as the
  action that materializes the round's checkpoint blocks — exactly one
  job per round.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bdq_spark.operators._checkpoint import data_checkpoint

__all__ = ["connected_components", "apply_dedup_clusters", "pagerank", "pagerank_quantized", "triangle_counts", "kcore"]


# node-table size under which iterative graph ops broadcast the label/
# rank relation into their per-round joins (2 longs/row -> ~32 MB at
# the bound) instead of shuffling both sides: near-dup graphs are
# proportional to the DUPLICATE population, so they sit far below this
# in practice, while a genuinely huge graph takes the CO-PARTITIONED
# shuffle path: every static relation is hash-partitioned by its join
# key once at setup, the iterated relation keeps that partitioning
# through its per-round checkpoint, and each round's only exchange is
# the keyed aggregate — the edge relation is never re-shuffled.
GRAPH_BROADCAST_MAX_NODES = 2_000_000


def _maybe_broadcast(df: DataFrame, n_nodes: int, bound: int) -> DataFrame:
    """Below the bound: broadcast.  Above it: SHUFFLE_HASH build hint —
    on the co-partitioned path both join sides are already hash-
    partitioned, so the hint's only effect is join STRATEGY: the node-
    sized side becomes a per-partition hash build and the edge side
    STREAMS, instead of the default sort-merge join re-sorting the full
    edge relation every round (at x100 scale those per-round sorts ran
    the 16 GiB measurement heap out of execution memory)."""
    return F.broadcast(df) if n_nodes <= bound else df.hint("shuffle_hash")


# depth-counted save/restore for _aqe_disabled: overlapping scopes on
# one session (concurrent SparkPipeline steps each planning a
# past-the-cutover graph op) must save the USER's AQE setting exactly
# once — at the outermost entry — and restore it exactly once, at the
# outermost exit.  Naive per-scope save/restore races: scope A saves
# "true", B saves the "false" A just set, A restores "true" mid-B, B
# finally restores "false" and the session leaks AQE-off.  The lock
# guards only the bookkeeping (entry/exit), never the yielded body, so
# concurrent graph sections still run in parallel.
_AQE_LOCK = threading.Lock()
_AQE_SCOPES: dict = {}  # id(session) -> [depth, saved_value]


@contextmanager
def _aqe_disabled(spark):
    """Scope for the co-partitioned shuffle path of the iterative graph
    operators.  ``localCheckpoint`` preserves a relation's
    ``outputPartitioning`` through the resulting ``LogicalRDD`` — but
    only when the captured physical plan is concrete: under AQE the
    captured root is an ``AdaptiveSparkPlanExec``, which reports unknown
    partitioning until execution commits a final plan, so every
    checkpointed side loses its co-partitioning and every per-round join
    re-shuffles the full edge relation (measured: the x100 pagerank
    graph, just past the broadcast cutover, paid 153 s vs 20 s at x30).
    Inside this scope plans are static, checkpoints keep their
    ``HashPartitioning``, and EnsureRequirements elides the per-round
    exchanges.  The trade — no runtime skew splitting during the rounds
    — is the standard one for co-partitioned iterative graph execution
    (a skewed key cannot be split without breaking co-location anyway);
    map-side partial aggregation still absorbs hot destination keys.

    Caveat: ``spark.conf`` is SESSION-scoped, so a query planned
    CONCURRENTLY on the same session (e.g. a parallel
    ``SparkPipeline`` step) while a past-the-cutover graph op holds
    this scope also plans without AQE — unavoidable for a shared
    session; pipelines that interleave huge-graph steps with
    AQE-sensitive steps should order them sequentially or run the
    graph step on ``spark.newSession()``.  What IS guaranteed: the
    user's AQE setting is saved at the OUTERMOST scope entry and
    restored at the OUTERMOST exit (depth-counted, lock-guarded), so
    overlapping scopes can never restore each other's intermediate
    "false" and leak AQE-off past the last exit.
    """
    key = "spark.sql.adaptive.enabled"
    sid = id(spark)
    with _AQE_LOCK:
        depth, saved = _AQE_SCOPES.get(sid, (0, None))
        if depth == 0:
            saved = spark.conf.get(key)
            spark.conf.set(key, "false")
        _AQE_SCOPES[sid] = (depth + 1, saved)
    try:
        yield
    finally:
        with _AQE_LOCK:
            depth, saved = _AQE_SCOPES[sid]
            if depth == 1:
                del _AQE_SCOPES[sid]
                spark.conf.set(key, saved)
            else:
                _AQE_SCOPES[sid] = (depth - 1, saved)


_CONF_LOCK = threading.Lock()
_CONF_SCOPES: dict = {}  # (id(session), key) -> [depth, saved_value]


@contextmanager
def _conf_pinned(spark, key: str, value: str):
    """Depth-counted session-conf pin (same locking discipline as
    :func:`_aqe_disabled`): the USER's value is saved at the OUTERMOST
    scope entry and restored at the OUTERMOST exit, so overlapping
    scopes on one session can never restore each other's intermediate
    values and leak the pin past the last exit.  Every entry SETS the
    value (nested scopes with different values: innermost-set wins
    until the outermost exit — a perf-only effect for the iterative
    loops this serves; results never depend on the pinned confs)."""
    sid = (id(spark), key)
    with _CONF_LOCK:
        depth, saved = _CONF_SCOPES.get(sid, (0, None))
        if depth == 0:
            saved = spark.conf.get(key)
        _CONF_SCOPES[sid] = (depth + 1, saved)
        spark.conf.set(key, value)
    try:
        yield
    finally:
        with _CONF_LOCK:
            depth, saved = _CONF_SCOPES[sid]
            if depth == 1:
                del _CONF_SCOPES[sid]
                spark.conf.set(key, saved)
            else:
                _CONF_SCOPES[sid] = (depth - 1, saved)


# per-partition row target for the ITERATION-LOOP shuffles of the
# broadcast-regime graph rounds: node-scale aggregates whose row count
# is KNOWN (counted at setup), so the loop pins exactly
# ceil(n_nodes / this) shuffle partitions — scale-adaptive by data, not
# a constant for either local mode or a cluster (guide §2)
_ROUND_ROWS_PER_PARTITION = 50_000

# largest round gap between convergence-count checks in the CC
# broadcast-regime loop (OPTIMIZATION_r14): checks run at rounds
# 1, 2, 4, 8, 12, 16, ... — geometric ramp-up capped so a mid-depth
# graph never pays more overshoot rounds than the check jobs it saves
_MAX_CHECK_GAP = 4


def _shuffle_partitions(spark) -> int:
    """The session's shuffle partition count as an int, falling back to
    ``defaultParallelism`` when the conf is non-numeric — platforms with
    AQE auto-optimized shuffle report ``spark.sql.shuffle.partitions``
    as the string ``"auto"``, and ``int("auto")`` would fail the whole
    graph operator at first use."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _keyed_checkpoint(df: DataFrame, key: str) -> DataFrame:
    """Hash-partition ``df`` by ``key`` into the session's shuffle
    partition count and checkpoint it — inside :func:`_aqe_disabled`
    the checkpoint keeps the partitioning, so downstream equi-joins and
    aggregates on ``key`` (with the same partition count, which
    ENSURE_REQUIREMENTS defaults to) insert no exchange.

    Storage level: SERIALIZED (:func:`data_checkpoint`) even for the
    node-scale relations routed here, deliberately diverging from
    ``_checkpoint.py``'s keep-node-scale-deserialized default — this
    helper only runs PAST the broadcast cutover, where "node-scale"
    means >2M rows by definition and grows with the graph, so the ~4x
    deserialized object overhead is exactly the storage-memory pressure
    the serialized level exists to cap; the per-round deserialize of a
    2-long-row relation is noise next to the round's edge-scan join it
    feeds."""
    spark = df.sparkSession
    return data_checkpoint(df.repartition(_shuffle_partitions(spark), key))


def _cloned_session(spark):
    """An ISOLATED SparkSession for a graph op's iterative section
    (``graph_session=True``): same SparkContext (same executors, same
    cached blocks), cloned SQL state — so the :func:`_aqe_disabled`
    scope the co-partitioned path needs flips AQE off on the CLONE
    only, and queries planned concurrently on the caller's session
    keep their AQE.  This removes the one residual caveat of the
    shared-session scope (documented in :func:`_aqe_disabled`) for
    pipeline users, at zero cost to the default path.

    ``cloneSession()`` (not ``newSession()``): the clone COPIES the
    current runtime SQL conf — shuffle partition counts etc. set at
    runtime keep governing the graph — where a new session would reset
    to the builder-time conf."""
    from pyspark.sql import SparkSession

    jclone = spark._jsparkSession.cloneSession()
    return SparkSession(spark.sparkContext, jsparkSession=jclone)


def _rebind(df: DataFrame, session) -> DataFrame:
    """Re-expose ``df`` as a DataFrame of ``session`` WITHOUT copying
    data: the physical plan's ``RDD[InternalRow]`` (lazy — nothing
    executes here) becomes the new frame's leaf.  Planning of ``df``'s
    own subtree stays with the session that created it (its
    ``QueryExecution`` is already bound), so rebinding the graph input
    into the clone and the result back out gives the iterative section
    the clone's conf while the caller composes the output with their
    own session's frames as usual.  Sessions sharing one SparkContext
    is exactly the case ``internalCreateDataFrame`` exists for
    (package-private in Scala, public in bytecode — the same surface
    PySpark itself crosses for Arrow ingestion)."""
    jdf = df._jdf
    jrdd = jdf.queryExecution().toRdd()
    jnew = session._jsparkSession.internalCreateDataFrame(
        jrdd, jdf.schema(), False
    )
    return DataFrame(jnew, session)


def _enter_graph_session(df: DataFrame, graph_session: bool):
    """Common entry hook: returns ``(df, exec_spark, caller_spark)`` —
    identity when ``graph_session`` is False (the default path plans
    nothing extra), else ``df`` rebound into a cloned session."""
    spark = df.sparkSession
    if not graph_session:
        return df, spark, spark
    clone = _cloned_session(spark)
    return _rebind(df, clone), clone, spark


# fused-setup regime floor, in INPUT PAIR rows: a pair relation at or
# below half the node cutover cannot produce a past-cutover graph
# (n_nodes <= 2 * n_pairs), so its edge checkpoint's hash(a)
# partitioning would never be reused — the rounds broadcast the node
# side — and pinning a tiny edge relation at the session shuffle
# partition count just schedules that many near-empty tasks in EVERY
# per-round job (measured at sf0.1: embedding_dedup_clusters 5.6 s with
# the AQE-coalesced setup vs 12.1 s pinned at 32 partitions).  Small
# graphs keep the AQE-planned symmetrize-distinct; only graphs that can
# cross the cutover pay the fused co-partitioned setup.
def _may_exceed_cutover(n_pairs: int, broadcast_max_nodes: int) -> bool:
    return 2 * n_pairs > broadcast_max_nodes


# de-pin coalesce target: ~4 MiB of serialized 16-byte edge rows per
# partition — small enough that a single peeled round never waits on
# one straggler partition, large enough that a sub-million-row graph
# collapses to a handful of tasks
_EDGE_ROWS_PER_PARTITION = 262_144


def _depin_small_edges(e: DataFrame, broadcast_max_nodes: int) -> DataFrame:
    """PageRank's fused setup shuffles the edge relation ONCE at the
    session shuffle partition count, necessarily before any count
    exists (pre-counting would re-materialize the edge-scale input —
    the second edge materialization the x100 sweep removed).  When the
    count — one cheap job over the just-written checkpoint blocks —
    then shows a graph that CANNOT cross the node cutover
    (``n_nodes <= 2 * n_edges``), the captured hash(src) partitioning
    will never be reused (the rounds broadcast the node side), so a
    tiny relation pinned at the shuffle partition count pays that many
    near-empty tasks in every per-round job — the CC bench cliff
    (5.6 s -> 12.1 s at sf0.1).  Re-checkpoint coalesced to the data's
    natural width; a cutover-capable graph keeps its keyed pin
    untouched."""
    n_edges = e.count()
    n_cur = e.rdd.getNumPartitions()
    want = max(1, min(n_cur, -(-n_edges // _EDGE_ROWS_PER_PARTITION)))
    if want < n_cur and not _may_exceed_cutover(n_edges, broadcast_max_nodes):
        return data_checkpoint(e.coalesce(want))
    return e


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    broadcast_max_nodes: int = GRAPH_BROADCAST_MAX_NODES,
    graph_session: bool = False,
) -> DataFrame:
    """Label every node appearing in ``pairs`` with its component's
    minimum member id.

    ``graph_session=True`` runs the iterative section on a CLONED
    session (:func:`_cloned_session`), so the AQE-off scope the
    past-cutover path requires can't leak into queries planned
    concurrently on the caller's session; the input crosses in and the
    result crosses back as zero-copy RDD rebinds.  Default False: no
    extra planning, byte-identical to the historical path.

    Output: ``(id, cluster_id, is_keeper)`` — one row per distinct node;
    ``is_keeper`` marks the minimum-id member, giving a deterministic
    survivor per duplicate cluster.  Raises if ``max_iterations`` rounds
    don't reach the fixpoint (pathologically long chains — raise the
    bound or pre-split the graph).

    When the node table is small (``<= broadcast_max_nodes``, counted
    once after the input checkpoint), each round is ONE FUSED
    min-aggregate: the broadcast label join's neighbor contributions
    union the labels' own rows and a single keyed shuffle takes the
    min per id (``_round_broadcast`` — provably equal to the classic
    neighbor-min + merge-join round, with one broadcast build instead
    of two and no second join).  Near-dup graphs are sized by the
    duplicate population, not the corpus, so this is the common case.  A larger graph takes the CO-PARTITIONED shuffle path:
    edges are hash-partitioned by source and labels by id once at setup
    (under :func:`_aqe_disabled`, so the checkpoints keep their
    partitioning), the per-round label relation inherits hash(id)
    through its lazy checkpoint (the merge join's left side), and each
    round again costs exactly one exchange — the min-aggregate; the
    edge relation is shuffled once at setup, never per round.  Values
    are exact integers on either path, so the result is identical.
    """
    # checkpoint the INPUT first: the union below reads the pair relation
    # twice (both edge directions), and the upstream pair producers
    # (LSH banding, Jaccard verify) are the expensive part of the whole
    # clustering query — without this they would execute twice
    directed = data_checkpoint(
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    )
    directed, spark, caller_spark = _enter_graph_session(
        directed, graph_session
    )
    mirror = directed.select(F.col("b").alias("a"), F.col("a").alias("b"))
    # the count is one cheap job over the checkpoint blocks just
    # materialized; it picks the setup regime BEFORE the symmetrize
    # shuffle runs, so small graphs never get pinned wide
    n_pairs = directed.count()
    if _may_exceed_cutover(n_pairs, broadcast_max_nodes):
        with _aqe_disabled(spark):
            # ONE symmetrize-dedup shuffle, captured with hash(a): the
            # per-partition dropDuplicates rides the repartition
            # exchange (hash(a) satisfies the (a, b) clustering), and
            # past the cutover the rounds reuse this partitioning
            # without a second edge materialization — see
            # :func:`pagerank`
            edges = data_checkpoint(
                directed.union(mirror)
                .repartition(_shuffle_partitions(spark), "a")
                .dropDuplicates()
            )
    else:
        # small graph (cannot cross the node cutover): the rounds
        # broadcast the label side, so edge partitioning is never
        # reused — let AQE plan the symmetrize-dedup and COALESCE the
        # checkpoint to the data's natural width instead of pinning a
        # sub-partition-size relation at the session shuffle count
        # (see :func:`_may_exceed_cutover` for the measured cliff)
        edges = data_checkpoint(directed.union(mirror).distinct())
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    n_nodes = labels.count()

    def _round_broadcast(edges: DataFrame, labels: DataFrame) -> DataFrame:
        """One FUSED propagation round for the broadcast regime: the
        neighbor contributions ``(b, comp_of_a)`` UNION the nodes' own
        ``(id, comp)`` rows feed a single min-aggregate keyed by id —
        ``min(own, neighbor mins)`` in one shuffle with NO second join
        (the classic round's neighbor-min agg + label merge join cost
        two broadcast builds + a join per round).  The old label rides
        along as ``__own`` (exactly one non-null per group — labels
        hold each id once), so the changed flag is computed in the
        same aggregate.  Result provably identical: min over {own} ∪
        {neighbor comps} = least(own, coalesce(min(neighbors), own)).

        (A Shiloach-Vishkin pointer-jumping variant was measured and
        REJECTED in r13: on the diameter-17 cosine-0.4 graph it cut
        rounds 17 -> 11 but cost a broadcast self-join per round —
        6 jobs/round vs 4 and a higher per-round wall, net slower.
        One jump per round only shortcuts one chase level; the log-
        diameter bound needs per-round compression to a fixpoint,
        which costs more joins than the rounds it saves here.)"""
        contrib = edges.join(
            F.broadcast(labels), edges.a == labels.id
        ).select(F.col("b").alias("id"), "comp", F.lit(None).cast(
            labels.schema["comp"].dataType
        ).alias("__own"))
        own = labels.select("id", "comp", F.col("comp").alias("__own"))
        return (
            own.unionByName(contrib)
            .groupBy("id")
            .agg(
                F.min("comp").alias("comp"),
                F.min("__own").alias("__own"),
            )
            .select(
                "id",
                "comp",
                (F.col("comp") < F.col("__own")).alias("__changed"),
            )
        )

    def _round_copartitioned(edges: DataFrame, labels: DataFrame) -> DataFrame:
        # past the cutover the classic two-step round is load-bearing:
        # the neighbor-min agg exchanges only the (partial-aggregated)
        # contributions and the label merge join is exchange-free on
        # the co-partitioned sides — a fused union-agg would re-shuffle
        # the node-scale label relation every round
        neighbor_min = (
            edges.join(labels.hint("shuffle_hash"), edges.a == labels.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("comp").alias("__n_comp"))
        )
        return labels.join(
            neighbor_min.hint("shuffle_hash"), "id", "left"
        ).select(
            "id",
            F.least(
                F.col("comp"),
                F.coalesce(F.col("__n_comp"), F.col("comp")),
            ).alias("comp"),
            (F.col("__n_comp") < F.col("comp")).alias("__changed"),
        )

    def _done(labels: DataFrame) -> DataFrame:
        return labels.select(
            "id",
            F.col("comp").alias("cluster_id"),
            (F.col("id") == F.col("comp")).alias("is_keeper"),
        )

    def _rounds(edges: DataFrame, labels: DataFrame) -> DataFrame:
        if n_nodes <= broadcast_max_nodes:
            # GEOMETRIC convergence checks (OPTIMIZATION_r14, guide
            # §2.6/§1.2): the changed-count is scheduled only at rounds
            # 1, 2, 4, 8, ... (bounded by max_iterations), not every
            # round — label mins are monotone and propagation past the
            # fixpoint is a no-op, so detecting convergence a few
            # no-op rounds late returns IDENTICAL labels while the
            # skipped rounds' lazy checkpoints all materialize inside
            # the next check's single count job (the rounds are a
            # serial driver-bound chain: each count job saved is wall
            # time at any scale; the overshoot rounds are node-scale
            # no-op aggregates, bounded-cheap in this regime by
            # n_nodes <= broadcast_max_nodes).  The past-cutover path
            # below keeps its every-round check: there an overshoot
            # round is a full node-scale exchange, which at cutover
            # scale costs more than the count job it saves.
            rounds_run = 0
            next_check = 1
            while rounds_run < max_iterations:
                target = min(next_check, max_iterations)
                while rounds_run < target:
                    new_labels = _round_broadcast(
                        edges, labels
                    ).localCheckpoint(eager=False)
                    labels = new_labels.drop("__changed")
                    rounds_run += 1
                if new_labels.filter(F.col("__changed")).count() == 0:
                    return _done(labels)
                # gap capped at _MAX_CHECK_GAP: an overshoot round costs
                # one broadcast-build job, a skipped check saves one
                # count job — uncapped doubling can overshoot by up to
                # the whole diameter (net loss on mid-depth graphs,
                # e.g. diameter 9 detected at round 16), while the cap
                # bounds the overshoot at 3 rounds and keeps nearly all
                # of the deep-graph check savings (measured at sf0.1:
                # embedding_dedup_clusters 50 -> 42 construct jobs)
                next_check = rounds_run + min(rounds_run, _MAX_CHECK_GAP)
        else:
            for _ in range(max_iterations):
                # LAZY checkpoint: the changed-count below is the
                # round's one and only action — it materializes and
                # stores the checkpoint blocks as a side effect (an
                # eager checkpoint + separate count was two full jobs)
                new_labels = _round_copartitioned(
                    edges, labels
                ).localCheckpoint(eager=False)
                changed = new_labels.filter(F.col("__changed")).count()
                labels = new_labels.drop("__changed")
                if changed == 0:
                    return _done(labels)
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (graph diameter exceeds the bound)"
        )

    if n_nodes > broadcast_max_nodes:
        # edges already carry hash(a) from the setup checkpoint; only
        # the label relation needs keying
        with _aqe_disabled(spark):
            out = _rounds(edges, _keyed_checkpoint(labels, "id"))
    else:
        # broadcast-regime rounds: every loop query is one node-scale
        # min-aggregate whose output row count is KNOWN (n_nodes), so
        # pin the shuffle width to the data and drop AQE for the loop —
        # AQE's only per-round contribution is re-deriving that width
        # as an extra scheduled query-stage job, and the rounds are a
        # serial driver-bound chain (measured at sf0.1: 4 -> 2 jobs and
        # ~0.5 -> ~0.25 s per round; labels bit-identical)
        n_part = max(
            1,
            min(
                _shuffle_partitions(spark),
                -(-n_nodes // _ROUND_ROWS_PER_PARTITION),
            ),
        )
        with _aqe_disabled(spark), _conf_pinned(
            spark, "spark.sql.shuffle.partitions", str(n_part)
        ):
            out = _rounds(edges, labels)
    return _rebind(out, caller_spark) if graph_session else out


def apply_dedup_clusters(
    df: DataFrame,
    clusters: DataFrame,
    id_column: str = "doc_id",
) -> DataFrame:
    """Execute the dedup decision: drop every non-keeper cluster member
    from ``df``; rows never seen in a pair (the vast majority of a real
    corpus) pass through untouched.

    One LEFT ANTI join against the (small) non-keeper id set — the
    cluster relation is proportional to the DUPLICATE population, not
    the corpus, so this is broadcast-sized in practice.
    """
    non_keepers = clusters.filter(~F.col("is_keeper")).select(
        F.col("id").alias(id_column)
    )
    return df.join(non_keepers, id_column, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    broadcast_max_nodes: int = GRAPH_BROADCAST_MAX_NODES,
    graph_session: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank power iteration over an edge relation —
    the standard importance measure for entity graphs a data pipeline
    derives (co-purchase, citation, link graphs), complementing
    :func:`connected_components` on the graph-analytics surface.

    Returns ``(id, rank)`` for every node appearing as a source or
    destination.  Per Page et al. (1999):

    ``r_{k+1}(v) = (1-d)/N + d * (sum_{u->v} r_k(u)/outdeg(u)
    + dangling_mass_k / N)``

    where dangling (out-degree-0) nodes donate their mass uniformly.
    Fixed ``iterations`` (vs convergence-tested) keeps the result a
    pure function of the input — required for the value-hash oracle,
    and the standard choice for bounded-latency batch ranking.

    Scale mechanics: the edge relation is materialized EXACTLY ONCE —
    one shuffle that hash-partitions it by source (per-partition dedup
    rides the same exchange: hash(src) satisfies the (src, dst)
    distinct clustering) into a SERIALIZED checkpoint captured under
    :func:`_aqe_disabled` so it keeps its partitioning.  The per-edge
    ``rank/outdeg`` weight is NOT pre-joined onto the edges (an
    edge-scale second materialization, measured 59 s of the x100 wall):
    the out-degree is joined onto the rank relation ONCE at setup and
    CARRIED through the iterations, so each round derives the weight
    NODE-scale with a filter+project (no join) and streams the edges
    against that — per iteration the only work is one shuffle (the
    per-destination partial-agg sum) plus — only when dangling nodes
    exist at all — a 1-row mass aggregate over the deg-null rank rows.  A LAZY ``localCheckpoint``
    per iteration keeps the plan flat (same iterative-lineage cure as
    :func:`connected_components`).  When the node table is small
    (``<= broadcast_max_nodes``), the weight and update joins run as
    BROADCAST hash joins; a huge graph takes the CO-PARTITIONED path —
    node tables hash-partitioned by id at setup, the rank relation
    inheriting hash(id) through its per-round lazy checkpoint, and the
    node-sized join sides built as SHUFFLE_HASH maps so the edge side
    streams without per-round sorts.

    ``graph_session=True``: same cloned-session isolation contract as
    :func:`connected_components` — the AQE-off scope (which this
    operator holds for its ENTIRE body, setup included) applies to the
    clone only.
    """
    edges, spark, caller_spark = _enter_graph_session(edges, graph_session)
    with _aqe_disabled(spark):
        # ONE edge shuffle for the whole query, captured with its
        # hash(src) partitioning (same shuffle count as a plain
        # distinct; small graphs get de-pinned right below)
        e = data_checkpoint(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .repartition(_shuffle_partitions(spark), "src")
            .dropDuplicates()
        )
    e = _depin_small_edges(e, broadcast_max_nodes)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        out = nodes.withColumn("rank", F.lit(0.0))
        return _rebind(out, caller_spark) if graph_session else out

    def _run(nodes: DataFrame) -> DataFrame:
        # node-scale static: out-degree per source (exchange-free over
        # the src-partitioned edges).  The degree is joined onto the
        # rank relation ONCE here and CARRIED through the iterations —
        # the per-round ranks ⋈ deg join (a broadcast build job per
        # round under the broadcast regime, a merge/hash join per round
        # past the cutover) becomes a filter+project on the carried
        # column (OPTIMIZATION_r13: 2 joins + 2 broadcasts per round ->
        # 1 + 1).  Dangling detection is a COUNT comparison (a source
        # with out-edges has a deg row; n_deg < n_nodes iff some node
        # has no out-edges) instead of materializing an anti-join
        # node set — and the per-round dangling mass, when needed at
        # all, is a filter on the carried deg (IS NULL), not a join.
        deg = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .select(F.col("src").alias("id"), "deg")
            .localCheckpoint(eager=True)
        )
        has_dangling = deg.count() < n_nodes
        ranks = nodes.join(
            _maybe_broadcast(deg, n_nodes, broadcast_max_nodes), "id", "left"
        ).select("id", "deg", F.lit(1.0 / n_nodes).alias("rank"))
        base = (1.0 - damping) / n_nodes
        for _ in range(iterations):
            dangling = (
                ranks.filter(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
                if has_dangling
                else 0.0
            )
            # per-source weight, node-scale (deg-null rows excluded:
            # zero-outdegree nodes contribute through the dangling term)
            rdeg = ranks.filter(F.col("deg").isNotNull()).select(
                "id", (F.col("rank") / F.col("deg")).alias("w")
            )
            contrib = (
                e.join(
                    _maybe_broadcast(rdeg, n_nodes, broadcast_max_nodes),
                    e["src"] == rdeg["id"],
                )
                .groupBy("dst")
                .agg(F.sum(F.col("w")).alias("c"))
            )
            ranks = (
                ranks.join(
                    _maybe_broadcast(contrib, n_nodes, broadcast_max_nodes),
                    ranks["id"] == contrib["dst"],
                    "left",
                )
                .select(
                    "id",
                    "deg",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("c"), F.lit(0.0))
                            + F.lit(dangling / n_nodes)
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
        # every round is PLANNED here (localCheckpoint builds its RDD at
        # call time, lazy only in materialization), so the whole loop's
        # plans are captured inside the caller's scope
        return ranks.select("id", "rank")

    if n_nodes > broadcast_max_nodes:
        with _aqe_disabled(spark):
            out = _run(_keyed_checkpoint(nodes, "id"))
    else:
        out = _run(nodes)
    return _rebind(out, caller_spark) if graph_session else out


def pagerank_quantized(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**12,
    broadcast_max_nodes: int = GRAPH_BROADCAST_MAX_NODES,
    graph_session: bool = False,
) -> DataFrame:
    """Engine-portable PageRank twin: the same power iteration as
    :func:`pagerank` carried out entirely in EXACT bigint arithmetic —
    ranks scaled by ``scale``, every division an explicit floor — so
    the result is bit-identical across engines and value-hash-checkable
    (float PageRank is not: partial-agg summation order perturbs the
    low bits, and over thousands of nodes some value always lands on a
    rounding boundary).  Same role as the md5 twins of the xxhash64
    MinHash/SimHash paths.

    Quantization: each node's rank differs from the float iteration by
    at most ``iterations / scale`` — at the default scale, 3e-12 —
    so ordering is preserved for any real rank gap.  Damping is fixed
    at the standard 85/100 (integer percent keeps the update exact).

    Update rule (all integer ops)::

        base  = (15 * (scale // N)) // 100
        r'(v) = base + (85 * (sum_{u->v} r(u) // deg(u)
                              + dangling // N)) // 100

    Scale mechanics: identical to :func:`pagerank` — one shuffle per
    iteration under the node-count broadcast bound, broadcast 1-row
    dangling scalar, lazy localCheckpoint; above the bound, the same
    co-partitioned setup (edges by source, nodes/ranks by id, planned
    under :func:`_aqe_disabled`) keeps the rounds at one exchange with
    the edge relation shuffled once at setup.  ``graph_session=True``:
    same cloned-session AQE isolation as :func:`pagerank`.
    """
    edges, spark, caller_spark = _enter_graph_session(edges, graph_session)
    with _aqe_disabled(spark):
        # ONE edge shuffle, captured with hash(src) — see :func:`pagerank`
        e = data_checkpoint(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .repartition(_shuffle_partitions(spark), "src")
            .dropDuplicates()
        )
    e = _depin_small_edges(e, broadcast_max_nodes)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        out = nodes.withColumn("rank_q", F.lit(0).cast("bigint"))
        return _rebind(out, caller_spark) if graph_session else out

    def _run(nodes: DataFrame) -> DataFrame:
        # node-scale static — deg carried on the rank relation and
        # dangling detection by count comparison, exactly as in
        # :func:`pagerank` (see the comment there; OPTIMIZATION_r13)
        deg = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .select(F.col("src").alias("id"), "deg")
            .localCheckpoint(eager=True)
        )
        has_dangling = deg.count() < n_nodes
        ranks = nodes.join(
            _maybe_broadcast(deg, n_nodes, broadcast_max_nodes), "id", "left"
        ).select(
            "id", "deg", F.lit(scale // n_nodes).cast("bigint").alias("rank_q")
        )
        base = (15 * (scale // n_nodes)) // 100
        for _ in range(iterations):
            dangling = (
                ranks.filter(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("rank_q"), F.lit(0)).cast("bigint"))
                .first()[0]
                if has_dangling
                else 0
            )
            # `div` is Spark's EXACT integer division — floor() of the
            # double quotient can misround for large operands.  Computed
            # once per NODE; the per-edge contribution is identical to
            # dividing per edge, so the recurrence is unchanged.
            rdeg = ranks.filter(F.col("deg").isNotNull()).select(
                "id", F.expr("rank_q div deg").alias("w")
            )
            contrib = (
                e.join(
                    _maybe_broadcast(rdeg, n_nodes, broadcast_max_nodes),
                    e["src"] == rdeg["id"],
                )
                .groupBy("dst")
                .agg(F.sum(F.col("w")).alias("c"))
            )
            ranks = (
                ranks.join(
                    _maybe_broadcast(contrib, n_nodes, broadcast_max_nodes),
                    ranks["id"] == contrib["dst"],
                    "left",
                )
                .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
                .select(
                    "id",
                    "deg",
                    F.expr(
                        f"CAST({base} + (85 * (c + {dangling // n_nodes}))"
                        " div 100 AS BIGINT)"
                    ).alias("rank_q"),
                )
                .localCheckpoint(eager=False)
            )
        return ranks.select("id", "rank_q")

    if n_nodes > broadcast_max_nodes:
        with _aqe_disabled(spark):
            out = _run(_keyed_checkpoint(nodes, "id"))
    else:
        out = _run(nodes)
    return _rebind(out, caller_spark) if graph_session else out


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge relation — the
    clustering-structure primitive (community cores, spam/link-farm
    signals) next to :func:`connected_components` and :func:`pagerank`.

    Algorithm: degree-based edge ORIENTATION (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11) —
    orient every undirected edge from its lower-(degree, id) endpoint
    to the higher one, which makes the graph acyclic and bounds every
    out-degree by O(sqrt(m)); then one self-join of the oriented edges
    on the source enumerates wedges, and one join back against the
    oriented edge set closes them.  Each triangle is found exactly
    once, so the per-node counts (each triangle credits its three
    vertices) are exact and orientation-independent.

    Scale shape: two shuffles (wedge join + closing join) after the
    degree aggregation; the orientation is precisely what prevents the
    one-hot-vertex wedge explosion a naive join pays on skewed degree
    distributions.  Output: ``(id, n_triangles)`` for EVERY vertex in
    the edge set (zeros included — a deterministic relation).
    """
    und = data_checkpoint(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    verts = und.select(F.col("a").alias("id")).union(
        und.select(F.col("b").alias("id"))
    )
    # deg is referenced three times, but its duplicate subtrees share
    # one exchange via ReuseExchange (canonically identical aggregates)
    # and the remaining recompute is a cheap agg over the edge
    # checkpoint — a lazy localCheckpoint here was measured and
    # REJECTED in r13 (+2 scheduled jobs, construct wall up ~1 s: the
    # persist materialization costs more than the agg it saves)
    deg = verts.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    # total order: (degree, id) packed into one sortable key
    keyed = (
        und.join(deg.withColumnRenamed("id", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.withColumnRenamed("id", "b").withColumnRenamed(
                "deg", "deg_b"
            ),
            "b",
        )
    )
    # lexicographic STRUCT comparison, not a packed integer key: packing
    # deg * 2^32 + id silently stops being a total order once ids reach
    # 2^32 (realistic at fleet scale), and a non-total orientation can
    # create cycles that double-count or miss triangles
    ka = F.struct(F.col("deg_a").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("deg_b").alias("d"), F.col("b").alias("i"))
    oriented = data_checkpoint(
        keyed.select(
            F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("w1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("w2"))
    wedges = e1.join(e2, "u").filter(F.col("w1") < F.col("w2"))
    # close the wedge: the (w1, w2) oriented edge may run either way
    closer = oriented.select(
        F.least("u", "v").alias("w1"), F.greatest("u", "v").alias("w2")
    )
    tris = wedges.join(closer, ["w1", "w2"])
    # credit all three corners via ONE explode: the pre-r13 union of
    # three selects referenced tris three times, and a DataFrame
    # referenced N times is planned as N independent subtrees — the
    # wedge enumeration join (the expensive O(m^1.5) step the
    # orientation exists to bound) ran three times per query.
    # explode(array(u, w1, w2)) is multiset-identical to the union
    # (3 rows per triangle either way) and plans the join once
    # (OPTIMIZATION_r13, guide §2.4).
    credit = (
        tris.select(
            F.explode(F.array("u", "w1", "w2")).alias("id")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.select("id")
        .join(credit, "id", "left")
        .select(
            "id",
            F.coalesce("n_triangles", F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    broadcast_max_nodes: int = GRAPH_BROADCAST_MAX_NODES,
    graph_session: bool = False,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    Matula-Beck peel, rounds-synchronous): repeatedly delete every node
    of degree < k until none remains; the survivors with their final
    degrees are the k-core.  Completes the graph family next to
    connected components, PageRank and triangle counting — cores are
    the standard dense-subgraph screen (community seeds, spam/bot
    rings, near-dup cluster cores).

    Input is an UNDIRECTED edge list (one row per edge, either
    orientation); it is symmetrized and de-duplicated here.  Returns
    ``(id, degree)`` for k-core members — deterministic (set
    semantics; no tie-breaking needed because the peel removes ALL
    sub-k nodes each round, which is order-independent).

    Raises ``RuntimeError`` if the peel has not converged within
    ``max_rounds`` — that makes a FIXED-round SQL replay a sound
    oracle: if the entry returns at all, running the oracle for
    ``max_rounds`` rounds computes the same fixed point (extra rounds
    past convergence are no-ops).

    Scale shape, two regimes split on the symmetrized edge count
    compared against ``broadcast_max_nodes`` — a deliberately
    CONSERVATIVE node-regime test, not a repurposing of the bound:
    every node of the symmetrized relation contributes at least one
    source row, so ``n_nodes <= n_edges_sym``, and an edge count at or
    under the node bound PROVES the node set is under it too (the
    converse regime can only start later than a true node count would,
    which costs nothing: the zero-exchange machinery's fixed costs —
    serialized round checkpoints, per-round broadcast builds — measured
    ~+1 s on bench-scale graphs while saving nothing, so erring toward
    the simple peel is the right direction).  The same inequality
    bounds the small path's unconditional ``F.broadcast(bad)``: the
    sub-k node set is at most ``n_nodes <= n_edges_sym <=
    broadcast_max_nodes`` rows of one long (~16 MB at the default
    bound), within Spark's broadcast comfort zone by construction:

    - ``<= broadcast_max_nodes`` edges: each round is one degree
      aggregation plus two BROADCAST anti-joins against the (shrinking)
      sub-k node set, eager checkpoint per round, AQE left on.
    - above it: the adjacency is hash-partitioned by source ONCE
      (inside :func:`_aqe_disabled`, so every per-round checkpoint
      keeps the partitioning), after which the peel rounds are
      EXCHANGE-FREE: the degree aggregation and the source-side
      anti-join are co-partitioned on ``src`` (SHUFFLE_HASH build on
      the bad set, so the adjacency streams unsorted), and the
      destination-side deletions are exactly the MIRRORS of the
      source-side deletions (the relation is symmetric) — a set bounded
      by ``k * n_bad`` rows (every deleted node has degree < k),
      broadcast into an anti-join on the full edge pair instead of
      re-shuffling the adjacency by destination.  A round whose
      deletion set exceeds the broadcast bound falls back to the
      shuffled destination anti-join and re-establishes the source
      partitioning for the next round.

    Rounds are bounded by the graph's degeneracy ordering depth
    (log-ish for tree-like regions), not by node count; the peeled set
    is counted each round (the count doubles as the convergence check).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if graph_session:
        # same cloned-session AQE isolation as connected_components,
        # via self-recursion: rebind the edge input into the clone
        # (upstream planning stays with the caller's session — toRdd
        # captures it under the caller's conf), peel there, rebind the
        # result back
        rebased, _, caller_spark = _enter_graph_session(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
            True,
        )
        out = kcore(
            rebased, k, "src", "dst", max_rounds, broadcast_max_nodes
        )
        return _rebind(out, caller_spark)
    fwd = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    # the input pair producer (often an expensive near-dup query) runs
    # HERE, under the session's normal AQE setting
    cur = data_checkpoint(
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    n_edges = cur.count()

    if n_edges <= broadcast_max_nodes:
        # same round-loop conf pin as the CC broadcast regime: every
        # peel round's only shuffle is the degree aggregate, whose
        # input row count is KNOWN (n_edges, counted above), so pin
        # the shuffle width to the data and drop AQE for the loop —
        # AQE's per-round contribution was re-deriving that width as
        # extra scheduled query-stage jobs in a SERIAL job chain
        # (OPTIMIZATION_r13; data-derived, not a local-mode constant).
        # The anti-joins are explicit broadcasts, so AQE had no join
        # strategy left to improve here.
        spark = edges.sparkSession
        n_part = max(
            1,
            min(
                _shuffle_partitions(spark),
                -(-n_edges // _ROUND_ROWS_PER_PARTITION),
            ),
        )
        # NOTE on the pin vs the shrinking peel (ADVICE r13): n_part is
        # derived once from the INITIAL n_edges while cur only shrinks,
        # so late rounds run wider than their data — but this regime is
        # entered only when n_edges <= broadcast_max_nodes, which caps
        # the over-partitioning at ceil(bound / 50k) tasks (a handful);
        # re-deriving would cost the very count jobs this loop removes.
        with _aqe_disabled(spark), _conf_pinned(
            spark, "spark.sql.shuffle.partitions", str(n_part)
        ):
            # (geometric convergence checks were measured here and
            # REJECTED in r14: a kcore overshoot round costs broadcast-
            # build jobs that outweigh the one count job a skipped
            # check saves — docs_kcore_graph read 33 -> 42 construct
            # jobs with the doubling schedule.  The CC broadcast loop
            # keeps them because its overshoot rounds cost exactly one
            # job each.)
            for _ in range(max_rounds):
                deg = cur.groupBy("src").agg(
                    F.count(F.lit(1)).alias("degree")
                )
                # LAZY checkpoint + count as the round's single action
                # (the count materializes the blocks; an eager
                # checkpoint + a separate isEmpty was two jobs), and
                # the previous round's lazily-checkpointed cur
                # materializes inside the same job (OPTIMIZATION_r13 —
                # the peel is a serial job chain, so every job saved
                # is wall time at any scale)
                bad = deg.where(F.col("degree") < k).select(
                    "src"
                ).localCheckpoint(eager=False)
                if bad.count() == 0:
                    return deg.select(F.col("src").alias("id"), "degree")
                # (Sharing ONE broadcast build between the two anti-
                # joins — identical aliased children so ReuseExchange
                # canonicalizes them — was measured in r14 and
                # REJECTED: the final plan does show ReusedExchange,
                # but the localCheckpoint construction still submits
                # two broadcast-build jobs at runtime, so the round's
                # job count is unchanged and the rename is simpler.)
                cur = (
                    cur.join(F.broadcast(bad), "src", "left_anti")
                    .join(
                        F.broadcast(bad.withColumnRenamed("src", "dst")),
                        "dst",
                        "left_anti",
                    )
                    .localCheckpoint(eager=False)
                )
            deg = cur.groupBy("src").agg(
                F.count(F.lit(1)).alias("degree")
            )
            if deg.where(F.col("degree") < k).isEmpty():
                return deg.select(F.col("src").alias("id"), "degree")
        raise RuntimeError(
            f"kcore: peel did not converge within {max_rounds} rounds"
        )

    with _aqe_disabled(edges.sparkSession):
        cur = _keyed_checkpoint(cur, "src")
        for _ in range(max_rounds):
            deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
            bad = deg.where(F.col("degree") < k).select(
                "src"
            ).localCheckpoint(eager=True)
            n_bad = bad.count()
            if n_bad == 0:
                return deg.select(F.col("src").alias("id"), "degree")
            # shuffle-hash build on the bad set: co-partitioned on src,
            # so the adjacency streams (no per-round sort of the edges)
            survivors = cur.join(
                bad.hint("shuffle_hash"), "src", "left_anti"
            )
            if k * n_bad <= broadcast_max_nodes:
                # deleted rows' mirrors = the rows whose DESTINATION is
                # bad; <= k * n_bad rows, so broadcast beats re-keying
                # the adjacency
                mirrored = (
                    cur.join(bad, "src", "left_semi")
                    .select(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    )
                )
                cur = data_checkpoint(
                    survivors.join(
                        F.broadcast(mirrored), ["src", "dst"], "left_anti"
                    )
                )
            else:
                cur = _keyed_checkpoint(
                    survivors.join(
                        bad.withColumnRenamed("src", "dst").hint(
                            "shuffle_hash"
                        ),
                        "dst",
                        "left_anti",
                    ),
                    "src",
                )
        # one final check: the last filter round may have converged
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        if deg.where(F.col("degree") < k).isEmpty():
            return deg.select(F.col("src").alias("id"), "degree")
        raise RuntimeError(
            f"kcore: peel did not converge within {max_rounds} rounds"
        )
