"""S5 — deterministic concept/subsumption hierarchy (the signature output).

The reference builds its tree with sequential hill-climbing Cobweb
(`algos/Cobweb.java:23-64`), which is order-dependent (it shuffles input,
`algos/PropertyGraphCobweb.java:315,347`) and single-threaded by its own
account (`doc/thesis/05-evaluation.tex:249`). Per SURVEY §7 this engine
keeps the reference's *concept model* — per-concept attribute/value
histograms with counts (`algos/ConceptNode.java:26-57`), one Gaussian per
numeric attribute merged Chan-style (`algos/NumericValue.java:56-70`), the
EAP with the 1/(7·(1+σ)) numeric rule and σ=0→0
(`algos/ConceptNode.java:214-242`), Fisher'87 CU
(`algos/Cobweb.java:259-272`), path labels (`util/TreeUtils.java:82-90`),
cutoff levels log2(depth)+1 (`util/MathUtils.java:20-25`) and all output
invariants (`PropertyGraphCobwebProcTest.java:122-199`) — while constructing
the hierarchy deterministically, FCA-style:

    concept  = distinct intent (e.g. characteristic set, F3)
    extent   = instances grouped under subset-subsumed intents
    parent   = most specific proper subsumer (ties → smallest id)
    root     = the empty intent ⊤

Instances attach only to LEAVES; a concept holding both exact-intent
instances and children gets a synthetic residual child leaf — the analogue
of Cobweb's "leaves stay leaves" intermediate-parent insertion
(`algos/Cobweb.java:113-160`).

Scale notes: #concepts = #distinct intents ≪ #instances. Subsumption
candidates are generated through each intent's globally RAREST item (not
all items), so hub items (head-entity skew) never drive the self-join
fan-out; verification is a codegen'd array_except. The per-level loops are
driver-driven but bounded by tree depth (≤ max intent size + 1), each
iteration localCheckpoint'ed to keep lineage O(1).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

SEP = "\x1f"
RESIDUAL_SUFFIX = "\x1e*"
ROOT_ID = ""  # the empty intent


def _canonical_intents(instances: DataFrame) -> DataFrame:
    """(instance_id, intent sorted-distinct, cid)"""
    return instances.select(
        "instance_id",
        F.array_sort(F.array_distinct("intent")).alias("intent"),
    ).withColumn("cid", F.concat_ws(SEP, "intent"))


def subsumption_pairs(intents: DataFrame) -> DataFrame:
    """intents(cid, intent, size) → (desc_cid, anc_cid, anc_size).

    anc ⊂ desc (proper). Candidates join on the ancestor's globally rarest
    item — each ancestor probes the index exactly once per occurrence of its
    rarest item, which bounds fan-out by the rarest-item frequency.
    """
    nonempty = intents.where(F.col("size") > 0)
    items = nonempty.select(
        "cid", "intent", "size", F.explode("intent").alias("item")
    )
    freq = items.groupBy("item").agg(F.count("*").alias("item_freq"))
    w = Window.partitionBy("cid").orderBy(F.asc("item_freq"), F.asc("item"))
    rare = (
        items.join(F.broadcast(freq), "item")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("cid").alias("anc_cid"),
            F.col("intent").alias("anc_intent"),
            F.col("size").alias("anc_size"),
            F.col("item").alias("rare_item"),
        )
    )
    desc_items = items.select(
        F.col("cid").alias("desc_cid"),
        F.col("intent").alias("desc_intent"),
        F.col("size").alias("desc_size"),
        F.col("item").alias("rare_item"),
    )
    return (
        rare.join(desc_items, "rare_item")
        .where(F.col("anc_size") < F.col("desc_size"))
        .where(F.size(F.array_except("anc_intent", "desc_intent")) == 0)
        .select("desc_cid", "anc_cid", "anc_size")
    )


def galois_close_intents(intents: DataFrame, max_rounds: int = 32,
                         max_item_freq: int = 0) -> DataFrame:
    """Close a distinct-intent table under pairwise intersection (the
    Galois/FCA concept closure — Godin et al., cited by the thesis as the
    principled construction, `doc/thesis/06-conclusions.tex:13`).

    Internal concepts of a planted taxonomy are exactly the intersections
    of observed leaf intents, so closure is what turns a flat exact-intent
    lattice into the full tree.

    Every closed set is an intersection of a subset of GENERATORS, and any
    such intersection is reachable one generator at a time — so each round
    intersects only the previous round's NEW sets against the (fixed,
    small) generator table, never known×known. Pair fan-out per round is
    O(|frontier|·|generators|) through shared items instead of the growing
    O(|closed|²); the fixpoint is identical (same set as the DuckDB
    recursive-CTE twin, `queries.py kg_galois_closure`). Candidates pair
    only through a shared item, so intersections are always nonempty; the
    tables are CONCEPT-sized (≪ instances) and localCheckpoint per round
    keeps lineage O(1). Rounds needed ≤ max intent size (each chain step
    strictly shrinks the set); a non-converged loop is logged.

    ``max_item_freq`` > 0 additionally drops items occurring in more than
    that many generators from PAIR GENERATION (not from the intents) — the
    hub-item guard for 100×-cardinality inputs. Pairs sharing any other
    item still form; only intersections reachable exclusively through hub
    items are lost, and the drop is logged. Default 0 = exact closure.

    intents: (cid, intent) distinct. Returns the closed (cid, intent) set.
    """
    gen = intents.select("cid", "intent").localCheckpoint(eager=True)
    gen_items = gen.select(
        F.col("cid").alias("g_cid"),
        F.col("intent").alias("g_intent"),
        F.explode("intent").alias("item"),
    )
    if max_item_freq > 0:
        hot = (
            gen_items.groupBy("item")
            .agg(F.count("*").alias("_f"))
            .where(F.col("_f") > max_item_freq)
            .select("item")
        )
        n_hot = hot.count()
        if n_hot:
            _log.warning(
                "galois_close_intents: excluding %d hub items "
                "(> %d generators) from pair generation",
                n_hot, max_item_freq,
            )
            gen_items = gen_items.join(F.broadcast(hot), "item", "left_anti")
    gen_items = gen_items.localCheckpoint(eager=True)

    known = gen
    frontier = gen
    converged = False
    for _ in range(max_rounds):
        f_items = frontier.select(
            "cid", "intent", F.explode("intent").alias("item")
        )
        cand = (
            f_items.join(gen_items, "item")
            .where(F.col("cid") != F.col("g_cid"))
            .select(
                F.array_sort(
                    F.array_intersect(F.col("intent"), F.col("g_intent"))
                ).alias("intent")
            )
            .dropDuplicates(["intent"])
            .withColumn("cid", F.concat_ws(SEP, "intent"))
            .select("cid", "intent")
        )
        new = cand.join(known.select("cid"), "cid", "left_anti").localCheckpoint(
            eager=True
        )
        if new.limit(1).count() == 0:
            converged = True
            break
        known = known.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    if not converged:
        _log.warning(
            "galois_close_intents: fixpoint not reached in %d rounds; "
            "closure may be partial", max_rounds,
        )
    return known


def build_hierarchy(instances: DataFrame, root_seed: str = "c",
                    max_depth: int = 64,
                    driver_threshold: int = 200_000,
                    galois: bool = False) -> dict[str, DataFrame]:
    """instances(instance_id, intent ARRAY<STRING>) → hierarchy tables.

    Returns dict with:
      concepts(concept_id, parent_id, depth, label, count, intent, is_leaf)
      assignments(instance_id, concept_id)   # leaf concepts only
      closure(desc, anc)                     # reflexive-transitive

    The heavy relational work (intent dedup, instance assignment) is
    distributed. The whole CONCEPT-side computation — Galois closure,
    subsumption, residual insertion, depth/label/closure/count — runs
    driver-side when the distinct-intent table is ≤ ``driver_threshold``
    rows: #concepts = #distinct intents, orders of magnitude below
    #instances even at corpus scale, and the driver pass costs ONE Spark
    job (scan + exact-intent aggregate + bounded collect) where the
    distributed path pays ~12 AQE stage launches of pure scheduling
    overhead on concept-sized data. Above the threshold the distributed
    path (subsumption self-join, level-by-level label sweep,
    localCheckpoint per round) takes over; the two branches are
    bit-identical (enforced by parity tests).
    """
    spark = instances.sparkSession
    inst = _canonical_intents(instances)
    exact = intent_state(instances)
    return _hierarchy_from_state(
        spark, exact, inst, root_seed, max_depth, driver_threshold, galois
    )


def intent_state(instances: DataFrame) -> DataFrame:
    """(cid, intent, n_exact, size) — the exact-intent concept STATE of an
    instance batch: the only thing hierarchy construction needs besides
    the instance→cid map. Concept-sized, mergeable (``merge_intent_state``),
    and the unit of incremental maintenance."""
    inst = _canonical_intents(instances)
    return (
        inst.groupBy("cid", "intent")
        .agg(F.count("*").alias("n_exact"))
        .withColumn("size", F.size("intent"))
    )


def merge_intent_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """Additive merge of two intent states — one concept-sized groupBy."""
    return (
        a.unionByName(b)
        .groupBy("cid")
        .agg(
            F.first("intent").alias("intent"),
            F.sum("n_exact").alias("n_exact"),
            F.max("size").alias("size"),
        )
        .select("cid", "intent", "n_exact", "size")
    )


def update_hierarchy(prev_state: DataFrame | None, new_instances: DataFrame,
                     prev_inst: DataFrame | None = None,
                     root_seed: str = "c", max_depth: int = 64,
                     driver_threshold: int = 200_000,
                     galois: bool = False) -> dict[str, DataFrame]:
    """Incremental hierarchy maintenance — the distributed, ORDER-FREE
    analogue of the reference's incremental Cobweb insertion (O3/O4/O5:
    create/merge/split, `algos/Cobweb.java:23-160`).

    The new batch contributes only its concept-sized intent-state delta;
    old INSTANCES are never rescanned (the reference's incremental claim,
    kept at 100 TB: each ingest touches new data + a concept-sized state
    table). Because the lattice construction is a pure function of the
    merged state, ``update_hierarchy(state(D1), D2)`` is BIT-IDENTICAL to
    ``build_hierarchy(D1 ∪ D2)`` — the order-effect the reference
    mitigates by shuffling (T8) cannot exist here. Test-enforced,
    including the leaf→inner transition where previously-assigned
    instances remap to a fresh residual leaf.

    ``prev_inst``: the previous instance→cid map (appendable, e.g. a
    parquet table) — needed only if ``assignments`` over OLD instances
    should be part of the result; pass None to get assignments for the
    new batch only. Returns the hierarchy dict plus ``state`` and
    ``inst`` (carry both into the next update).
    """
    spark = new_instances.sparkSession
    delta = intent_state(new_instances)
    state = delta if prev_state is None else merge_intent_state(prev_state, delta)
    inst_new = _canonical_intents(new_instances)
    inst = inst_new if prev_inst is None else prev_inst.unionByName(inst_new)
    out = _hierarchy_from_state(
        spark, state, inst, root_seed, max_depth, driver_threshold, galois
    )
    out["state"] = state
    out["inst"] = inst
    return out


def _hierarchy_from_state(spark, exact: DataFrame, inst: DataFrame,
                          root_seed: str, max_depth: int,
                          driver_threshold: int, galois: bool) -> dict[str, DataFrame]:
    # ONE fused job decides the branch AND feeds the driver pass: collect
    # at most threshold+1 concept rows — if we got ≤ threshold, that IS the
    # full exact-intent table (limit short-circuits the scan otherwise)
    probe = (
        exact.limit(driver_threshold + 1).collect()
        if driver_threshold > 0
        else None
    )
    if probe is not None and len(probe) <= driver_threshold:
        out = _hierarchy_driver(spark, inst, probe, root_seed, galois)
        if out is not None:
            return out
        _log.info(
            "build_hierarchy: driver fast path over budget "
            "(hub-item fan-out); using the distributed branch"
        )

    # lazy checkpoint: materialized by the first downstream job, then
    # reused — truncates lineage without a separate synchronous job
    exact = exact.localCheckpoint(eager=False)

    intents = exact.select("cid", "intent", "size", "n_exact")
    if galois:
        closed = galois_close_intents(exact.select("cid", "intent"))
        extra = (
            closed.join(exact.select("cid"), "cid", "left_anti")
            .select(
                "cid", "intent", F.size("intent").alias("size"),
                F.lit(0).cast("long").alias("n_exact"),
            )
        )
        intents = intents.unionByName(extra)
    # ensure the ⊤ root (empty intent) exists exactly once: union a zero-
    # count root row and merge — avoids a blocking existence-check job
    root_row = spark.createDataFrame(
        [(ROOT_ID, [], 0, 0)], "cid string, intent array<string>, size int, n_exact long"
    )
    intents = (
        intents.unionByName(root_row)
        .groupBy("cid")
        .agg(
            F.first("intent").alias("intent"),
            F.max("size").alias("size"),
            F.sum("n_exact").alias("n_exact"),
        )
        .select("cid", "intent", "size", "n_exact")
    )

    pairs = subsumption_pairs(intents)
    w = Window.partitionBy("desc_cid").orderBy(F.desc("anc_size"), F.asc("anc_cid"))
    best = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("desc_cid").alias("cid"), F.col("anc_cid").alias("parent_id"))
    )
    parents = (
        intents.join(best, "cid", "left")
        .select(
            "cid",
            "intent",
            "n_exact",
            F.when(F.col("cid") == ROOT_ID, F.lit(None).cast("string"))
            .otherwise(F.coalesce("parent_id", F.lit(ROOT_ID)))
            .alias("parent_id"),
        )
        # lazy: the subsumption join runs ONCE (materialized by the eager
        # residual-union checkpoint below) even though three downstream
        # branches reference it
        .localCheckpoint(eager=False)
    )

    # residual leaves: concept has children AND exact-intent instances
    inner_ids = parents.where(F.col("parent_id").isNotNull()).select(
        F.col("parent_id").alias("cid")
    ).distinct()
    needs_residual = parents.join(inner_ids, "cid").where(F.col("n_exact") > 0)
    residuals = needs_residual.select(
        F.concat(F.col("cid"), F.lit(RESIDUAL_SUFFIX)).alias("cid"),
        F.col("intent"),
        F.col("n_exact"),
        F.col("cid").alias("parent_id"),
    )
    parents = (
        parents.join(inner_ids.withColumn("_inner", F.lit(True)), "cid", "left")
        .select(
            "cid",
            "intent",
            F.when(F.col("_inner") & (F.col("n_exact") > 0), F.lit(0))
            .otherwise(F.col("n_exact"))
            .alias("n_exact"),
            "parent_id",
        )
        .unionByName(residuals)
        .localCheckpoint(eager=True)
    )

    # assignments: instance → exact-intent concept, remapped to residual
    # leaf; residual map is concept-sized (tiny) → broadcast, so the big
    # instance side never shuffles here
    res_map = F.broadcast(
        residuals.select(
            F.col("parent_id").alias("cid"), F.col("cid").alias("res_cid")
        )
    )
    assignments = (
        inst.join(res_map, "cid", "left")
        .select(
            "instance_id", F.coalesce("res_cid", "cid").alias("concept_id")
        )
    )

    # Prune zero-count subtrees BEFORE labeling, exactly as the driver pass
    # does (a concept survives iff some descendant-or-self has exact-intent
    # instances), so both branches yield identical concepts/labels/closure.
    # keep = exact-count concepts ∪ their ancestors ∪ roots, computed by
    # O(tree depth) parent hops over the concept-sized edge table. Only
    # Galois closure can introduce zero-count concepts, so skip otherwise.
    if galois:
        keep = parents.where(
            (F.col("n_exact") > 0) | F.col("parent_id").isNull()
        ).select("cid").localCheckpoint(eager=True)
        parent_edges = (
            parents.select("cid", "parent_id")
            .where(F.col("parent_id").isNotNull())
            .localCheckpoint(eager=True)
        )
        hop = keep
        for _ in range(max_depth):
            hop = (
                parent_edges.join(hop, "cid")
                .select(F.col("parent_id").alias("cid"))
                .distinct()
                .join(keep, "cid", "left_anti")
                .localCheckpoint(eager=True)
            )
            if hop.limit(1).count() == 0:
                break
            keep = keep.unionByName(hop).localCheckpoint(eager=True)
        parents = parents.join(keep, "cid").localCheckpoint(eager=True)

    # depth / path labels / ancestor paths in one level-by-level sweep (T3)
    frontier = (
        parents.where(F.col("parent_id").isNull())
        .select(
            "cid",
            F.lit(0).alias("depth"),
            F.lit(root_seed).alias("label"),
            F.array().cast("array<string>").alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    child_rank_w = Window.partitionBy("parent_id").orderBy("cid")
    for _ in range(max_depth):
        kids = (
            parents.join(
                frontier.select(
                    F.col("cid").alias("parent_id"),
                    F.col("depth").alias("p_depth"),
                    F.col("label").alias("p_label"),
                    F.col("path").alias("p_path"),
                ),
                "parent_id",
            )
            .withColumn("rank", F.row_number().over(child_rank_w) - 1)
            .select(
                "cid",
                (F.col("p_depth") + 1).alias("depth"),
                F.concat(F.col("p_label"), F.col("rank").cast("string")).alias("label"),
                F.concat(F.col("p_path"), F.array(F.col("parent_id"))).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        if kids.limit(1).count() == 0:
            break
        levels.append(kids)
        frontier = kids

    labeled = levels[0]
    for lv in levels[1:]:
        labeled = labeled.unionByName(lv)
    labeled = labeled.localCheckpoint(eager=True)

    closure = labeled.select(
        F.col("cid").alias("desc"), F.col("cid").alias("anc")
    ).union(
        labeled.select(F.col("cid").alias("desc"), F.explode("path").alias("anc"))
    )

    # subtree counts: leaf exact counts rolled up through the closure
    leaf_counts = parents.where(F.col("n_exact") > 0).select(
        F.col("cid").alias("desc"), "n_exact"
    )
    counts = (
        closure.join(leaf_counts, "desc")
        .groupBy(F.col("anc").alias("cid"))
        .agg(F.sum("n_exact").alias("count"))
    )

    has_kids = parents.where(F.col("parent_id").isNotNull()).select(
        F.col("parent_id").alias("cid")
    ).distinct().withColumn("_haskids", F.lit(True))

    concepts = (
        labeled.join(parents.select("cid", "intent", "parent_id"), "cid")
        .join(counts, "cid", "left")
        .join(has_kids, "cid", "left")
        .select(
            F.col("cid").alias("concept_id"),
            "parent_id",
            "depth",
            "label",
            F.coalesce("count", F.lit(0)).alias("count"),
            "intent",
            F.coalesce(~F.col("_haskids"), F.lit(True)).alias("is_leaf"),
        )
    )
    return {"concepts": concepts, "assignments": assignments, "closure": closure}


# Candidate-probe budget for the pure-Python subsumption pass: the exact
# work is Σ_item |rarest-registered(item)| · freq(item), computable BEFORE
# doing it. Above this, Python would crawl (hub items on small alphabets
# make the pass quadratic) — bail to the distributed branch, which spreads
# the same fan-out across executors. ~20M set-ops ≈ a few seconds driver-side.
DRIVER_SUBSUMPTION_BUDGET = 20_000_000
# Galois closure driver cap: bail if the closed set grows past this.
DRIVER_CLOSURE_CAP = 250_000


def _hierarchy_driver(spark, inst: DataFrame, exact_rows, root_seed: str,
                      galois: bool):
    """Concept-side computation on the collected exact-intent table —
    byte-identical semantics to the distributed path (see the parity tests
    in tests/test_concepts.py), at the cost of ONE already-paid Spark job.
    Returns None when the estimated Python work exceeds the budget
    (caller falls back to the distributed branch, same results).

    Pure-Python mirrors of the distributed steps:
      * Galois closure: frontier×generators intersection fixpoint
        (= ``galois_close_intents``)
      * parent: most specific proper subsumer, ties → smallest cid,
        candidates through each ancestor's globally rarest item
        (= ``subsumption_pairs`` + the best-parent window)
      * residual leaves, zero-count pruning, labels/depth/closure/counts
        via ``_tree_metadata_driver``
    Only ``assignments`` stays distributed: instance → concept with the
    (tiny, broadcast) residual remap.
    """
    intent_of: dict[str, tuple] = {}
    n_exact: dict[str, int] = {}
    for r in exact_rows:
        cid = r["cid"]
        intent_of[cid] = tuple(r["intent"])
        n_exact[cid] = n_exact.get(cid, 0) + int(r["n_exact"])

    if galois:
        gens = {frozenset(v) for v in intent_of.values() if v}
        closed = {frozenset(v) for v in intent_of.values()}
        frontier = closed
        while frontier:
            new = set()
            for f in frontier:
                for g in gens:
                    x = f & g
                    if x and x not in closed:
                        new.add(x)
            closed |= new
            if len(closed) > DRIVER_CLOSURE_CAP:
                return None
            frontier = new
        for s in closed:
            t = tuple(sorted(s))
            cid = SEP.join(t)
            if cid not in intent_of:
                intent_of[cid] = t
                n_exact[cid] = 0

    if ROOT_ID not in intent_of:
        intent_of[ROOT_ID] = ()
        n_exact.setdefault(ROOT_ID, 0)

    # most specific proper subsumer via rarest-item candidate probing
    freq: dict[str, int] = {}
    for t in intent_of.values():
        for item in t:
            freq[item] = freq.get(item, 0) + 1
    by_rare: dict[str, list[str]] = {}
    for cid, t in intent_of.items():
        if t:
            rare = min(t, key=lambda i: (freq[i], i))
            by_rare.setdefault(rare, []).append(cid)
    est_work = sum(len(v) * freq[i] for i, v in by_rare.items())
    if est_work > DRIVER_SUBSUMPTION_BUDGET:
        return None
    parent: dict[str, str | None] = {}
    for cid, t in intent_of.items():
        if cid == ROOT_ID:
            parent[cid] = None
            continue
        mine = set(t)
        best: tuple[int, str] | None = None
        for item in t:
            for anc in by_rare.get(item, ()):
                ta = intent_of[anc]
                if len(ta) < len(t) and set(ta) <= mine:
                    key = (-len(ta), anc)
                    if best is None or key < best:
                        best = key
        parent[cid] = best[1] if best is not None else ROOT_ID

    # residual leaves: concept has children AND exact-intent instances
    inner = {p for p in parent.values() if p is not None}
    res_pairs: list[tuple[str, str]] = []
    for cid in [c for c in intent_of if c in inner and n_exact.get(c, 0) > 0]:
        rcid = cid + RESIDUAL_SUFFIX
        intent_of[rcid] = intent_of[cid]
        n_exact[rcid] = n_exact[cid]
        n_exact[cid] = 0
        parent[rcid] = cid
        res_pairs.append((cid, rcid))

    rows = [
        {"cid": c, "intent": list(intent_of[c]), "n_exact": n_exact[c],
         "parent_id": parent[c]}
        for c in intent_of
    ]
    concepts, closure = _tree_metadata_driver(spark, rows, root_seed)

    if res_pairs:
        res_map = F.broadcast(
            spark.createDataFrame(res_pairs, "cid string, res_cid string")
        )
        assignments = inst.join(res_map, "cid", "left").select(
            "instance_id", F.coalesce("res_cid", "cid").alias("concept_id")
        )
    else:
        assignments = inst.select(
            "instance_id", F.col("cid").alias("concept_id")
        )
    return {"concepts": concepts, "assignments": assignments, "closure": closure}


def _tree_metadata_driver(spark, rows, root_seed: str):
    """Depth/label/closure/count pass on the collected concept table.

    Pure-Python BFS over the (small) concept adjacency — the same labeling
    rule as T3 (`util/TreeUtils.java:82-90`): child rank = ascending cid,
    label = parent label + rank. ``rows`` is the already-collected parents
    table (cid, intent, n_exact, parent_id). Returns (concepts, closure)
    DataFrames.
    """
    info = {r["cid"]: (r["intent"], r["n_exact"], r["parent_id"]) for r in rows}
    children: dict[str, list[str]] = {}
    roots = []
    for cid, (_, _, pid) in info.items():
        if pid is None:
            roots.append(cid)
        else:
            children.setdefault(pid, []).append(cid)

    # subtree counts first (post-order), so instance-free subtrees —
    # possible when Galois closure adds concepts nothing maps through —
    # can be pruned before labeling
    count: dict[str, int] = {}

    def _subtree_count(start: str) -> None:
        order = []
        stack = [start]
        while stack:
            cid = stack.pop()
            order.append(cid)
            stack.extend(children.get(cid, ()))
        for cid in reversed(order):
            count[cid] = info[cid][1] + sum(
                count[k] for k in children.get(cid, ())
            )

    for r in roots:
        _subtree_count(r)
    pruned = {cid for cid in info if count[cid] == 0 and cid not in roots}
    if pruned:
        info = {c: v for c, v in info.items() if c not in pruned}
        children = {
            c: [k for k in kids if k not in pruned]
            for c, kids in children.items()
            if c not in pruned
        }

    depth: dict[str, int] = {}
    label: dict[str, str] = {}
    anc_path: dict[str, list[str]] = {}
    stack = [(r, 0, root_seed, []) for r in sorted(roots)]
    while stack:
        cid, d, lbl, path = stack.pop()
        depth[cid] = d
        label[cid] = lbl
        anc_path[cid] = path
        for rank, kid in enumerate(sorted(children.get(cid, ()))):
            stack.append((kid, d + 1, lbl + str(rank), path + [cid]))
    concepts = spark.createDataFrame(
        [
            (
                cid,
                info[cid][2],
                depth[cid],
                label[cid],
                count[cid],
                list(info[cid][0]),
                not children.get(cid),
            )
            for cid in info
        ],
        "concept_id string, parent_id string, depth int, label string, "
        "count long, intent array<string>, is_leaf boolean",
    )
    closure = spark.createDataFrame(
        [(cid, a) for cid in info for a in [cid, *anc_path[cid]]],
        "desc string, anc string",
    )
    return concepts, closure


# ---------------------------------------------------------------------------
# probabilistic concept descriptions: histograms, EAP (O7), CU (O6)
# ---------------------------------------------------------------------------


def concept_stats(attrs: DataFrame, assignments: DataFrame,
                  closure: DataFrame) -> DataFrame:
    """Long-form per-concept attribute histograms / Gaussians.

    attrs(instance_id, attr, kind, nom_value, num_value) joined through
    assignments and the closure — the distributed analogue of updateCounts
    (`algos/ConceptNode.java:159-207`): merging histograms up the tree IS
    Spark's partial+final hash aggregation; the Gaussian merge is Catalyst's
    CentralMomentAgg (same Chan formula as `algos/NumericValue.java:56-70`,
    population std per its sqrt(m2/totalCount)).

    Returns (concept_id, attr, kind, nom_value, cnt, num_count, num_mean,
    num_std).
    """
    routed = attrs.join(assignments, "instance_id").join(
        closure, F.col("concept_id") == F.col("desc")
    ).select(F.col("anc").alias("cid"), "attr", "kind", "nom_value", "num_value")
    noms = (
        routed.where(F.col("kind") == "nom")
        .groupBy("cid", "attr", "nom_value")
        .agg(F.count("*").alias("cnt"))
        .select(
            "cid", "attr", F.lit("nom").alias("kind"), "nom_value", "cnt",
            F.lit(None).cast("long").alias("num_count"),
            F.lit(None).cast("double").alias("num_mean"),
            F.lit(None).cast("double").alias("num_std"),
        )
    )
    nums = (
        routed.where(F.col("kind") == "num")
        .groupBy("cid", "attr")
        .agg(
            F.count("num_value").alias("num_count"),
            F.avg("num_value").alias("num_mean"),
            F.stddev_pop("num_value").alias("num_std"),
        )
        .select(
            "cid", "attr", F.lit("num").alias("kind"),
            F.lit(None).cast("string").alias("nom_value"),
            F.lit(None).cast("long").alias("cnt"),
            "num_count", "num_mean", "num_std",
        )
    )
    return noms.unionByName(nums).withColumnRenamed("cid", "concept_id")


def expected_attribute_prediction(stats: DataFrame, counts: DataFrame) -> DataFrame:
    """O7 — EAP per concept (`algos/ConceptNode.java:214-242`).

    nominal value: (cnt/total)²  summed over values
    numeric attr:  0 if σ=0 else 1/(7·(1+σ))   (7 = 4√π folded in,
                   `ConceptNode.java:231-233`)
    normalized by the number of attributes; 0 attributes → EAP 0.

    counts: (concept_id, count) — the concept's instance count (= the
    reference's ConceptNode.count, the EAP denominator `total`).
    """
    contrib = (
        stats.join(counts, "concept_id")
        .withColumn(
            "c",
            F.when(
                F.col("kind") == "nom",
                F.pow(F.col("cnt") / F.col("count"), F.lit(2.0)),
            ).otherwise(
                F.when(
                    F.coalesce(F.col("num_std"), F.lit(0.0)) == 0.0, F.lit(0.0)
                ).otherwise(1.0 / (7.0 * (1.0 + F.col("num_std"))))
            ),
        )
    )
    return contrib.groupBy("concept_id").agg(
        (F.sum("c") / F.countDistinct("attr")).alias("eap")
    )


def category_utility(concepts: DataFrame, eap: DataFrame) -> DataFrame:
    """O6 — Fisher'87 CU per parent (`algos/Cobweb.java:259-272`):

        CU(p) = Σ_k  count(C_k)/count(p) · (EAP(C_k) − EAP(p))  / |children|
    """
    child = (
        concepts.where(F.col("parent_id").isNotNull())
        .select("concept_id", "parent_id", F.col("count").alias("c_count"))
        .join(eap, "concept_id")
        .withColumnRenamed("eap", "c_eap")
    )
    parent = concepts.select(
        F.col("concept_id").alias("parent_id"), F.col("count").alias("p_count")
    ).join(
        eap.select(F.col("concept_id").alias("parent_id"), F.col("eap").alias("p_eap")),
        "parent_id",
    )
    return (
        child.join(parent, "parent_id")
        .groupBy(F.col("parent_id").alias("concept_id"))
        .agg(
            (
                F.sum(F.col("c_count") / F.col("p_count") * (F.col("c_eap") - F.col("p_eap")))
                / F.count("*")
            ).alias("cu")
        )
    )


def cluster_representatives(members: DataFrame, cluster_col: str,
                            items_col: str) -> DataFrame:
    """P5 two-step estimator representative (`clustering_survey.py:133-148`):
    collapse each cluster to the AND-intersection of its members' item sets
    — an item survives iff it appears in EVERY member. One explode + one
    count-match aggregate; no pairwise work."""
    sized = members.select(
        F.col(cluster_col).alias("cluster"),
        F.array_distinct(F.col(items_col)).alias("items"),
    )
    n = sized.groupBy("cluster").agg(F.count("*").alias("_n"))
    per_item = (
        sized.select("cluster", F.explode("items").alias("item"))
        .groupBy("cluster", "item")
        .agg(F.count("*").alias("_k"))
    )
    kept = per_item.join(F.broadcast(n), "cluster").where(F.col("_k") == F.col("_n"))
    return (
        n.select("cluster")
        .join(
            kept.groupBy("cluster").agg(
                F.array_sort(F.collect_list("item")).alias("representative")
            ),
            "cluster",
            "left",
        )
        .select(
            "cluster",
            F.coalesce("representative", F.array().cast("array<string>")).alias(
                "representative"
            ),
        )
    )


def cutoff_level(concepts: DataFrame) -> int:
    """log2(deepest)+1 with the reference's integer log2 (T7:
    `util/MathUtils.java:20-25`, −1 at 0)."""
    deepest = concepts.agg(F.max("depth")).first()[0] or 0
    return (deepest.bit_length() - 1 if deepest > 0 else -1) + 1


def cutoff_labels(concepts: DataFrame, level: int) -> DataFrame:
    """T4 getCutoffLabel — label prefix of `level` characters
    (`algos/ConceptNode.java:361-366`)."""
    return concepts.select(
        "concept_id",
        F.when(F.length("label") < level, F.col("label"))
        .otherwise(F.substring("label", 1, level))
        .alias("cutoff_label"),
    )


# ---------------------------------------------------------------------------
# output invariants (PropertyGraphCobwebProcTest.java:122-199)
# ---------------------------------------------------------------------------


def invariant_violations(concepts: DataFrame, assignments: DataFrame) -> dict[str, int]:
    """Returns violation counts; all must be 0 (see tests)."""
    leaves = concepts.where(F.col("is_leaf"))
    out: dict[str, int] = {}
    # checkIds L142-151: no instance assigned twice
    out["dup_instance"] = (
        assignments.groupBy("instance_id").count().where(F.col("count") > 1).count()
    )
    # checkLeafType L158-167: assignments reference leaves only
    out["assign_to_inner"] = (
        assignments.join(
            concepts.where(~F.col("is_leaf")).select(F.col("concept_id")), "concept_id"
        ).count()
    )
    # checkParent L174-181
    out["orphans"] = concepts.where(
        F.col("parent_id").isNull() & (F.col("depth") != 0)
    ).count()
    # checkPartitionCounts L188-199: parent count == Σ child counts
    child_sums = (
        concepts.where(F.col("parent_id").isNotNull())
        .groupBy(F.col("parent_id").alias("concept_id"))
        .agg(F.sum("count").alias("child_sum"))
    )
    out["partition_counts"] = (
        concepts.join(child_sums, "concept_id")
        .where(F.col("count") != F.col("child_sum"))
        .count()
    )
    return out
