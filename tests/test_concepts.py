"""Concept-hierarchy semantics: lattice shape, labels, counts, invariants,
EAP/CU math — the reference's tree-invariant suite
(`PropertyGraphCobwebProcTest.java:122-199`) plus the quirky numeric rules
(`algos/ConceptNode.java:214-242`, `util/MathUtils.java:20-25`)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from concept_hierarchy_formation_in_property_graphs_spark.operators.concepts import (
    RESIDUAL_SUFFIX,
    SEP,
    build_hierarchy,
    category_utility,
    concept_stats,
    cutoff_labels,
    cutoff_level,
    expected_attribute_prediction,
    invariant_violations,
    subsumption_pairs,
)


def _instances(spark, rows):
    return spark.createDataFrame(rows, "instance_id string, intent array<string>")


def test_hierarchy_structure_and_labels(spark):
    h = build_hierarchy(
        _instances(
            spark,
            [
                ("i1", ["a"]),
                ("i2", ["a", "b"]),
                ("i3", ["b", "a"]),  # order-insensitive
                ("i4", ["a", "c"]),
                ("i5", []),
            ],
        )
    )
    concepts = {r["concept_id"]: r.asDict() for r in h["concepts"].collect()}
    ab = "a" + SEP + "b"
    ac = "a" + SEP + "c"
    res_root = "" + RESIDUAL_SUFFIX
    res_a = "a" + RESIDUAL_SUFFIX
    assert set(concepts) == {"", "a", ab, ac, res_root, res_a}
    # parents: most specific proper subsumer
    assert concepts["a"]["parent_id"] == ""
    assert concepts[ab]["parent_id"] == "a"
    assert concepts[ac]["parent_id"] == "a"
    assert concepts[res_a]["parent_id"] == "a"
    assert concepts[res_root]["parent_id"] == ""
    # counts roll up: parent count = sum of children counts
    assert concepts[""]["count"] == 5
    assert concepts["a"]["count"] == 4
    assert concepts[ab]["count"] == 2
    assert concepts[ac]["count"] == 1
    assert concepts[res_a]["count"] == 1
    assert concepts[res_root]["count"] == 1
    # depths
    assert concepts[""]["depth"] == 0
    assert concepts["a"]["depth"] == 1
    assert concepts[ab]["depth"] == 2
    # path labels (T3, `util/TreeUtils.java:82-90`): seed 'c', child rank by cid
    assert concepts[""]["label"] == "c"
    assert concepts[res_root]["label"] == "c0"  # \x1e sorts before 'a'
    assert concepts["a"]["label"] == "c1"
    assert concepts[res_a]["label"] == "c10"
    assert concepts[ab]["label"] == "c11"
    assert concepts[ac]["label"] == "c12"
    # leaves/inner
    assert not concepts[""]["is_leaf"] and not concepts["a"]["is_leaf"]
    assert all(concepts[c]["is_leaf"] for c in (ab, ac, res_root, res_a))
    # assignments: leaves only, residual remap
    assign = {r["instance_id"]: r["concept_id"] for r in h["assignments"].collect()}
    assert assign == {"i1": res_a, "i2": ab, "i3": ab, "i4": ac, "i5": res_root}
    # reference invariant suite
    assert invariant_violations(h["concepts"], h["assignments"]) == {
        "dup_instance": 0,
        "assign_to_inner": 0,
        "orphans": 0,
        "partition_counts": 0,
    }


def test_subsumption_pairs_matches_bruteforce(spark):
    rng = random.Random(11)
    universe = list("abcdefgh")
    intents = []
    seen = set()
    for _ in range(40):
        s = tuple(sorted(rng.sample(universe, rng.randint(1, 5))))
        if s not in seen:
            seen.add(s)
            intents.append(s)
    df = spark.createDataFrame(
        [(SEP.join(s), list(s), len(s)) for s in intents],
        "cid string, intent array<string>, size int",
    )
    got = {
        (r["desc_cid"], r["anc_cid"]) for r in subsumption_pairs(df).collect()
    }
    exp = {
        (SEP.join(d), SEP.join(a))
        for d in intents
        for a in intents
        if len(a) < len(d) and set(a) <= set(d)
    }
    assert got == exp


def test_cutoff_level_log2_rule(spark):
    # log2(deepest)+1 with integer log2 and log2(0) = -1 (MathUtils.java:20-25)
    root_only = _instances(spark, [("i", [])])
    assert cutoff_level(build_hierarchy(root_only)["concepts"]) == 0
    h = build_hierarchy(
        _instances(spark, [("1", ["a"]), ("2", ["a", "b"]), ("3", ["a", "b", "c"])])
    )
    # depths 0..3; log2(3)=1 -> cutoff 2
    assert cutoff_level(h["concepts"]) == 2
    labels = {
        r["concept_id"]: r["cutoff_label"]
        for r in cutoff_labels(h["concepts"], 2).collect()
    }
    assert all(len(v) <= 2 for v in labels.values())


def test_eap_numeric_rule_and_histograms(spark):
    # two concepts: X (values 1,1 -> sigma 0 -> numeric contributes 0)
    #               Y (values 1,3 -> sigma 1 -> 1/(7*(1+1)) = 1/14)
    attrs = spark.createDataFrame(
        [
            ("a1", "color", "nom", "red", None),
            ("a1", "size", "num", None, 1.0),
            ("a2", "color", "nom", "red", None),
            ("a2", "size", "num", None, 1.0),
            ("b1", "color", "nom", "red", None),
            ("b1", "size", "num", None, 1.0),
            ("b2", "color", "nom", "blue", None),
            ("b2", "size", "num", None, 3.0),
        ],
        "instance_id string, attr string, kind string, nom_value string, num_value double",
    )
    assignments = spark.createDataFrame(
        [("a1", "X"), ("a2", "X"), ("b1", "Y"), ("b2", "Y")],
        "instance_id string, concept_id string",
    )
    closure = spark.createDataFrame(
        [("X", "X"), ("Y", "Y")], "desc string, anc string"
    )
    stats = concept_stats(attrs, assignments, closure)
    # histogram merge semantics (updateCounts, ConceptNode.java:159-207):
    # X.color has one row red cnt 2; Y.color two rows cnt 1 each
    rows = {
        (r["concept_id"], r["attr"], r["nom_value"]): r["cnt"]
        for r in stats.where("kind = 'nom'").collect()
    }
    assert rows == {
        ("X", "color", "red"): 2,
        ("Y", "color", "red"): 1,
        ("Y", "color", "blue"): 1,
    }
    counts = assignments.groupBy("concept_id").agg(F.count("*").alias("count"))
    eap = {r["concept_id"]: r["eap"] for r in expected_attribute_prediction(stats, counts).collect()}
    # X: nominal (2/2)^2 = 1; numeric sigma=0 -> 0; /2 attrs = 0.5
    assert math.isclose(eap["X"], 0.5, abs_tol=1e-12)
    # Y: nominal (1/2)^2+(1/2)^2 = .5 ; numeric 1/(7*2)=1/14 ; /2
    assert math.isclose(eap["Y"], (0.5 + 1.0 / 14.0) / 2.0, abs_tol=1e-12)


def test_category_utility_formula(spark):
    concepts = spark.createDataFrame(
        [("root", None, 4), ("X", "root", 2), ("Y", "root", 2)],
        "concept_id string, parent_id string, count long",
    )
    eap = spark.createDataFrame(
        [("root", 0.3), ("X", 0.5), ("Y", 0.4)], "concept_id string, eap double"
    )
    cu = {r["concept_id"]: r["cu"] for r in category_utility(concepts, eap).collect()}
    # (2/4*(0.5-0.3) + 2/4*(0.4-0.3)) / 2 children = 0.075
    assert math.isclose(cu["root"], 0.075, abs_tol=1e-12)


def test_hierarchy_deterministic_across_partitionings(spark):
    rows = [
        (f"i{k}", sorted({random.Random(k).choice("abcd") for _ in range(3)}))
        for k in range(60)
    ]
    a = build_hierarchy(_instances(spark, rows).repartition(2))
    b = build_hierarchy(_instances(spark, rows).repartition(13))
    ca = sorted(map(tuple, a["concepts"].drop("intent").collect()))
    cb = sorted(map(tuple, b["concepts"].drop("intent").collect()))
    assert ca == cb
    assert sorted(map(tuple, a["assignments"].collect())) == sorted(
        map(tuple, b["assignments"].collect())
    )


def test_driver_vs_distributed_branch_parity_galois(spark):
    """The ≤/> driver_threshold branches must agree bit-for-bit — including
    pruning of zero-count Galois-added subtrees (the diamond {a,d} below is
    closure-added but ends up childless and instance-free, so BOTH branches
    must drop it) and the sibling label ranks that shift when it vanishes."""
    rows = [
        ("i1", ["a", "b", "c"]),
        ("i2", ["a", "b", "d"]),
        ("i3", ["a", "c", "d"]),
        ("i4", ["a", "b"]),
    ]
    drv = build_hierarchy(_instances(spark, rows), galois=True)
    dist = build_hierarchy(_instances(spark, rows), galois=True, driver_threshold=0)

    ad = "a" + SEP + "d"
    drv_ids = {r["concept_id"] for r in drv["concepts"].collect()}
    assert ad not in drv_ids  # the zero-count diamond concept is pruned

    for key in ("concepts", "assignments", "closure"):
        a = sorted(map(tuple, drv[key].collect()))
        b = sorted(map(tuple, dist[key].collect()))
        assert a == b, f"branch divergence in {key}"
    assert invariant_violations(dist["concepts"], dist["assignments"]) == {
        "dup_instance": 0,
        "assign_to_inner": 0,
        "orphans": 0,
        "partition_counts": 0,
    }


def test_driver_vs_distributed_branch_parity_random(spark):
    rows = [
        (f"i{k}", sorted({random.Random(1000 + k).choice("abcdef") for _ in range(4)}))
        for k in range(80)
    ]
    drv = build_hierarchy(_instances(spark, rows), galois=True)
    dist = build_hierarchy(_instances(spark, rows), galois=True, driver_threshold=0)
    for key in ("concepts", "assignments", "closure"):
        a = sorted(map(tuple, drv[key].collect()))
        b = sorted(map(tuple, dist[key].collect()))
        assert a == b, f"branch divergence in {key}"


def test_galois_closure_equals_bruteforce_at_10x(spark):
    """Generator-only intersection must reach the SAME fixpoint as the
    known×known definition — validated against a brute-force Python closure
    on a 10×-cardinality intent table (300 draws over a 12-item alphabet),
    inside the normal test budget."""
    from concept_hierarchy_formation_in_property_graphs_spark.operators.concepts import (
        galois_close_intents,
    )

    rnd = random.Random(7)
    distinct = sorted({
        tuple(sorted({rnd.choice("abcdefghijkl") for _ in range(5)}))
        for _ in range(300)
    })
    df = _instances(
        spark, [(SEP.join(t), list(t)) for t in distinct]
    ).withColumnRenamed("instance_id", "cid")
    got = {tuple(r["intent"]) for r in galois_close_intents(df).collect()}

    closed = {frozenset(t) for t in distinct}
    while True:
        new = {a & b for a in closed for b in closed if a & b} - closed
        if not new:
            break
        closed |= new
    want = {tuple(sorted(s)) for s in closed}
    assert got == want


def test_incremental_update_equals_batch_rebuild(spark):
    """The reference's core USP (incremental insertion) without its order
    dependence: update_hierarchy(state(D1), D2) must be BIT-IDENTICAL to
    build_hierarchy(D1 ∪ D2) — including the leaf→inner transition where
    i1's concept {a} gains a child {a,b} and i1 remaps to the fresh
    residual leaf."""
    from concept_hierarchy_formation_in_property_graphs_spark.operators.concepts import (
        update_hierarchy,
    )

    d1 = [("i1", ["a"]), ("i2", ["b", "c"]), ("i3", ["a"])]
    d2 = [("i4", ["a", "b"]), ("i5", ["b", "c"]), ("i6", ["b"])]

    out1 = update_hierarchy(None, _instances(spark, d1), galois=True)
    out2 = update_hierarchy(
        out1["state"], _instances(spark, d2), prev_inst=out1["inst"], galois=True
    )
    batch = build_hierarchy(_instances(spark, d1 + d2), galois=True)

    for key in ("concepts", "assignments", "closure"):
        inc = sorted(map(tuple, out2[key].collect()))
        full = sorted(map(tuple, batch[key].collect()))
        assert inc == full, f"incremental != batch in {key}"

    # the leaf→inner remap happened: i1/i3 now live under the residual of 'a'
    assign = {r["instance_id"]: r["concept_id"] for r in out2["assignments"].collect()}
    assert assign["i1"] == "a" + RESIDUAL_SUFFIX
    assert assign["i4"] == "a" + SEP + "b"


def test_incremental_update_order_free(spark):
    """Batch arrival order must not matter (the order effect the reference
    mitigates by shuffling, T8 — impossible here by construction)."""
    from concept_hierarchy_formation_in_property_graphs_spark.operators.concepts import (
        update_hierarchy,
    )

    rows = [
        (f"i{k}", sorted({random.Random(500 + k).choice("abcde") for _ in range(3)}))
        for k in range(40)
    ]
    a, b = rows[:20], rows[20:]

    ab1 = update_hierarchy(None, _instances(spark, a), galois=True)
    ab = update_hierarchy(ab1["state"], _instances(spark, b),
                          prev_inst=ab1["inst"], galois=True)
    ba1 = update_hierarchy(None, _instances(spark, b), galois=True)
    ba = update_hierarchy(ba1["state"], _instances(spark, a),
                          prev_inst=ba1["inst"], galois=True)
    for key in ("concepts", "assignments", "closure"):
        assert sorted(map(tuple, ab[key].collect())) == sorted(
            map(tuple, ba[key].collect())
        ), f"order dependence in {key}"


def test_empty_inputs_degenerate_gracefully(spark):
    """Empty instance table → root-only hierarchy, empty assignments; the
    degenerate inputs a scheduled production run will eventually see."""
    empty = _instances(spark, [])
    h = build_hierarchy(empty, galois=True)
    rows = h["concepts"].collect()
    assert [r["concept_id"] for r in rows] == [""]
    assert rows[0]["label"] == "c" and rows[0]["count"] == 0 and rows[0]["is_leaf"]
    assert h["assignments"].count() == 0


def test_driver_budget_guard_falls_back_to_distributed(spark, monkeypatch):
    """When the estimated Python subsumption work exceeds the budget, the
    driver fast path must bail and the distributed branch must produce the
    identical hierarchy (hub-item fan-out safety)."""
    from concept_hierarchy_formation_in_property_graphs_spark.operators import (
        concepts as C,
    )

    rows = [
        (f"i{k}", sorted({random.Random(40 + k).choice("abc") for _ in range(2)}))
        for k in range(50)
    ]
    normal = build_hierarchy(_instances(spark, rows), galois=True)
    monkeypatch.setattr(C, "DRIVER_SUBSUMPTION_BUDGET", 1)
    forced = build_hierarchy(_instances(spark, rows), galois=True)
    for key in ("concepts", "assignments", "closure"):
        assert sorted(map(tuple, normal[key].collect())) == sorted(
            map(tuple, forced[key].collect())
        ), key
