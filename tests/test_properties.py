"""Property-based checks (hypothesis) + skew-path equivalence.

- SurfaceMatcher ≡ the regex oracle on arbitrary generated text, including
  punctuation, adjacency and substring-surface traps.
- build_hierarchy invariants hold and parents are the most specific proper
  subsumer for arbitrary intent multisets.
- salted_dim_join ≡ plain join under a hub-skewed key distribution.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from concept_hierarchy_formation_in_property_graphs_spark.functions.mentions import (
    SurfaceMatcher,
    compile_surface_regex,
)

SURFACES = (
    "Acme Corporation", "Acme Corp.", "Acme", "A. Smith", "Smith",
    "University of X", "X University", "Widget",
)

_words = st.sampled_from(
    ["Acme", "Corporation", "Corp.", "A.", "Smith", "University", "of", "X",
     "Widget", "zeta", "the", "and,", "x(y)", ""]
)
_line = st.lists(_words, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(_line)
def test_matcher_equals_regex_property(line):
    rx = compile_surface_regex(SURFACES)
    mt = SurfaceMatcher(SURFACES)
    got_rx = [(m.start(), m.end(), m.group(0)) for m in rx.finditer(line)]
    got_mt = list(mt.finditer(line))
    assert got_rx == got_mt, line


def _rand_instances(seed: int, n: int):
    rng = random.Random(seed)
    items = list("abcdef")
    return [
        (f"i{k}", sorted(rng.sample(items, rng.randint(0, 4))))
        for k in range(n)
    ]


def test_hierarchy_invariants_random_intents(spark):
    from concept_hierarchy_formation_in_property_graphs_spark.operators.concepts import (
        build_hierarchy,
        invariant_violations,
    )

    for seed in (1, 2, 3):
        rows = _rand_instances(seed, 40)
        df = spark.createDataFrame(rows, "instance_id string, intent array<string>")
        h = build_hierarchy(df, galois=(seed % 2 == 0))
        assert invariant_violations(h["concepts"], h["assignments"]) == {
            "dup_instance": 0, "assign_to_inner": 0, "orphans": 0,
            "partition_counts": 0,
        }, seed
        # parent is a PROPER subsumer with maximal size (ties by min cid)
        concepts = {r["concept_id"]: r for r in h["concepts"].collect()}
        real = {
            cid: set(r["intent"])
            for cid, r in concepts.items()
            if "\x1e" not in cid
        }
        for cid, intent in real.items():
            pid = concepts[cid]["parent_id"]
            if pid is None:
                continue
            pin = set(concepts[pid]["intent"])
            assert pin < intent, (seed, cid, pid)
            best = max(
                (len(o) for ocid, o in real.items() if o < intent),
                default=None,
            )
            assert len(pin) == best, (seed, cid, pid)


def test_salted_join_equals_plain_join(spark):
    from concept_hierarchy_formation_in_property_graphs_spark.operators.features import (
        salted_dim_join,
    )

    rng = random.Random(5)
    # hub-skew: 60% of fact rows hit one key
    fact = spark.createDataFrame(
        [("hub" if rng.random() < 0.6 else f"k{rng.randint(0, 20)}", i)
         for i in range(2000)],
        "key string, payload long",
    )
    dim = spark.createDataFrame(
        [(f"k{i}", i * 10) for i in range(21)] + [("hub", -1)],
        "key string, dimval long",
    )
    plain = sorted(map(tuple, fact.join(dim, "key").select("key", "payload", "dimval").collect()))
    salted = sorted(map(tuple, salted_dim_join(fact, dim, "key", n_salt=8)
                        .select("key", "payload", "dimval").collect()))
    assert plain == salted and len(plain) == 2000
