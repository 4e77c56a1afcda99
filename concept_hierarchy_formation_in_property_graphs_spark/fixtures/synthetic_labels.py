"""Synthetic hierarchical-label fixture — the reference's core benchmark
corpus (`src/main/java/generator/SyntheticNodeGenerator.java:30-66`, sample
shown in `doc/thesis/05-evaluation.tex:28-44`).

Each record carries the stacked path labels of one leaf of a planted
width^depth taxonomy: node at leaf level ``depth`` has labels
``["l0", "l01", "l012", ...]`` (label j = "l" + digits of the path prefix).
Noise ops (remove / add / alter a label) use a seeded RNG, mirroring
`SyntheticNodeGenerator.java:92-139` (seed = limit + 42 at `:106`).

Ground truth is emitted both as parent-child edges (for edge-P/R scoring)
and as the reference's bracket-notation tree (for tree-edit-distance
tooling, `tree_edit_distance.py:53-124`).
"""

from __future__ import annotations

import itertools
import random


def _path_labels(path: tuple[int, ...]) -> list[str]:
    """["l0", "l01", ...] for a root-to-leaf digit path."""
    out = []
    acc = "l"
    for d in path:
        acc += str(d)
        out.append(acc)
    return out


def generate_labels(width: int, depth: int, iterations: int = 1,
                    noise: float = 0.0, seed: int | None = None):
    """Returns (records, truth_edges, bracket_tree).

    records: list of (id, labels list) — ``iterations`` copies of every
    leaf's label stack, with noise applied per record.
    truth_edges: set of (child_label, parent_label) pairs of the planted
    taxonomy ("l" is the root).
    bracket_tree: the ground-truth tree in bracket notation.
    """
    leaves = list(itertools.product(range(width), repeat=depth))
    n = len(leaves) * iterations
    rng = random.Random((seed if seed is not None else n + 42))
    alphabet = [f"l{''.join(map(str, p))}" for d in range(1, depth + 1)
                for p in itertools.product(range(width), repeat=d)]
    records = []
    for it in range(iterations):
        for idx, leaf in enumerate(leaves):
            labels = _path_labels(leaf)
            if noise > 0 and rng.random() < noise:
                op = rng.choice(("remove", "add", "alter"))
                if op == "remove" and labels:
                    labels.pop(rng.randrange(len(labels)))
                elif op == "add":
                    labels.append(rng.choice(alphabet))
                elif op == "alter" and labels:
                    labels[rng.randrange(len(labels))] = rng.choice(alphabet)
            records.append((it * len(leaves) + idx, labels))

    truth_edges = set()
    for d in range(1, depth + 1):
        for p in itertools.product(range(width), repeat=d):
            child = "l" + "".join(map(str, p))
            parent = "l" + "".join(map(str, p[:-1])) if d > 1 else "l"
            truth_edges.add((child, parent))

    def bracket(prefix: tuple[int, ...], d: int) -> str:
        name = "l" + "".join(map(str, prefix)) if prefix else "l"
        if d == depth:
            return "{" + name + "}"
        kids = "".join(bracket(prefix + (w,), d + 1) for w in range(width))
        return "{" + name + kids + "}"

    return records, truth_edges, bracket((), 0)


def labels_spark_df(spark, width: int, depth: int, iterations: int = 1,
                    noise: float = 0.0, seed: int | None = None):
    records, _, _ = generate_labels(width, depth, iterations, noise, seed)
    return spark.createDataFrame(
        [(i, labels) for i, labels in records], "id long, labels array<string>"
    )
