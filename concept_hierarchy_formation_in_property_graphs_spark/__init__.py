"""PySpark-native knowledge-graph construction + concept-hierarchy engine.

A from-scratch re-expression of the capabilities of
``SomeUserName1/concept_hierarchy_formation_in_property_graphs`` (reference at
/root/reference, read-only) as an idiomatic Spark DataFrame pipeline:

    pages -> text extraction -> triples -> entity linking/canonicalization
          -> property graph (nodes/edges) -> structural features
          -> FCA-style concept lattice -> labeled subsumption hierarchy

Everything relational runs through Catalyst (DataFrame/SQL); Python appears
only in vectorized pandas/Arrow UDFs (text extraction, mention detection).
"""

__version__ = "0.1.0"
