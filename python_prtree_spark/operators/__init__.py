"""Distributed operators: build, probe (batch_query), pairs
(query_intersections), kNN, point-in-polygon, mutation, dedup, ANN,
multimodal, text. Each reproduces the semantics of the matching reference
operator in SURVEY.md §2 — Spark-first, not a port."""
