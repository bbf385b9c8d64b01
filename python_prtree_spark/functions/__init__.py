"""Vectorized scalar-function layer: tiling, geometry predicates, codecs,
text analysis, similarity. Everything here is either a pure Spark column
expression (JVM-side, whole-stage-codegen) or a numpy kernel used inside
Arrow UDFs — never per-row Python."""
