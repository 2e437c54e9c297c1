"""Scalar / array / window kernel library (SURVEY §2.c S1-S14).

Pure column-expression builders — no UDFs — so every kernel stays inside
whole-stage codegen and is visible to Catalyst for pushdown/pruning.
"""
