"""Batch DataFrame operators — the engine's correctness surface.

Each module re-expresses a slice of the reference's topology DSL (see
SURVEY.md §2 for the inventory) or one of the beyond-reference
training-data-pipeline capabilities, as declarative DataFrame plans
that Catalyst can optimize (pushdown, pruning, join selection,
whole-stage codegen).
"""
