"""Relational operators of the engine (SURVEY.md §2) — batch formulations.

Each module declares its plan with the DataFrame API and lets Catalyst
pick the physical strategy; grouped-map Arrow UDFs appear only where the
semantics (per-window numpy regression) cannot be expressed relationally.
"""
