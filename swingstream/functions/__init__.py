"""Scalar function library (SURVEY.md §2.7) — JVM-side Column expressions.

Everything here returns pyspark Column expressions built from built-in
functions so they stay inside whole-stage codegen; Python appears only
in clearly-marked pandas_udf fallbacks.
"""
