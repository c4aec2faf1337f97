"""Vectorized scalar kernels (JVM Column expressions + pandas UDFs).

Everything here is either a pure ``pyspark.sql.functions`` Column
expression (whole-stage-codegen'd, zero Python) or an Arrow-batched
pandas UDF. There is deliberately no row-at-a-time Python anywhere
(BASELINE.json input_hint requirement).
"""
