"""GAIT-Spark: a from-scratch PySpark-native spatial-join + tiling + integrity engine.

Re-expresses the validation semantics of the reference
``bradh/Geospatial-Analysis-Integrity-Tool`` (GAIT; single-threaded C, see
``/root/reference/GAIT 26 Source/``) as an idiomatic Spark DataFrame pipeline:

* **extract**   — pages -> features (batched Arrow kernels, byte-identical text per url)
* **encode**    — features -> H3 res-7..12 / S2 level-10..16 cell covers (deterministic)
* **partition** — per-cell histogram -> hot-cell split / salting plan
* **check**     — GAIT condition checks as cell-partitioned joins + vectorized kernels
* **consolidate** — dedup, deterministic ordinal numbering, conditions table

Nothing here is a port: the reference's region loop / linked lists / binary scratch
files are replaced by Catalyst-planned DataFrame ops; custom logic lives only in
deterministic numpy/Arrow kernels and explicit partitioning decisions.
"""

__version__ = "0.1.0"
