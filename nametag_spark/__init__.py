"""nametag_spark — a PySpark-native knowledge-graph construction engine.

Re-creates the computation of the reference NER system (ufal/nametag,
/root/reference) as DataFrame transformations + vectorized pandas/Arrow
UDFs over tables of multi-turn transcripts, and extends it with triple
extraction, entity resolution, and graph materialization.

This is a from-scratch Spark-first design, not a port: the reference's
single-threaded dataflow (tokenize -> tag -> featurize -> classify ->
decode -> post-process; see SURVEY.md section 2) becomes embarrassingly
parallel per-turn work inside Arrow batches, while everything cross-row
(turn ordering, blocking, entity resolution, triple aggregation) is
expressed relationally so Catalyst can optimize it.
"""

__version__ = "0.1.0"
