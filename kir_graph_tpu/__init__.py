"""
kir_graph_tpu — a TPU-native KIR genotyping framework.

Re-implements the capabilities of linnil1/KIR_graph (Graph-KIR) as a
JAX/XLA/Pallas array program: MSA-derived variant-graph index resident in
HBM, k-mer seeded banded-DP graph alignment, scatter-add depth/pileup,
CNgroup/KDE copy-number models, positive/negative-variant allele-set
likelihood beam search, EM abundance typing, exon-first strategy and
novel-allele discovery.  Reads shard data-parallel over a device mesh;
cohort reductions ride psum/all_gather.

Reference pipeline: /root/reference graphkir/main.py:423-606.
"""

__version__ = "0.1.0"
