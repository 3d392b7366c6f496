"""haphic_tpu — a TPU-native Hi-C scaffolding framework.

A from-scratch rebuild of the capabilities of HapHiC (reference:
/root/reference, zengxiaofei/HapHiC v1.0.7) designed TPU-first:

- ingest produces *columnar* link arrays instead of per-read Python dict
  updates (reference hot loop 1: scripts/HapHiC_cluster.py:1596-1752);
- Markov clustering runs as a jit-compiled, inflation-batched dense
  matrix loop on the MXU (reference hot loop 2:
  scripts/HapHiC_cluster.py:1987-2062, MKL SpGEMM);
- ordering/orientation replaces the bundled Go `allhic` binary
  (reference hot loop 3: scripts/HapHiC_sort.py:618-642) with a batched
  evolutionary tour optimizer whose scoring is evaluated on-device for
  the whole population at once;
- every published file format (clusters.txt, group*.txt, .clm, .tour,
  .agp, pickles) is kept byte-compatible so reference users can switch.

Subpackages
-----------
io        FASTA/GFA/pairs/BAM parsing and all on-disk format writers
core      fragment statistics, link aggregation, filtering, correction
cluster   Markov clustering engine + inflation sweep (TPU)
assign    reassignment/rescue + agglomerative hierarchical clustering
order     fast sort + tour optimizer (TPU)
build     final scaffold FASTA/AGP emission
post      contact-map plotting (KR balancing) and reference-guided sort
parallel  device mesh setup and sharded kernels
"""

from haphic_tpu._version import __version__, __update_time__
from haphic_tpu.runtime import setup_jax

# Enable the persistent XLA compilation cache for every consumer of the
# package (CLI, pipeline, tests, benches): without it each fresh process
# pays multi-minute cold compiles on TPU. See runtime.py for why env
# vars alone are not sufficient here.
setup_jax()

__all__ = ['__version__', '__update_time__', 'setup_jax']
