"""EIGen-TPU: a TPU-native evolutionary illusion generator framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
LanaSina/evolutionary_illusion_generator ("EIGen"): static images that a
predictive-coding network (PredNet) perceives as moving are evolved with NEAT
over CPPN genomes, with the fitness oracle (PredNet rollout -> optical flow ->
structure-specific flow statistics) running as a single jitted device program
per generation instead of the reference's PNG-on-disk pipeline
(reference: generate_illusion.py:478-673).

Subpackages
-----------
- ``neat``       host-side NEAT engine (genomes, speciation, reproduction)
- ``models``     CPPN compiler/evaluator and the PredNet predictive coder
- ``ops``        device ops: coordinate grids, rendering, optical flow,
                 fitness metrics, Pallas kernels
- ``evolution``  the generation evaluator, driver, artifacts, probes
- ``parallel``   device mesh / population sharding
- ``utils``      config, image IO, metrics logging
"""

__version__ = "0.1.0"

from .structure import StructureType

__all__ = ["StructureType", "__version__"]
